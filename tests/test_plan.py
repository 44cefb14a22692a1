"""Full-plan matvec correctness.

1. UnitKernel exactness (ref tests/correctness.cpp:21-80): FMM == direct
   to 1e-13 — validates tree, traversal, list replay and all
   gather/scatter plumbing independent of expansion accuracy.
2. Laplace point FMM vs direct summation (ref serialrun.cpp:136-208 and
   tests/scaling.cpp): accuracy improves with p.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fmm_bem_tpu.config import Evaluator, FMMConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.laplace import LaplaceKernel
from fmm_bem_tpu.kernels.unit import UnitKernel


def _rel_err(a, b):
    return float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))


@pytest.mark.parametrize("evaluator", [Evaluator.FMM, Evaluator.TREECODE])
@pytest.mark.parametrize("ncrit", [16, 64])
def test_unit_kernel_exact(evaluator, ncrit):
    rng = np.random.default_rng(42)
    n = 2500
    pts = rng.uniform(-1, 1, (n, 3))
    q = rng.standard_normal(n)
    cfg = FMMConfig(ncrit=ncrit, dtype="float64", evaluator=evaluator)
    plan = FmmPlan(UnitKernel(), {"xyz": pts}, cfg)
    res = plan.apply(q, p=3)
    exact = UnitKernel().direct(pts, pts, q)
    assert _rel_err(res, exact) < 1e-13


def test_unit_kernel_clustered_exact():
    rng = np.random.default_rng(7)
    a = rng.normal(0, 1e-2, (600, 3))
    b = rng.normal(0, 1e-2, (600, 3)) + 5.0
    c = rng.uniform(-3, 8, (300, 3))
    pts = np.concatenate([a, b, c])
    q = rng.standard_normal(len(pts))
    cfg = FMMConfig(ncrit=24, dtype="float64")
    plan = FmmPlan(UnitKernel(), {"xyz": pts}, cfg)
    res = plan.apply(q, p=3)
    exact = UnitKernel().direct(pts, pts, q)
    assert _rel_err(res, exact) < 1e-13


@pytest.mark.parametrize("p,tol", [(5, 2e-3), (10, 3e-5)])
def test_laplace_fmm_accuracy(p, tol):
    rng = np.random.default_rng(3)
    n = 2000
    pts = rng.uniform(0, 1, (n, 3))
    q = rng.standard_normal(n)
    K = LaplaceKernel()
    cfg = FMMConfig(ncrit=48, dtype="float64", max_p=12)
    plan = FmmPlan(K, {"xyz": pts}, cfg)
    res = plan.apply(q, p=p)
    exact = K.direct(pts, pts, jnp.asarray(q))
    # potential error
    err_pot = _rel_err(res[:, 0], exact[:, 0])
    err_f = _rel_err(res[:, 1:], exact[:, 1:])
    assert err_pot < tol, (err_pot, err_f)
    assert err_f < tol, (err_pot, err_f)


def test_laplace_treecode_accuracy():
    rng = np.random.default_rng(4)
    n = 1500
    pts = rng.uniform(0, 1, (n, 3))
    q = rng.standard_normal(n)
    K = LaplaceKernel()
    cfg = FMMConfig(
        ncrit=32, dtype="float64", max_p=10, evaluator=Evaluator.TREECODE
    )
    plan = FmmPlan(K, {"xyz": pts}, cfg)
    res = plan.apply(q, p=10)
    exact = K.direct(pts, pts, jnp.asarray(q))
    # a single multipole expansion converges slower than FMM's M2L at the
    # same theta; 1e-4 at p=10/theta=0.5 matches the measured rate
    assert _rel_err(res[:, 0], exact[:, 0]) < 1e-4


def test_relaxation_tiers_share_plan():
    """apply() at several p values (the GMRES relaxation pattern) reuses
    one plan and produces increasing accuracy."""
    rng = np.random.default_rng(5)
    n = 1200
    pts = rng.uniform(0, 1, (n, 3))
    q = rng.standard_normal(n)
    K = LaplaceKernel()
    plan = FmmPlan(K, {"xyz": pts}, FMMConfig(ncrit=32, dtype="float64", max_p=10))
    exact = K.direct(pts, pts, jnp.asarray(q))
    errs = [
        _rel_err(plan.apply(q, p=p)[:, 0], exact[:, 0]) for p in (2, 4, 8)
    ]
    assert errs[2] < errs[1] < errs[0]
