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


def test_check_kernel_rejects_malformed():
    """Plan build must fail with a readable protocol error, not a trace
    error deep inside jit (ref FMM_plan.hpp:115-127 check_kernel)."""

    class BadKernel:
        ncomp = 1
        result_dim = 1

        def width(self, p):
            return p

    with pytest.raises(TypeError) as ei:
        FmmPlan(BadKernel(), {"xyz": np.random.default_rng(0).uniform(0, 1, (100, 3))})
    msg = str(ei.value)
    assert "p2m" in msg and "m2l_matrix" in msg and "protocol" in msg


def test_near_droptol_inexact_matvec():
    """Drop-tolerance near field (ref SparseMatrix.hpp:51-74): small
    entries are dropped at plan build; the matvec error is bounded by
    droptol * row count and vanishes as droptol -> 0."""
    from fmm_bem_tpu.bem.panels import make_panels
    from fmm_bem_tpu.bem.triangulation import unit_sphere
    from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel

    tris = unit_sphere(3)
    fields = make_panels(tris, K=3)
    n = len(tris)
    q = np.random.default_rng(1).standard_normal(n)

    base = FmmPlan(
        LaplaceBEMKernel(K=3),
        fields,
        FMMConfig(ncrit=32, dtype="float64", max_p=8, near_panel=False),
    )
    # threshold at the 25th percentile of entry magnitudes so a known
    # fraction of the near field is dropped
    mags = np.abs(np.asarray(base.near_vals)).max(axis=1)
    tol = float(np.quantile(mags, 0.25))
    drop = FmmPlan(
        LaplaceBEMKernel(K=3),
        fields,
        FMMConfig(
            ncrit=32, dtype="float64", max_p=8, near_panel=False,
            droptol=tol,
        ),
    )
    kept = len(drop.near_rows) / len(base.near_rows)
    assert 0.5 < kept < 0.9, kept
    r0 = np.asarray(base.apply(q, p=8))[:, 0]
    r1 = np.asarray(drop.apply(q, p=8))[:, 0]
    rel = np.linalg.norm(r1 - r0) / np.linalg.norm(r0)
    # inexact but bounded: dropped entries were the smallest quartile
    assert 0 < rel < 0.5, rel
