"""Dual-tree plans: separate source and target point sets
(ref include/executor/ExecutorDualTree.hpp + tests/dual_correctness.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import Evaluator, FMMConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.laplace import LaplaceKernel
from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel
from fmm_bem_tpu.kernels.unit import UnitKernel


def _rel(a, b):
    return float(np.linalg.norm(np.asarray(a) - np.asarray(b)) / np.linalg.norm(b))


@pytest.mark.parametrize("evaluator", [Evaluator.FMM, Evaluator.TREECODE])
def test_dual_unit_kernel_exact(evaluator):
    """UnitKernel exactness with disjoint source/target clouds (the
    dual_correctness.cpp oracle at 1e-13)."""
    rng = np.random.default_rng(0)
    src = rng.uniform(-1, 1, (1800, 3))
    tgt = rng.uniform(-0.8, 1.2, (1300, 3))
    q = rng.standard_normal(1800)
    plan = FmmPlan(
        UnitKernel(),
        {"xyz": src},
        FMMConfig(ncrit=24, dtype="float64", evaluator=evaluator),
        target_fields={"xyz": tgt},
    )
    res = plan.apply(q, p=3)
    exact = UnitKernel().direct(tgt, src, q)
    assert res.shape[0] == len(tgt)
    assert _rel(res, exact) < 1e-13


def test_dual_laplace_accuracy():
    rng = np.random.default_rng(1)
    src = rng.uniform(0, 1, (1500, 3))
    tgt = rng.uniform(0.2, 1.4, (900, 3))
    q = rng.standard_normal(1500)
    K = LaplaceKernel()
    plan = FmmPlan(
        K,
        {"xyz": src},
        FMMConfig(ncrit=32, dtype="float64", max_p=10),
        target_fields={"xyz": tgt},
    )
    res = plan.apply(q, p=10)
    exact = K.direct(tgt, src, jnp.asarray(q))
    assert _rel(res[:, 0], np.asarray(exact)[:, 0]) < 5e-5


def test_dual_bem_exterior_evaluation():
    """FMM-accelerated exterior potential: panels as sources, off-surface
    points as targets — the O(N) version of the driver's dense exterior
    check (LaplaceBEM.cpp:352-371)."""
    tris = unit_sphere(3)
    fields = make_panels(tris, K=3)
    kern = LaplaceBEMKernel(K=3)
    n = len(tris)
    rng = np.random.default_rng(2)
    # exterior shell of evaluation points (treated as pseudo-panels with
    # zero geometry: only their centers matter for POTENTIAL targets)
    npts = 200
    dirs = rng.standard_normal((npts, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = dirs * rng.uniform(2.0, 4.0, (npts, 1))
    tfields = {
        "xyz": pts,
        "normal": np.zeros((npts, 3)),
        "area": np.zeros(npts),
        "vertices": np.zeros((npts, 3, 3)),
        "qp_off": np.zeros((npts,) + fields["qp_off"].shape[1:]),
        "qw": np.zeros((npts, fields["qw"].shape[1])),
        "bc": np.zeros(npts),  # POTENTIAL -> single-layer G values
    }
    plan = FmmPlan(
        kern,
        fields,
        FMMConfig(ncrit=32, dtype="float64", max_p=10),
        target_fields=tfields,
    )
    q = rng.standard_normal(n)
    res = np.asarray(plan.apply(q, p=10)[:, 0])
    exact = kern.eval_exterior(fields, q, pts, layer="G")
    assert _rel(res, exact) < 1e-4
