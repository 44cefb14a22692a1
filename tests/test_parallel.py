"""Multi-device sharded execution tests on the 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import FMMConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.laplace import LaplaceKernel
from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel
from fmm_bem_tpu.parallel.sharding import make_mesh, sharded_matvec, sharded_solve_step


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_point_matvec_matches(ndev):
    assert len(jax.devices()) >= ndev
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (1536, 3))
    q = rng.standard_normal(1536)
    plan = FmmPlan(
        LaplaceKernel(), {"xyz": pts}, FMMConfig(ncrit=32, dtype="float64", max_p=8)
    )
    ref = np.asarray(plan.apply(q, p=6))
    mesh = make_mesh(ndev)
    f = sharded_matvec(plan, 6, mesh)
    out = np.asarray(f(q))
    assert np.allclose(out, ref, rtol=1e-10, atol=1e-12)


def test_sharded_bem_matvec_matches():
    tris = unit_sphere(3)
    fields = make_panels(tris, K=3)
    plan = FmmPlan(
        LaplaceBEMKernel(K=3),
        fields,
        FMMConfig(ncrit=32, dtype="float64", max_p=8),
    )
    q = np.random.default_rng(1).standard_normal(len(tris))
    ref = np.asarray(plan.apply(q, p=8))
    mesh = make_mesh(8)
    f = sharded_matvec(plan, 8, mesh)
    assert np.allclose(np.asarray(f(q)), ref, rtol=1e-10, atol=1e-12)


def test_sharded_solve_step_runs():
    tris = unit_sphere(3)
    fields = make_panels(tris, K=3)
    plan = FmmPlan(
        LaplaceBEMKernel(K=3),
        fields,
        FMMConfig(ncrit=32, dtype="float64", max_p=6),
    )
    n = len(tris)
    mesh = make_mesh(8)
    step = sharded_solve_step(plan, 6, mesh)
    v = np.ones(n) / np.sqrt(n)
    basis = np.zeros((4, n))
    basis[0] = v
    w, coeffs, beta = step(v, basis)
    assert np.isfinite(np.asarray(w)).all()
    assert float(beta) > 0
