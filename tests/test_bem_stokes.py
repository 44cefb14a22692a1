"""Stokes BEM end-to-end: flow past a unit sphere (ref
examples/StokesBEM.cpp): RHS sanity ~ 4*pi, matvec vs dense oracle,
GMRES solve, drag force vs Stokes law 6*pi*mu."""

import jax.numpy as jnp
import numpy as np
import pytest

from fmm_bem_tpu.bem.panels import make_panels, switch_bc
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import FMMConfig, SolverConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.stokes_bem import StokesBEMKernel
from fmm_bem_tpu.solver.gmres import gmres

MU = 1e-3


def _rel(a, b):
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def test_stokes_bem_matvec_matches_dense(stokes_plan64):
    tris, fields, kern, plan = stokes_plan64
    n = len(tris)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((n, 3))

    A = kern.dense_matrix(fields)  # all VELOCITY targets
    res = np.asarray(plan.apply(q, p=10)).reshape(-1)
    assert _rel(res, A @ q.reshape(-1)) < 5e-4

    Af = kern.dense_matrix(switch_bc(fields))
    res_f = np.asarray(plan.apply_flipped_bc(q, p=10)).reshape(-1)
    assert _rel(res_f, Af @ q.reshape(-1)) < 5e-4


def test_stokes_bem_rhs_sanity(stokes_plan64):
    """Double-layer identity: traction operator applied to uniform
    velocity = 4*pi*u on the sphere (ref StokesBEM.cpp:273-278)."""
    tris, fields, kern, plan = stokes_plan64
    n = len(tris)
    u = np.tile(np.array([1.0, 0.0, 0.0]), (n, 1))
    b = np.asarray(plan.apply_flipped_bc(u, p=10))
    err = np.abs(b[:, 0] - 4 * np.pi).mean() / (4 * np.pi)
    assert err < 5e-2, err
    assert np.abs(b[:, 1:]).max() < 0.5


def test_stokes_bem_drag(stokes_plan64):
    """Solve for traction of uniform flow past the unit sphere; drag
    F_x = sum t_x * area must approach Stokes law 6*pi*mu
    (ref StokesBEM.cpp:336-365)."""
    tris, fields, kern, plan = stokes_plan64
    n = len(tris)
    b = np.tile(np.array([4 * np.pi, 0.0, 0.0]), (n, 1)).reshape(-1)

    def matvec(x, p):
        return plan.apply(x.reshape(n, 3), p=p).reshape(-1)

    x, info = gmres(
        matvec,
        b,
        config=SolverConfig(residual=1e-5, max_p=10, p_min=5),
    )
    assert info.converged
    # the relaxed schedule must respect the Stokes p_min floor
    # (ref GMRES_Stokes.hpp:229: max(opts.p_min, predict_p(resid)-1))
    ps = [h[2] for h in info.history]
    assert min(ps) >= 5, ps
    t_sol = np.asarray(x).reshape(n, 3)
    fx = float((t_sol[:, 0] * fields["area"]).sum())
    exact = 6 * np.pi * MU
    err = abs(fx - exact) / exact
    # flat-panel discretisation at 128 panels
    assert err < 5e-2, (fx, exact, err)
