"""Laplace BEM end-to-end tests (the reference's LaplaceBEM.cpp
workload: first/second-kind boundary integral equations on the unit
sphere)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fmm_bem_tpu.bem.panels import make_panels, switch_bc
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import FMMConfig, SolverConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel
from fmm_bem_tpu.solver.gmres import gmres
from fmm_bem_tpu.solver import preconditioners as pc


def _rel(a, b):
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def _make(recursions=3, K=3, ncrit=32, max_p=10):
    tris = unit_sphere(recursions)
    fields = make_panels(tris, K=K)
    kern = LaplaceBEMKernel(K=K)
    plan = FmmPlan(
        kern, fields, FMMConfig(ncrit=ncrit, dtype="float64", max_p=max_p)
    )
    return tris, fields, kern, plan


def test_bem_matvec_matches_dense():
    """FMM panel matvec (G operator and dGdn operator) vs the dense
    BC-switched entry matrix at high p."""
    tris, fields, kern, plan = _make(recursions=3)
    n = len(tris)
    rng = np.random.default_rng(0)
    q = rng.standard_normal(n)

    A = kern.dense_matrix(fields)  # all BC = POTENTIAL -> G entries
    res = plan.apply(q, p=10)[:, 0]
    assert _rel(np.asarray(res), A @ q) < 2e-4

    # flipped BC: dGdn operator through the same plan
    fields_f = switch_bc(fields)
    Af = kern.dense_matrix(fields_f)
    res_f = plan.apply_flipped_bc(q, p=10)[:, 0]
    assert _rel(np.asarray(res_f), Af @ q) < 2e-4


def test_bem_first_kind_sphere_solve():
    """First-kind solve on the unit sphere with phi = 1: analytic
    solution dphi/dn = 1 (ref LaplaceBEM.cpp:329-350) and exterior
    potential = 1/r (ref :352-371)."""
    tris, fields, kern, plan = _make(recursions=3, max_p=12)
    n = len(tris)
    phi = np.ones(n)

    # RHS via flipped BC (ref LaplaceBEM.cpp:218-232)
    b = np.asarray(plan.apply_flipped_bc(phi, p=12)[:, 0])
    # sanity: b ~ 4*pi on the unit sphere (2*pi self + 2*pi solid angle)
    assert np.allclose(b, 4 * np.pi, rtol=0.2)

    diag = kern.dense_matrix(fields).diagonal() if n <= 200 else None
    M = pc.diagonal(diag) if diag is not None else None

    x, info = gmres(
        lambda v, p: plan.apply(v, p=p)[:, 0],
        b,
        config=SolverConfig(residual=1e-6, max_p=12, p_min=5),
        M=M,
    )
    assert info.converged
    err = _rel(np.asarray(x), np.ones(n))
    # flat-panel collocation discretisation error: 4.32% at 128 panels
    # (the dense direct solve gives the identical value; 1.47% at 512)
    assert err < 5e-2, err
    # the FMM solution must match the dense-operator solution closely
    A = kern.dense_matrix(fields)
    x_dense = np.linalg.solve(A, b)
    assert _rel(np.asarray(x), x_dense) < 1e-3

    # exterior potential via the layer potentials (Green's identity)
    pt = np.array([[3.0, 3.0, 3.0]])
    phi_ext = (
        kern.eval_exterior(fields, np.asarray(x), pt, layer="G")
        - kern.eval_exterior(fields, phi, pt, layer="dGdn")
    ) / (4 * np.pi)
    exact = 1.0 / np.linalg.norm(pt)
    # 3.5% at 128 panels — pure discretisation error (drops with panels)
    assert abs(phi_ext[0] - exact) / exact < 5e-2, (phi_ext, exact)


def test_bem_relaxed_solve_matches_fixed():
    """Relaxed (variable-p) GMRES reaches the same solution as fixed-p —
    the paper's experiment, with fewer high-p matvecs."""
    tris, fields, kern, plan = _make(recursions=3, max_p=10)
    n = len(tris)
    b = np.asarray(plan.apply_flipped_bc(np.ones(n), p=10)[:, 0])
    cfg = SolverConfig(residual=1e-6, max_p=10, p_min=3, variable_p=True)

    x_fix, info_fix = gmres(
        lambda v, p: plan.apply(v, p=p)[:, 0], b, config=cfg, p_fixed=10
    )
    x_rel, info_rel = gmres(
        lambda v, p: plan.apply(v, p=p)[:, 0], b, config=cfg
    )
    assert info_fix.converged and info_rel.converged
    assert _rel(np.asarray(x_rel), np.asarray(x_fix)) < 1e-4
    # the relaxed solve must have used cheaper matvecs
    ps = [h[2] for h in info_rel.history]
    assert min(ps) < 10


def test_bem_second_kind_sphere_solve():
    """Second-kind equation (solve for phi given dphi/dn): panels start
    as NORMAL_DERIV (ref -second_kind flag, LaplaceBEM.cpp:190-191)."""
    tris = unit_sphere(3)
    fields = make_panels(tris, K=3)
    fields = switch_bc(fields)  # all NORMAL_DERIV
    kern = LaplaceBEMKernel(K=3)
    plan = FmmPlan(kern, fields, FMMConfig(ncrit=32, dtype="float64", max_p=10))
    n = len(tris)
    dphidn = np.ones(n)
    # RHS: G operator applied to known dphi/dn
    b = np.asarray(plan.apply_flipped_bc(dphidn, p=10)[:, 0])
    x, info = gmres(
        lambda v, p: plan.apply(v, p=p)[:, 0],
        b,
        config=SolverConfig(residual=1e-6, max_p=10),
    )
    assert info.converged
    # analytic: phi = 1 on the unit sphere
    assert _rel(np.asarray(x), np.ones(n)) < 2e-2
