"""Yukawa / Cartesian-Taylor kernel tests (the reference's Yukawa family
is stale/unbuildable — SURVEY.md §2.4 — so these validate the restored
capability against independent oracles)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import FMMConfig, SolverConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels import cartesian as ct
from fmm_bem_tpu.kernels.cartesian import LaplaceCartesianKernel, YukawaKernel
from fmm_bem_tpu.kernels.laplace import LaplaceKernel
from fmm_bem_tpu.kernels.yukawa_bem import YukawaBEMKernel
from fmm_bem_tpu.solver.gmres import gmres


def _rel(a, b):
    return float(np.linalg.norm(np.asarray(a) - np.asarray(b)) / np.linalg.norm(b))


def test_taylor_coeffs_match_finite_differences():
    """a_alpha = D^alpha G / alpha! vs central finite differences for all
    |alpha| <= 3."""
    kappa = 0.7
    dX = np.array([1.1, -0.6, 0.8])
    p = 3
    a = ct.eval_coeffs_np(dX, kappa, p)
    alphas, deg, _, _, _ = ct.index_set(p)
    fac = ct._factorial_prod(p)

    def G(x):
        r = np.linalg.norm(x)
        return np.exp(-kappa * r) / r

    h = 1e-4
    for t, al in enumerate(alphas):
        if deg[t] > 3:
            continue
        # nested central differences
        def deriv(f, d, order):
            if order == 0:
                return f
            def g(x, f=f, d=d):
                e = np.zeros(3)
                e[d] = h
                return (f(x + e) - f(x - e)) / (2 * h)
            return deriv(g, d, order - 1)

        f = G
        for d in range(3):
            f = deriv(f, d, int(al[d]))
        expect = f(dX) / fac[t]
        tol = 3e-3 * max(1.0, abs(expect))
        assert abs(a[t] - expect) < tol, (al, a[t], expect)


@pytest.mark.parametrize("kappa", [0.0, 0.5])
def test_yukawa_p2m_m2p(kappa):
    kern = YukawaKernel(kappa=kappa)
    rng = np.random.default_rng(0)
    sigma = 0.5
    c_s = np.zeros(3)
    src = c_s + rng.uniform(-0.5, 0.5, (40, 3)) * sigma
    tgt = np.array([4.0, 0.3, -0.2]) + rng.uniform(-0.5, 0.5, (25, 3)) * sigma
    q = rng.standard_normal(40)
    p = 8

    exact = kern.direct(jnp.asarray(tgt), jnp.asarray(src), jnp.asarray(q))
    d = jnp.asarray((src - c_s) / sigma)
    inv_s = jnp.full(len(src), 1.0 / sigma)
    M = jnp.sum(kern.p2m({"xyz": src}, jnp.asarray(q), d, inv_s, p), axis=0)
    Mb = jnp.broadcast_to(M, (len(tgt),) + M.shape)
    dt_ = jnp.asarray((tgt - c_s) / sigma)
    approx = kern.m2p({}, Mb, dt_, jnp.full(len(tgt), 1 / sigma), p)
    err = _rel(approx[:, 0], exact[:, 0])
    assert err < 1e-4, (kappa, err)
    err_g = _rel(approx[:, 1:], exact[:, 1:])
    assert err_g < 1e-3, (kappa, err_g)


@pytest.mark.parametrize("kappa", [0.0, 0.5])
def test_yukawa_full_chain(kappa):
    """P2M -> M2M -> M2L -> L2L -> L2P telescoping."""
    kern = YukawaKernel(kappa=kappa)
    rng = np.random.default_rng(1)
    sigma = 0.5
    c_s = np.zeros(3)
    c_t = np.array([6.0, 0.4, -0.1])
    src = c_s + rng.uniform(-0.5, 0.5, (40, 3)) * sigma
    tgt = c_t + rng.uniform(-0.5, 0.5, (25, 3)) * sigma
    q = rng.standard_normal(40)
    p = 8

    exact = kern.direct(jnp.asarray(tgt), jnp.asarray(src), jnp.asarray(q))
    d = jnp.asarray((src - c_s) / sigma)
    inv_s = jnp.full(len(src), 1.0 / sigma)
    M_c = np.asarray(
        jnp.sum(kern.p2m({"xyz": src}, jnp.asarray(q), d, inv_s, p), axis=0)
    )[0]

    sig_p = 2 * sigma
    c_ps = c_s + np.array([sigma, sigma, -sigma])
    M_p = kern.m2m_matrix(c_ps - c_s, sigma, sig_p, p) @ M_c

    c_pt = c_t + np.array([-sigma, sigma, sigma])
    L_p = kern.m2l_matrix(c_pt - c_ps, sig_p, sig_p, p) @ M_p

    L_c = kern.l2l_matrix(c_t - c_pt, sig_p, sigma, p) @ L_p

    Lb = jnp.broadcast_to(jnp.asarray(L_c)[None, :], (len(tgt), 1, len(L_c)))
    dt_ = jnp.asarray((tgt - c_t) / sigma)
    approx = kern.l2p({}, Lb, dt_, jnp.full(len(tgt), 1 / sigma), p)
    err = _rel(approx[:, 0], exact[:, 0])
    assert err < 1e-3, (kappa, err)


@pytest.mark.parametrize("kappa", [0.0, 0.5])
def test_yukawa_fmm_vs_direct(kappa):
    kern = YukawaKernel(kappa=kappa)
    rng = np.random.default_rng(2)
    n = 1500
    pts = rng.uniform(0, 1, (n, 3))
    q = rng.standard_normal(n)
    plan = FmmPlan(
        kern, {"xyz": pts}, FMMConfig(ncrit=32, dtype="float64", max_p=8)
    )
    res = plan.apply(q, p=8)
    exact = kern.direct(pts, pts, jnp.asarray(q))
    err = _rel(res[:, 0], exact[:, 0])
    assert err < 5e-4, (kappa, err)


def test_laplace_cartesian_matches_spherical():
    """Two independent expansions (Cartesian Taylor vs spherical
    harmonics) must agree on the same matvec."""
    rng = np.random.default_rng(3)
    n = 800
    pts = rng.uniform(0, 1, (n, 3))
    q = rng.standard_normal(n)
    cfg = FMMConfig(ncrit=32, dtype="float64", max_p=8)
    plan_c = FmmPlan(LaplaceCartesianKernel(), {"xyz": pts}, cfg)
    plan_s = FmmPlan(LaplaceKernel(), {"xyz": pts}, cfg)
    rc = plan_c.apply(q, p=8)
    rs = plan_s.apply(q, p=8)
    assert _rel(rc[:, 0], rs[:, 0]) < 2e-4


def test_yukawa_bem_matvec_and_solve():
    """Yukawa BEM operator vs dense oracle + screened first-kind solve on
    the sphere (the capability the stale reference YukawaBEM intended)."""
    kappa = 0.5
    tris = unit_sphere(3)
    fields = make_panels(tris, K=3)
    kern = YukawaBEMKernel(K=3, kappa=kappa)
    plan = FmmPlan(kern, fields, FMMConfig(ncrit=32, dtype="float64", max_p=8))
    n = len(tris)
    rng = np.random.default_rng(4)
    q = rng.standard_normal(n)

    A = kern.dense_matrix(fields)
    res = plan.apply(q, p=8)[:, 0]
    assert _rel(res, A @ q) < 5e-4

    # first-kind solve: known phi = 1 on surface; RHS via flipped BC
    b = np.asarray(plan.apply_flipped_bc(np.ones(n), p=8)[:, 0])
    x, info = gmres(
        lambda v, p: plan.apply(v, p=p)[:, 0],
        b,
        config=SolverConfig(residual=1e-6, max_p=8),
    )
    assert info.converged
    # oracle: dense solve of the same discrete system
    x_dense = np.linalg.solve(A, b)
    assert _rel(np.asarray(x), x_dense) < 1e-3


def test_yukawa_bem_interior_physics():
    """Screened first-kind sphere solve vs the interior analytic value
    dphi/dn = -(kappa coth kappa - 1) (the -2pi Yukawa self-term makes
    this the interior problem; ref SemiAnalytical.hpp:196-201)."""
    kappa = 0.5
    tris = unit_sphere(4)  # 512 panels
    fields = make_panels(tris, K=3)
    kern = YukawaBEMKernel(K=3, kappa=kappa)
    plan = FmmPlan(kern, fields, FMMConfig(ncrit=32, dtype="float64", max_p=8))
    n = len(tris)
    b = np.asarray(plan.apply_flipped_bc(np.ones(n), p=8)[:, 0])
    x, info = gmres(
        lambda v, p: plan.apply(v, p=p)[:, 0],
        b,
        config=SolverConfig(residual=1e-7, max_p=8),
    )
    assert info.converged
    exact = -(kappa / np.tanh(kappa) - 1.0)
    got = float(np.asarray(x).mean())
    assert abs(got - exact) / abs(exact) < 5e-2, (got, exact)
