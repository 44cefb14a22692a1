"""Spherical-harmonic Yukawa kernel tests (kernel/YukawaSpherical.hpp
counterpart: Bessel machinery, projection-built translations, full-plan
accuracy vs direct and vs the Cartesian Yukawa family)."""

import jax.numpy as jnp
import numpy as np

from fmm_bem_tpu.config import FMMConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.spherical_yukawa import (
    YukawaSphericalKernel,
    bessel_i,
    bessel_k,
)


def test_modified_spherical_bessel_closed_forms():
    x = np.array([0.05, 0.3, 1.0, 3.0, 8.0, 14.0])
    i = bessel_i(x, 4)
    k = bessel_k(x, 4)
    np.testing.assert_allclose(i[:, 0], np.sinh(x) / x, rtol=1e-12)
    np.testing.assert_allclose(
        i[:, 1], np.cosh(x) / x - np.sinh(x) / x**2, rtol=1e-11
    )
    np.testing.assert_allclose(k[:, 0], np.exp(-x) / x, rtol=1e-12)
    np.testing.assert_allclose(
        k[:, 1], np.exp(-x) * (1 / x + 1 / x**2), rtol=1e-12
    )


def test_addition_theorem_normalisation():
    """e^{-kr}/r = kappa sum_n (2n+1) i_n(k rho_<) k_n(k rho_>) P_n —
    the identity every operator in the kernel is built on."""
    from numpy.polynomial.legendre import legval

    kappa = 0.7
    y = np.array([0.2, -0.1, 0.15])
    x = np.array([1.0, 0.8, -0.6])
    ry, rx = np.linalg.norm(y), np.linalg.norm(x)
    cg = y @ x / (ry * rx)
    P = 30
    iN = bessel_i(np.asarray(kappa * ry), P)
    kN = bessel_k(np.asarray(kappa * rx), P)
    s = sum(
        kappa * (2 * n + 1) * iN[n] * kN[n] * legval(cg, np.eye(P)[n])
        for n in range(P)
    )
    r = np.linalg.norm(x - y)
    assert abs(s - np.exp(-kappa * r) / r) < 1e-14


def test_p2m_m2p_telescopes():
    kern = YukawaSphericalKernel(kappa=0.7)
    rng = np.random.default_rng(0)
    sigma = 0.5
    src = rng.uniform(-sigma, sigma, (40, 3))
    q = rng.standard_normal(40)
    tgt = rng.uniform(-1, 1, (20, 3)) * sigma + np.array([4 * sigma, 0, 0])
    ref = np.asarray(kern.direct(jnp.asarray(tgt), jnp.asarray(src), jnp.asarray(q)))
    d_norm = jnp.asarray(src) / sigma
    isg = jnp.full(40, 1 / sigma)
    errs = []
    for p in (4, 8, 12):
        M = kern.p2m(None, jnp.asarray(q), d_norm, isg, p).sum(axis=0)
        out = kern.m2p(
            None,
            jnp.broadcast_to(M, (20,) + M.shape),
            jnp.asarray(tgt) / sigma,
            jnp.full(20, 1 / sigma),
            p,
        )
        errs.append(
            np.abs(np.asarray(out)[:, 0] - ref[:, 0]).max()
            / np.abs(ref[:, 0]).max()
        )
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1e-4


def test_projection_translation_chain():
    """P2M -> M2M -> M2L -> L2L -> L2P reproduces the direct potential
    (the reference's own Yukawa M2L is disabled, #if 0 at
    YukawaSpherical.hpp:500; this chain works)."""
    kern = YukawaSphericalKernel(kappa=0.7)
    p = 10
    rng = np.random.default_rng(1)
    sig_c, sig_p = 0.25, 0.5
    cc = np.array([0.25, 0.25, 0.25])
    src = cc + rng.uniform(-sig_c, sig_c, (30, 3))
    q = rng.standard_normal(30)
    M_child = kern.p2m(
        None, jnp.asarray(q), jnp.asarray(src - cc) / sig_c,
        jnp.full(30, 1 / sig_c), p,
    ).sum(0)
    M_par = kern.m2m_matrix(-cc, sig_c, sig_p, p) @ np.asarray(M_child)[0]
    ct = np.array([2.5, 0.0, 0.0])
    L = kern.m2l_matrix(ct, sig_p, sig_p, p) @ M_par
    cl = ct + np.array([0.25, 0.25, -0.25])
    Lc = kern.l2l_matrix(cl - ct, sig_p, sig_c, p) @ L
    tg = cl + rng.uniform(-0.2, 0.2, (10, 3)) * sig_c
    out = kern.l2p(
        None,
        jnp.asarray(Lc)[None, None, :].repeat(10, 0),
        jnp.asarray(tg - cl) / sig_c,
        jnp.full(10, 1 / sig_c),
        p,
    )
    ref = np.asarray(kern.direct(jnp.asarray(tg), jnp.asarray(src), jnp.asarray(q)))
    e = np.abs(np.asarray(out) - ref)
    assert e[:, 0].max() / np.abs(ref[:, 0]).max() < 1e-5
    assert e[:, 1:].max() / np.abs(ref[:, 1:]).max() < 1e-3


def test_plan_accuracy_vs_direct():
    rng = np.random.default_rng(2)
    n = 700
    pts = rng.uniform(0, 1, (n, 3))
    q = rng.standard_normal(n)
    kern = YukawaSphericalKernel(kappa=0.5)
    plan = FmmPlan(
        kern, {"xyz": pts}, FMMConfig(ncrit=32, dtype="float64", max_p=8)
    )
    ref = np.asarray(kern.direct(jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(q)))
    errs = {}
    for p in (4, 8):
        out = np.asarray(plan.apply(q, p=p))
        errs[p] = (
            np.abs(out[:, 0] - ref[:, 0]).max() / np.abs(ref[:, 0]).max()
        )
    assert errs[8] < errs[4]
    assert errs[8] < 5e-4, errs


def test_matches_cartesian_yukawa():
    """Two independent Yukawa implementations (Cartesian Taylor vs
    spherical Bessel) agree through their own FMM plans."""
    from fmm_bem_tpu.kernels.cartesian import YukawaKernel

    rng = np.random.default_rng(3)
    n = 500
    pts = rng.uniform(0, 1, (n, 3))
    q = rng.standard_normal(n)
    cfgk = dict(ncrit=32, dtype="float64", max_p=8)
    ps = FmmPlan(
        YukawaSphericalKernel(kappa=0.4), {"xyz": pts}, FMMConfig(**cfgk)
    )
    pc = FmmPlan(YukawaKernel(kappa=0.4), {"xyz": pts}, FMMConfig(**cfgk))
    os_ = np.asarray(ps.apply(q, p=8))
    oc = np.asarray(pc.apply(q, p=8))
    scale = np.abs(os_[:, 0]).max()
    assert np.abs(os_[:, 0] - oc[:, 0]).max() / scale < 1e-3
