"""Operator telescoping tests for the Laplace spherical expansion chain
(analogue of reference tests/single_level.cpp and multi_level.cpp):
direct P2P must match P2M->M2P, P2M->M2L->L2P, and the full
P2M->M2M->M2L->L2L->L2P chain to expansion accuracy, with error
decreasing as p grows."""

import jax.numpy as jnp
import numpy as np
import pytest

from fmm_bem_tpu.kernels.laplace import LaplaceKernel

K = LaplaceKernel()


def _setup(seed=0, nsrc=40, ntgt=30, sep=5.0):
    rng = np.random.default_rng(seed)
    sigma_s = 0.5
    sigma_t = 0.5
    c_s = np.zeros(3)
    c_t = np.array([sep, 0.3, -0.2])
    src = c_s + rng.uniform(-0.5, 0.5, (nsrc, 3)) * sigma_s
    tgt = c_t + rng.uniform(-0.5, 0.5, (ntgt, 3)) * sigma_t
    q = rng.standard_normal(nsrc)
    return src, tgt, q, c_s, c_t, sigma_s, sigma_t


def _p2m(src, q, c, sigma, p):
    inv_s = jnp.full(len(src), 1.0 / sigma)
    contrib = K.p2m(
        None, jnp.asarray(q), jnp.asarray((src - c) / sigma), inv_s, p
    )
    return jnp.sum(contrib, axis=0)  # [ncomp, W]


def _rel_err(approx, exact):
    return float(
        jnp.linalg.norm(approx - exact) / jnp.linalg.norm(exact)
    )


@pytest.mark.parametrize("p", [4, 8, 12])
def test_p2m_m2p(p):
    src, tgt, q, c_s, _, sigma_s, _ = _setup()
    exact = K.direct(tgt, src, jnp.asarray(q))
    M = _p2m(src, q, c_s, sigma_s, p)
    Mb = jnp.broadcast_to(M, (len(tgt),) + M.shape)
    d = jnp.asarray((tgt - c_s) / sigma_s)
    inv_s = jnp.full(len(tgt), 1.0 / sigma_s)
    approx = K.m2p(None, Mb, d, inv_s, p)
    err = _rel_err(approx, exact)
    assert err < 10.0 ** (-(p // 2)), f"p={p} err={err}"


@pytest.mark.parametrize("p", [4, 8, 12])
def test_p2m_m2l_l2p(p):
    src, tgt, q, c_s, c_t, sigma_s, sigma_t = _setup()
    exact = K.direct(tgt, src, jnp.asarray(q))
    M = _p2m(src, q, c_s, sigma_s, p)

    mat = K.m2l_matrix(c_t - c_s, sigma_s, sigma_t, p)
    L = (mat @ np.asarray(M).reshape(-1)) / sigma_s
    L = jnp.asarray(L.reshape(M.shape))

    Lb = jnp.broadcast_to(L, (len(tgt),) + L.shape)
    d = jnp.asarray((tgt - c_t) / sigma_t)
    inv_s = jnp.full(len(tgt), 1.0 / sigma_t)
    approx = K.l2p(None, Lb, d, inv_s, p)
    err = _rel_err(approx, exact)
    assert err < 10.0 ** (-(p // 2)), f"p={p} err={err}"


@pytest.mark.parametrize("p", [6, 10])
def test_full_chain_m2m_l2l(p):
    """Two-level chain: children -> parent -> M2L -> parent -> children."""
    src, tgt, q, c_s, c_t, sigma_s, sigma_t = _setup(sep=8.0)
    exact = K.direct(tgt, src, jnp.asarray(q))

    # child source box: same center, half size; parent at an octant shift
    sig_cs = sigma_s
    sig_ps = 2 * sigma_s
    c_ps = c_s + np.array([sig_cs, sig_cs, -sig_cs])  # parent center offset
    M_child = _p2m(src, q, c_s, sig_cs, p)
    m2m = K.m2m_matrix(c_ps - c_s, sig_cs, sig_ps, p)
    M_par = (m2m @ np.asarray(M_child).reshape(-1)).reshape(M_child.shape)

    sig_ct = sigma_t
    sig_pt = 2 * sigma_t
    c_pt = c_t + np.array([-sig_ct, sig_ct, sig_ct])
    m2l = K.m2l_matrix(c_pt - c_ps, sig_ps, sig_pt, p)
    L_par = (m2l @ M_par.reshape(-1)) / sig_ps

    l2l = K.l2l_matrix(c_t - c_pt, sig_pt, sig_ct, p)
    L_child = (l2l @ L_par).reshape(M_child.shape)

    Lb = jnp.broadcast_to(jnp.asarray(L_child), (len(tgt),) + L_child.shape)
    d = jnp.asarray((tgt - c_t) / sig_ct)
    inv_s = jnp.full(len(tgt), 1.0 / sig_ct)
    approx = K.l2p(None, Lb, d, inv_s, p)
    err = _rel_err(approx, exact)
    assert err < 10.0 ** (-(p // 2) + 1), f"p={p} err={err}"


def test_m2m_preserves_far_field():
    """M2P from the child multipole == M2P from the shifted parent
    multipole, to expansion accuracy at high p."""
    p = 14
    src, tgt, q, c_s, _, sigma_s, _ = _setup(sep=10.0)
    M_child = _p2m(src, q, c_s, sigma_s, p)
    sig_p = 2 * sigma_s
    c_p = c_s + np.array([-sigma_s, sigma_s, sigma_s])
    m2m = K.m2m_matrix(c_p - c_s, sigma_s, sig_p, p)
    M_par = jnp.asarray(
        (m2m @ np.asarray(M_child).reshape(-1)).reshape(M_child.shape)
    )

    d_c = jnp.asarray((tgt - c_s) / sigma_s)
    d_p = jnp.asarray((tgt - c_p) / sig_p)
    Mb_c = jnp.broadcast_to(M_child, (len(tgt),) + M_child.shape)
    Mb_p = jnp.broadcast_to(M_par, (len(tgt),) + M_par.shape)
    r_c = K.m2p(None, Mb_c, d_c, jnp.full(len(tgt), 1 / sigma_s), p)
    r_p = K.m2p(None, Mb_p, d_p, jnp.full(len(tgt), 1 / sig_p), p)
    assert _rel_err(r_p, r_c) < 1e-9


def test_error_decreases_with_p():
    src, tgt, q, c_s, _, sigma_s, _ = _setup(sep=3.0)
    exact = K.direct(tgt, src, jnp.asarray(q))
    errs = []
    for p in (2, 4, 6, 8, 10):
        M = _p2m(src, q, c_s, sigma_s, p)
        Mb = jnp.broadcast_to(M, (len(tgt),) + M.shape)
        d = jnp.asarray((tgt - c_s) / sigma_s)
        approx = K.m2p(None, Mb, d, jnp.full(len(tgt), 1 / sigma_s), p)
        errs.append(_rel_err(approx, exact))
    assert all(e2 < e1 for e1, e2 in zip(errs, errs[1:])), errs
