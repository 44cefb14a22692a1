"""Stokes operator and full-FMM tests (analogues of the reference's
single_level_stresslet / multi_level_stresslet and serialrun_stresslet
drivers plus the stokeslet point kernel)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fmm_bem_tpu.config import FMMConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.stokes import StokesKernel, StressletKernel


def _rel(a, b):
    return float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))


def _setup(kern, seed=0, nsrc=40, ntgt=25, sep=6.0):
    rng = np.random.default_rng(seed)
    sigma = 0.5
    c_s = np.array([0.1, -0.2, 0.05])
    c_t = c_s + np.array([sep, 0.4, -0.3])
    src = c_s + rng.uniform(-0.5, 0.5, (nsrc, 3)) * sigma
    tgt = c_t + rng.uniform(-0.5, 0.5, (ntgt, 3)) * sigma
    q = rng.standard_normal((nsrc, kern.charge_dim))
    return src, tgt, q, c_s, c_t, sigma


@pytest.mark.parametrize("kern", [StokesKernel(), StressletKernel()])
@pytest.mark.parametrize("p", [6, 10])
def test_p2m_m2p_velocity(kern, p):
    src, tgt, q, c_s, _, sigma = _setup(kern)
    exact = kern.direct(jnp.asarray(tgt), jnp.asarray(src), jnp.asarray(q))

    d = jnp.asarray((src - c_s) / sigma)
    inv_s = jnp.full(len(src), 1.0 / sigma)
    contrib = kern.p2m({"xyz": jnp.asarray(src)}, jnp.asarray(q), d, inv_s, p)
    M = jnp.sum(contrib, axis=0)

    dt_ = jnp.asarray((tgt - c_s) / sigma)
    Mb = jnp.broadcast_to(M, (len(tgt),) + M.shape)
    approx = kern.m2p(
        {"xyz": jnp.asarray(tgt)}, Mb, dt_, jnp.full(len(tgt), 1 / sigma), p
    )
    err = _rel(approx, exact)
    assert err < 10.0 ** (-(p // 2) + 1), (kern.name, p, err)


@pytest.mark.parametrize("kern", [StokesKernel(), StressletKernel()])
def test_full_chain_m2m_m2l_l2l_l2p(kern):
    """Two-level telescoping through the shared Laplace translation
    matrices applied componentwise."""
    p = 10
    src, tgt, q, c_s, c_t, sigma = _setup(kern, sep=8.0)
    exact = kern.direct(jnp.asarray(tgt), jnp.asarray(src), jnp.asarray(q))

    d = jnp.asarray((src - c_s) / sigma)
    inv_s = jnp.full(len(src), 1.0 / sigma)
    M_child = jnp.sum(
        kern.p2m({"xyz": jnp.asarray(src)}, jnp.asarray(q), d, inv_s, p), axis=0
    )

    sig_p = 2 * sigma
    c_ps = c_s + np.array([sigma, -sigma, sigma])
    m2m = kern.m2m_matrix(c_ps - c_s, sigma, sig_p, p)
    M_par = (m2m @ np.asarray(M_child).reshape(4, -1).T).T.reshape(M_child.shape)

    c_pt = c_t + np.array([-sigma, sigma, sigma])
    sig_pt = 2 * sigma
    m2l = kern.m2l_matrix(c_pt - c_ps, sig_p, sig_pt, p)
    L_par = (m2l @ np.asarray(M_par).reshape(4, -1).T).T.reshape(M_child.shape) / sig_p

    l2l = kern.l2l_matrix(c_t - c_pt, sig_pt, sigma, p)
    L = (l2l @ np.asarray(L_par).reshape(4, -1).T).T.reshape(M_child.shape)

    dt_ = jnp.asarray((tgt - c_t) / sigma)
    Lb = jnp.broadcast_to(jnp.asarray(L), (len(tgt),) + L.shape)
    approx = kern.l2p(
        {"xyz": jnp.asarray(tgt)}, Lb, dt_, jnp.full(len(tgt), 1 / sigma), p
    )
    err = _rel(approx, exact)
    assert err < 1e-3, (kern.name, err)


@pytest.mark.parametrize("kern", [StokesKernel(), StressletKernel()])
def test_stokes_fmm_vs_direct(kern):
    """Full-plan Stokes FMM vs direct summation (ref serialrun /
    serialrun_stresslet)."""
    rng = np.random.default_rng(5)
    n = 1200
    pts = rng.uniform(0, 1, (n, 3))
    q = rng.standard_normal((n, kern.charge_dim))
    plan = FmmPlan(
        kern, {"xyz": pts}, FMMConfig(ncrit=32, dtype="float64", max_p=10)
    )
    res = plan.apply(q, p=10)
    exact = kern.direct(pts, pts, jnp.asarray(q))
    err = _rel(res, exact)
    assert err < 5e-4, (kern.name, err)
