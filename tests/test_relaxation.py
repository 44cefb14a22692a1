"""Relaxation-schedule upgrades: calibrated eps(p) model + stall guard.

The reference hardcodes eps ~ 2^-p into predict_p and its own TODO
flags that as kernel-specific (SolverOptions.hpp:32); results/RBC.md
(round 2) recorded the consequence — relaxed solves plateauing above
tolerance on anisotropic geometry.  These tests cover the round-3
mitigations: per-plan calibration of the error model and the
raise-p-on-stall guard in both GMRES loops.
"""

import numpy as np
import pytest

from fmm_bem_tpu.config import FMMConfig, SolverConfig
from fmm_bem_tpu.solver.gmres import gmres, gmres_device


def _stalling_matvec(n, p_exact=9, err=3e-2, seed=3):
    """Linear operator whose matvec is exact at p >= p_exact and
    carries an O(err) inexactness below that is INCONSISTENT across
    Krylov vectors (a traceable nonlinear bump) — the failure shape
    that plateaus an inexact-Krylov recurrence: each new Arnoldi
    direction is polluted by a different O(err) vector, so once the
    informative component drops below err the Givens sines approach 1
    and the residual stalls (observed on RBC geometry, results/RBC.md)."""
    rng = np.random.default_rng(seed)
    A = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    E = rng.standard_normal((n, n)) / np.sqrt(n)

    import jax.numpy as jnp

    Aj = jnp.asarray(A)
    Ej = jnp.asarray(E)

    def matvec(x, p):
        y = Aj @ x
        if p < p_exact:
            nrm = jnp.linalg.norm(x)
            xs = x / jnp.maximum(nrm, 1e-300)
            bump = Ej @ (xs * xs * xs)
            bump = bump / jnp.maximum(jnp.linalg.norm(bump), 1e-300)
            y = y + err * nrm * bump
        return y

    return A, matvec


def test_host_stall_guard_raises_p_and_converges():
    n = 40
    A, matvec = _stalling_matvec(n, err=5.0)
    b = np.ones(n)
    cfg = SolverConfig(
        residual=1e-8, max_iters=80, restart=80, max_p=10, p_min=1
    )
    x, info = gmres(matvec, b, config=cfg)
    assert info.converged, (info.residual, len(info.history))
    # the schedule must have dropped below p_exact (relaxation engaged)
    # and then been boosted back up by the stall guard
    ps = [p for (_, _, p) in info.history]
    assert min(ps) < 9
    ilow = ps.index(min(ps))
    assert max(ps[ilow:]) >= 9
    err = np.linalg.norm(A @ np.asarray(x) - b)
    assert err < 1e-6 * np.linalg.norm(b) * 1e3


def test_device_stall_guard_converges():
    n = 40
    A, matvec = _stalling_matvec(n, err=5.0)
    b = np.ones(n)
    cfg = SolverConfig(
        residual=1e-8, max_iters=80, restart=80, max_p=10, p_min=1
    )
    x, info = gmres_device(
        lambda operand, x, p: matvec(x, p), b, config=cfg
    )
    assert info.converged, (info.residual, len(info.history))
    err = np.linalg.norm(A @ np.asarray(x) - b)
    assert err < 1e-6 * np.linalg.norm(b) * 1e3


@pytest.fixture(scope="module")
def small_plan():
    from fmm_bem_tpu.bem.panels import make_panels
    from fmm_bem_tpu.bem.triangulation import unit_sphere
    from fmm_bem_tpu.executor.plan import FmmPlan
    from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel

    tris = unit_sphere(4)
    return FmmPlan(
        LaplaceBEMKernel(K=3),
        make_panels(tris, K=3),
        FMMConfig(ncrit=16, dtype="float64", max_p=10),
    )


def test_calibrate_eps_model(small_plan):
    c, gamma = small_plan.calibrate_eps()
    assert 0 < gamma < 1
    assert c > 0
    # samples decay with p
    eps = small_plan.eps_samples
    ps = sorted(eps)
    vals = [eps[p] for p in ps]
    assert vals[0] > vals[-1] > 0
    # the fitted model reproduces the measured samples within an order
    # of magnitude (it is a 2-parameter fit of a smooth decay)
    for p, e in eps.items():
        model = c * gamma**p
        assert 0.03 < model / e < 30.0, (p, e, model)


def test_calibrated_schedule_orders_sane(small_plan):
    cfg = SolverConfig(max_p=10, p_min=1).calibrated(small_plan)
    assert cfg.eps_c is not None
    # Bouras schedule is monotone in the residual: as the residual
    # DROPS the matvec may get MORE inexact (nu = tol/resid grows), so
    # the predicted order decreases — the paper's relaxation
    p_early = cfg.predict_p(1e-1)
    p_late = cfg.predict_p(1e-6)
    assert p_early >= p_late
    assert 1 <= p_early <= 10 and 1 <= p_late <= 10
    # relaxed solve with the calibrated model still converges
    mvf, op4p = small_plan.solver_ops(flipped=True)
    qn = np.ones(small_plan.src.tree.num_bodies)
    b = np.asarray(mvf(op4p(10), qn, 10))
    x, info = gmres(
        lambda x, p: mvf(op4p(p), x, p),
        b,
        config=SolverConfig(
            residual=1e-5, max_iters=60, restart=60, max_p=10,
            p_min=1, eps_c=cfg.eps_c, eps_gamma=cfg.eps_gamma,
        ),
    )
    assert info.converged


def test_p_tier_quantization():
    from fmm_bem_tpu.config import SolverConfig

    cfg = SolverConfig(max_p=10, p_min=1, p_tiers=(3, 5, 10))
    assert cfg.quantize_p(1) == 3
    assert cfg.quantize_p(3) == 3
    assert cfg.quantize_p(4) == 5
    assert cfg.quantize_p(6) == 10
    assert cfg.quantize_p(12) == 10
    # schedule_p routes through the quantiser
    assert cfg.schedule_p(1.0) in (3, 5, 10)
    # device replica agrees with the host quantiser
    import jax.numpy as jnp

    from fmm_bem_tpu.solver.gmres import _device_predict_p

    for resid in (1.0, 1e-2, 1e-4, 1e-6):
        host = cfg.schedule_p(resid)
        dev = int(_device_predict_p(jnp.float64(resid), cfg))
        assert host == dev, (resid, host, dev)


def test_fused_tier_cascade_matches_continuous_device():
    """With p_tiers set, gmres_device runs the WHOLE tier cascade in
    one compiled executable (lax.switch over per-tier matvecs, schedule
    + stall guard in-loop).  It must (a) converge to the same solution
    as the continuous-schedule device solver, (b) use only configured
    tiers in its history, and (c) keep the stall-demotion behaviour on
    an inexactness-polluted operator."""
    import jax.numpy as jnp

    n = 48
    rng = np.random.default_rng(7)
    A = np.eye(n) * 3.0 + 0.3 * rng.standard_normal((n, n))
    Aj = jnp.asarray(A)

    # p-dependent inexactness: exact at p >= 8
    E = jnp.asarray(rng.standard_normal((n, n)) / np.sqrt(n))

    def matvec(operand, x, p):
        y = Aj @ x
        if p < 8:
            y = y + (2.0 ** -p) * (E @ x)
        return y

    b = np.ones(n)
    cfg = SolverConfig(
        residual=1e-8, max_iters=80, restart=80, max_p=10, p_min=1,
        p_tiers=(3, 5, 10),
    )
    x_f, info_f = gmres_device(matvec, b, config=cfg)
    assert info_f.converged
    ps = {h[2] for h in info_f.history}
    assert ps <= {3, 5, 10}, ps
    # relaxation actually relaxed (not pinned at the top tier)
    assert min(ps) < 10

    cfg_c = SolverConfig(
        residual=1e-8, max_iters=80, restart=80, max_p=10, p_min=1,
    )
    x_c, info_c = gmres_device(matvec, b, config=cfg_c)
    assert info_c.converged
    exact = np.linalg.solve(A, b)
    for x in (x_f, x_c):
        rel = np.linalg.norm(np.asarray(x) - exact) / np.linalg.norm(exact)
        assert rel < 1e-6, rel


def test_fused_tier_cascade_stall_demotes_and_converges():
    from test_relaxation import _stalling_matvec  # self-import safe

    n = 40
    A, matvec = _stalling_matvec(n, err=5.0)
    b = np.ones(n)
    cfg = SolverConfig(
        residual=1e-8, max_iters=80, restart=80, max_p=10, p_min=1,
        p_tiers=(3, 5, 10),
    )
    x, info = gmres_device(
        lambda operand, x, p: matvec(x, p), b, config=cfg
    )
    assert info.converged, (info.residual, info.iterations)
    exact = np.linalg.solve(A, b)
    rel = np.linalg.norm(np.asarray(x) - exact) / np.linalg.norm(exact)
    assert rel < 1e-6, rel
