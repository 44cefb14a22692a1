"""Restarted GMRES / FGMRES with inexact-Krylov p-relaxation.

TPU-native re-design of examples/BEM/GMRES.hpp (:142-252 GMRES, :276-380
FGMRES): the Arnoldi vectors live on device and all heavy lineal algebra
is jnp; the tiny Hessenberg/Givens updates run on the host, which also
drives the *relaxation schedule* — before every inner matvec the
truncation order is predicted from the current residual
(SolverOptions::predict_p, ref GMRES.hpp:195-196) and passed to
``matvec(x, p)``; the FmmPlan turns each distinct p into a cheaper
compiled specialisation instead of rebuilding kernel tables.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from fmm_bem_tpu.config import SolverConfig


@dataclasses.dataclass
class SolveInfo:
    iterations: int
    residual: float
    converged: bool
    #: (iteration, residual, p) per inner step — mirrors the reference's
    #: "it, res, fmm_req_p" print (GMRES.hpp:225)
    history: list


def _apply_plane_rotations(h, cs, sn, i):
    """Apply accumulated Givens rotations to column h (ref GMRES.hpp:82-116)."""
    for k in range(i):
        t = cs[k] * h[k] + sn[k] * h[k + 1]
        h[k + 1] = -sn[k] * h[k] + cs[k] * h[k + 1]
        h[k] = t
    return h


def _gen_rotation(dx, dy):
    if dy == 0.0:
        return 1.0, 0.0
    if abs(dy) > abs(dx):
        t = dx / dy
        sn = 1.0 / np.sqrt(1.0 + t * t)
        return t * sn, sn
    t = dy / dx
    cs = 1.0 / np.sqrt(1.0 + t * t)
    return cs, t * cs


def gmres(
    matvec: Callable,
    b,
    x0=None,
    config: Optional[SolverConfig] = None,
    M: Optional[Callable] = None,
    p_fixed: Optional[int] = None,
    flexible: bool = False,
    verbose: bool = False,
):
    """Solve A x = b with right-preconditioned restarted GMRES.

    Parameters
    ----------
    matvec : callable ``(x, p) -> A@x`` evaluated at truncation order p
        (an FmmPlan-backed operator; a dense operator may ignore p).
    M : right preconditioner callable ``(r) -> z`` (default identity).
    flexible : FGMRES — store Z = M(V) columns so a varying/nonlinear
        preconditioner is applied consistently (ref GMRES.hpp:276-380).
    p_fixed : disable relaxation and use this order for every matvec
        (the reference's ``-fixed_p`` flag, LaplaceBEM.cpp:120).
    """
    import jax

    cfg = config or SolverConfig()
    b = jnp.asarray(b)
    n = b.shape[0]
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    if M is None:
        M = lambda r: r

    normb = float(jnp.linalg.norm(b))
    if normb == 0.0:
        normb = 1.0

    history = []
    total_it = 0
    resid = 1.0

    restart = min(cfg.restart, cfg.max_iters, n)

    # One fused device op per Arnoldi step: all modified-Gram-Schmidt
    # projections against the stored basis matrix at once (a [i, n]
    # matvec pair) — the reference's per-column dot loop
    # (GMRES.hpp:203-208) would cost one device round-trip per column.
    @jax.jit
    def _ortho(Vbuf, w, i):
        mask = (jnp.arange(Vbuf.shape[0]) <= i)[:, None]
        Vm = jnp.where(mask, Vbuf, 0.0)
        coeffs = Vm @ w
        w = w - coeffs @ Vm
        # one re-orthogonalisation pass for float32 robustness
        c2 = Vm @ w
        w = w - c2 @ Vm
        beta = jnp.linalg.norm(w)
        return w, coeffs + c2, beta

    while total_it < cfg.max_iters:
        # full-accuracy residual at (re)start (ref GMRES.hpp:175-182)
        r = b - matvec(x, cfg.max_p)
        beta = float(jnp.linalg.norm(r))
        resid = beta / normb
        if resid < cfg.residual:
            return x, SolveInfo(total_it, resid, True, history)

        Vbuf = jnp.zeros((restart + 1, n), b.dtype).at[0].set(r / beta)
        Z = []
        H = np.zeros((restart + 1, restart))
        cs = np.zeros(restart + 1)
        sn = np.zeros(restart + 1)
        s = np.zeros(restart + 1)
        s[0] = beta

        i = -1
        for i in range(restart):
            if total_it >= cfg.max_iters:
                break
            # ---- relaxation: predict p from current residual
            p = cfg.schedule_p(resid, p_fixed)
            z = M(Vbuf[i])
            if flexible:
                Z.append(z)
            w = matvec(z, p)
            w, coeffs, bnorm = _ortho(Vbuf, w, i)
            H[: i + 1, i] = np.asarray(coeffs)[: i + 1]
            H[i + 1, i] = float(bnorm)
            if H[i + 1, i] > 1e-300:
                Vbuf = Vbuf.at[i + 1].set(w / H[i + 1, i])
            else:
                Vbuf = Vbuf.at[i + 1].set(w)

            # Givens update (ref GMRES.hpp:218-220)
            h = _apply_plane_rotations(H[: i + 2, i].copy(), cs, sn, i)
            cs[i], sn[i] = _gen_rotation(h[i], h[i + 1])
            h[i], h[i + 1] = cs[i] * h[i] + sn[i] * h[i + 1], 0.0
            H[: i + 2, i] = h
            s[i + 1] = -sn[i] * s[i]
            s[i] = cs[i] * s[i]
            resid = abs(s[i + 1]) / normb
            total_it += 1
            history.append((total_it, resid, p))
            if verbose:
                print(f"it: {total_it:4d}  res: {resid:.3e}  fmm_req_p: {p}")
            if resid < cfg.residual:
                break

        # back-substitution and update (ref GMRES.hpp:230-243)
        m = i + 1
        if m > 0:
            y = np.zeros(m)
            for k in range(m - 1, -1, -1):
                y[k] = (s[k] - H[k, k + 1 : m] @ y[k + 1 : m]) / H[k, k]
            if flexible:
                for k in range(m):
                    x = x + y[k] * Z[k]
            else:
                dx = jnp.asarray(y, b.dtype) @ Vbuf[:m]
                x = x + M(dx)
        if resid < cfg.residual:
            return x, SolveInfo(total_it, resid, True, history)

    return x, SolveInfo(total_it, resid, False, history)


def fgmres(matvec, b, **kw):
    """Flexible GMRES (ref GMRES.hpp:276-380)."""
    return gmres(matvec, b, flexible=True, **kw)
