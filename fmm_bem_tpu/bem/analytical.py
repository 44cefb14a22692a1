"""Closed-form singular panel integrals (the reference's Fata role).

The reference evaluates the singular Stokes single-layer self-integral
with S. Fata's closed-form expressions (FataAnalytical.hpp:236-420,
consumed at kernel/StokesSphericalBEM.hpp:279-293; optional for Laplace
via USE_ANALYTICAL, kernel/LaplaceSphericalBEM.hpp:8-12).  This module
provides the same capability from an independent derivation specialised
to the case the reference actually uses it for — the *self* term, where
the target lies in the panel plane (the panel centroid):

For a flat triangle T with in-plane target x, switch to polar
coordinates about x (dS = r dr dtheta).  The Stokeslet block
``G = I/r + rhat rhat^T / r`` then integrates radially to elementary
per-edge antiderivatives.  Decompose T into three sub-triangles
(x, v_a, v_b); for each edge let t_hat be the unit edge direction,
f_hat the unit foot-of-perpendicular direction from x, d the
perpendicular distance, and s the signed coordinate along the edge
(s_a < s_b, s_b - s_a = edge length).  With psi the angle from f_hat
(tan psi = s/d) the radial extent is R(psi) = d sec(psi) and

  int 1/r dS              = d * [asinh(s/d)]
  int cos^2 psi sec psi   -> [sin psi],   sin psi = s / sqrt(s^2+d^2)
  int sin psi cos psi sec -> [-cos psi],  cos psi = d / sqrt(s^2+d^2)
  int sin^2 psi sec psi   -> [asinh(s/d) - sin psi]

so the in-plane direction u(psi) = cos(psi) f_hat + sin(psi) t_hat
gives the uu^T moment per edge in closed form.  Every edge contributes
positively (s_b > s_a by construction), which sums the three sector
integrals exactly — valid whenever x is inside T, which holds for the
self-term (x = centroid).

All functions are batched numpy (host near-field assembly path).
"""

from __future__ import annotations

import numpy as np


def _edge_terms(verts, x):
    """Per-edge closed-form primitives.

    Returns (I0, M) where I0 [B] = int_T 1/r dS and M [B,3,3] =
    int_T rhat rhat^T / r dS, for targets x [B,3] inside the flat
    triangles verts [B,3,3] (and in their planes).
    """
    verts = np.asarray(verts, np.float64)
    x = np.asarray(x, np.float64)
    B = x.shape[0]
    I0 = np.zeros(B)
    M = np.zeros((B, 3, 3))
    for a, b in ((0, 1), (1, 2), (2, 0)):
        va = verts[:, a] - x
        vb = verts[:, b] - x
        E = vb - va
        elen = np.linalg.norm(E, axis=1)
        elen = np.maximum(elen, 1e-300)
        t_hat = E / elen[:, None]
        s_a = (va * t_hat).sum(1)
        s_b = (vb * t_hat).sum(1)
        F = va - s_a[:, None] * t_hat  # foot of perpendicular
        d = np.linalg.norm(F, axis=1)
        # target on the edge line -> zero-area sector, no contribution
        ok = d > 1e-14 * elen
        dd = np.where(ok, d, 1.0)
        f_hat = F / dd[:, None]

        asinh_b = np.arcsinh(s_b / dd)
        asinh_a = np.arcsinh(s_a / dd)
        dS = asinh_b - asinh_a
        ra = np.sqrt(s_a * s_a + d * d)
        rb = np.sqrt(s_b * s_b + d * d)
        dsin = s_b / rb - s_a / ra
        dcos = dd / rb - dd / ra

        ff = f_hat[:, :, None] * f_hat[:, None, :]
        tt = t_hat[:, :, None] * t_hat[:, None, :]
        ft = f_hat[:, :, None] * t_hat[:, None, :]
        ft = ft + np.swapaxes(ft, 1, 2)

        w = np.where(ok, d, 0.0)
        I0 += w * dS
        M += w[:, None, None] * (
            dsin[:, None, None] * ff
            - dcos[:, None, None] * ft
            + (dS - dsin)[:, None, None] * tt
        )
    return I0, M


def laplace_single_layer_self(verts, x):
    """Closed-form int_T 1/|y-x| dS(y) for in-plane interior targets.

    The Laplace-G Fata case (USE_ANALYTICAL,
    kernel/LaplaceSphericalBEM.hpp:8-12).  The companion dGdn self
    integral vanishes identically for a flat panel ((y-x).n = 0)."""
    I0, _ = _edge_terms(verts, x)
    return I0


def stokes_single_layer_self(verts, x):
    """Closed-form int_T (I/r + rhat rhat^T/r) dS — the Stokeslet
    single-layer self block (Fata role, StokesSphericalBEM.hpp:279).

    Returns [B,3,3]; multiply by 1/(2 mu) for the velocity BC entry."""
    I0, M = _edge_terms(verts, x)
    return I0[:, None, None] * np.eye(3) + M
