"""Quadrature-rule exactness and singular-integral validation."""

import numpy as np
import pytest

from fmm_bem_tpu.bem.quadrature import get_rule, duffy_rule
from fmm_bem_tpu.bem.integrals import semi_analytical, near_entries_laplace
from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.bem.triangulation import unit_sphere


def _integrate_monomial(pts, wts, i, j):
    """integral over unit right triangle of x^i y^j via the rule
    (barycentric: x = lambda_1's cartesian image), exact value
    i! j! / (i+j+2)!."""
    # map barycentric to the reference right triangle (0,0),(1,0),(0,1)
    x = pts[:, 1]
    y = pts[:, 2]
    approx = 0.5 * np.sum(wts * x**i * y**j)  # rule weights sum to 1, area 1/2
    from math import factorial

    exact = factorial(i) * factorial(j) / factorial(i + j + 2)
    return approx, exact


DEGREES = {1: 1, 3: 2, 4: 3, 7: 5, 13: 7, 16: 8, 17: 8, 19: 9, 25: 10, 79: 13}


@pytest.mark.parametrize("K,deg", sorted(DEGREES.items()))
def test_rule_polynomial_exactness(K, deg):
    pts, wts = get_rule(K)
    assert abs(wts.sum() - 1.0) < 1e-12
    for i in range(deg + 1):
        for j in range(deg + 1 - i):
            approx, exact = _integrate_monomial(pts, wts, i, j)
            assert abs(approx - exact) < 1e-12, (K, i, j, approx, exact)


def test_duffy_rule_accuracy():
    pts, wts = duffy_rule(9)
    for i, j in [(0, 0), (3, 2), (5, 5), (8, 1)]:
        approx, exact = _integrate_monomial(pts, wts, i, j)
        assert abs(approx - exact) < 1e-12


def _fine_quad_integral(verts, x, kappa=0.0, n=40):
    """Oracle: very fine Duffy quadrature of int 1/r (or Yukawa) dA for
    a NON-singular target."""
    pts, wts = duffy_rule(n)
    v0, v1, v2 = verts
    qp = pts @ np.stack([v0, v1, v2])
    area = 0.5 * np.linalg.norm(np.cross(v2 - v0, v1 - v0))
    r = np.linalg.norm(qp - x, axis=1)
    g = np.exp(-kappa * r) / r if kappa else 1.0 / r
    return area * (wts * g).sum()


def _self_quad_integral(verts, x, kappa=0.0, n=60):
    """Oracle for the singular self integral: split at the interior
    point x into 3 sub-triangles, Duffy-collapse the singular vertex."""
    total = 0.0
    v = list(verts)
    for a, b in ((0, 1), (1, 2), (2, 0)):
        sub = np.stack([x, v[a], v[b]])
        pts, wts = duffy_rule(n)
        # Duffy clusters points toward vertex 0 = the singularity
        qp = pts @ sub
        area = 0.5 * np.linalg.norm(np.cross(sub[2] - sub[0], sub[1] - sub[0]))
        r = np.linalg.norm(qp - x, axis=1)
        r = np.maximum(r, 1e-14)
        g = np.exp(-kappa * r) / r if kappa else 1.0 / r
        total += area * (wts * g).sum()
    return total


@pytest.mark.parametrize("kappa", [0.0, 0.7])
def test_semi_analytical_offset_target(kappa):
    """SA integral vs fine quadrature for targets near (but off) the
    panel plane."""
    rng = np.random.default_rng(0)
    verts = np.array([[0.0, 0, 0], [1.0, 0.1, 0], [0.2, 0.9, 0.05]])
    for xoff in ([0.3, 0.3, 0.4], [0.5, 0.2, -0.3], [1.5, 1.5, 0.2]):
        x = np.asarray(xoff)
        G, dG = semi_analytical(verts[None], x[None], np.array([False]), kappa)
        oracle = _fine_quad_integral(verts, x, kappa)
        assert abs(G[0] - oracle) / abs(oracle) < 5e-4, (xoff, G[0], oracle)


@pytest.mark.parametrize("kappa", [0.0, 0.7])
def test_semi_analytical_self(kappa):
    """SA self-integral (target = centroid, in plane) vs the split-Duffy
    oracle; dGdn self must be exactly +-2pi (ref SemiAnalytical:196-201)."""
    verts = np.array([[0.0, 0, 0], [1.0, 0.0, 0], [0.3, 0.8, 0.0]])
    x = verts.mean(axis=0)
    G, dG = semi_analytical(verts[None], x[None], np.array([True]), kappa)
    oracle = _self_quad_integral(verts, x, kappa)
    assert abs(G[0] - oracle) / abs(oracle) < 1e-3, (G[0], oracle)
    assert dG[0] == (-2 * np.pi if kappa else 2 * np.pi)


def test_near_entries_match_oracle():
    """Assembled near-field entries (mixed SA/fine/plain quadrature
    paths) vs fine-quadrature oracles on a small sphere mesh."""
    tris = unit_sphere(2)  # 32 panels
    fields = make_panels(tris, K=3)
    n = len(tris)
    rng = np.random.default_rng(1)
    t_idx = rng.integers(0, n, 40)
    s_idx = rng.integers(0, n, 40)
    G, dG = near_entries_laplace(fields, fields, t_idx, s_idx)
    for ti, si, g in zip(t_idx, s_idx, G):
        x = fields["xyz"][ti]
        verts = fields["vertices"][si]
        if ti == si:
            oracle = _self_quad_integral(verts, x)
            assert abs(g - oracle) / oracle < 1e-3
        else:
            oracle = _fine_quad_integral(verts, x)
            # plain K=3 quadrature for well-separated panels is low order
            dist = np.linalg.norm(x - fields["xyz"][si])
            near = np.sqrt(2 * fields["area"][si]) / dist >= 0.5
            # the 5-pt theta-Gauss of SA reaches ~2% on borderline-near
            # pairs (verified: a 30-pt rule matches the oracle to 1e-8);
            # plain K=3 quadrature on separated panels is low order too
            tol = 3e-2 if near else 5e-2
            assert abs(g - oracle) / oracle < tol, (ti, si, g, oracle)


# ----------------------------------------------------------------------
# Closed-form singular self integrals (bem/analytical.py — the Fata
# role, ref FataAnalytical.hpp / StokesSphericalBEM.hpp:279-293)
# ----------------------------------------------------------------------
from fmm_bem_tpu.bem.analytical import (  # noqa: E402
    laplace_single_layer_self,
    stokes_single_layer_self,
)


def _random_triangles(n, seed=0, slivers=True):
    rng = np.random.default_rng(seed)
    tris = rng.standard_normal((n, 3, 3))
    if slivers:
        # every third triangle is a high-aspect sliver
        for i in range(0, n, 3):
            tris[i, 2] = (
                tris[i, 0]
                + 0.95 * (tris[i, 1] - tris[i, 0])
                + 0.01 * rng.standard_normal(3)
            )
    return tris


def _polar_oracle(verts, x, nq=400000):
    """Independent geometric oracle: 1D polar integration of R(theta)
    by ray/edge intersection (no shared code with the closed form)."""
    n = np.cross(verts[1] - verts[0], verts[2] - verts[0])
    n = n / np.linalg.norm(n)
    e1 = verts[1] - verts[0]
    e1 = e1 / np.linalg.norm(e1)
    e2 = np.cross(n, e1)
    th = (np.arange(nq) + 0.5) * 2 * np.pi / nq
    u = np.cos(th)[:, None] * e1 + np.sin(th)[:, None] * e2
    R = np.full(nq, np.inf)
    for a, b in ((0, 1), (1, 2), (2, 0)):
        A = verts[a] - x
        E = verts[b] - verts[a]
        a2 = np.array([A @ e1, A @ e2])
        E2 = np.array([E @ e1, E @ e2])
        u2 = np.stack([u @ e1, u @ e2], axis=1)
        det = -u2[:, 0] * E2[1] + u2[:, 1] * E2[0]
        with np.errstate(divide="ignore", invalid="ignore"):
            s = (-a2[0] * E2[1] + a2[1] * E2[0]) / det
            t = (u2[:, 0] * a2[1] - u2[:, 1] * a2[0]) / det
        hit = (t >= -1e-12) & (t <= 1 + 1e-12) & (s > 0)
        R = np.where(hit & (s < R), s, R)
    w = 2 * np.pi / nq
    I0 = (R * w).sum()
    M = ((R * w)[:, None, None] * u[:, :, None] * u[:, None, :]).sum(0)
    return I0, I0 * np.eye(3) + M


def test_closed_form_matches_independent_oracle():
    tris = _random_triangles(6, seed=3)
    x = tris.mean(axis=1)
    G = stokes_single_layer_self(tris, x)
    I0 = laplace_single_layer_self(tris, x)
    for i in range(len(tris)):
        I0o, Go = _polar_oracle(tris[i], x[i])
        # tolerance set by the oracle's own midpoint-rule resolution
        # (slivers have near-kinks in R(theta))
        assert abs(I0[i] - I0o) / I0o < 2e-6
        assert np.abs(G[i] - Go).max() / np.abs(Go).max() < 2e-6


def test_closed_form_exact_identities():
    """trace(G) = 4 * int 1/r and n^T G n = int 1/r hold exactly for
    the flat-panel Stokeslet block."""
    tris = _random_triangles(30, seed=4)
    x = tris.mean(axis=1)
    G = stokes_single_layer_self(tris, x)
    I0 = laplace_single_layer_self(tris, x)
    tr = np.trace(G, axis1=1, axis2=2)
    assert np.abs(tr - 4 * I0).max() / np.abs(I0).max() < 1e-12
    nrm = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    nrm /= np.linalg.norm(nrm, axis=1)[:, None]
    Gnn = np.einsum("bi,bij,bj->b", nrm, G, nrm)
    assert np.abs(Gnn - I0).max() / np.abs(I0).max() < 1e-12


def test_duffy_self_term_convergence_study():
    """The VERDICT-requested study: split-Duffy at n in {8..96} vs the
    closed form on random skewed triangles.  Pins (a) that Duffy
    converges to the closed form (validating both) and (b) the error of
    the former default n=24 rule — which motivated replacing it with
    the closed form in stokes_near_entries."""
    from fmm_bem_tpu.kernels.stokes_bem import _self_velocity_integral

    tris = _random_triangles(21, seed=5)
    x = tris.mean(axis=1)
    G_cf = stokes_single_layer_self(tris, x)
    scale = np.abs(G_cf).max()
    errs = {}
    for n in (8, 16, 24, 48, 96):
        G_d = _self_velocity_integral(tris, x, n_duffy=n)
        errs[n] = np.abs(G_d - G_cf).max() / scale
    # monotone convergence toward the closed form
    assert errs[8] > errs[24] > errs[96]
    assert errs[96] < 1e-3
    # the n=24 rule carried O(3e-3) relative error on slivers — above
    # the 1e-5 solver tolerance, hence the closed form is the default
    assert errs[24] < 2e-2


def _refined_quad(f, tri, K=79, depth=4):
    """Subdivided high-order quadrature oracle for smooth-enough
    integrands (targets at moderate distance)."""
    pts, wts = get_rule(K)
    tris = [tri]
    for _ in range(depth):
        new = []
        for t in tris:
            m01, m12, m20 = (
                (t[0] + t[1]) / 2, (t[1] + t[2]) / 2, (t[2] + t[0]) / 2
            )
            new += [
                np.stack([t[0], m01, m20]), np.stack([m01, t[1], m12]),
                np.stack([m20, m12, t[2]]), np.stack([m01, m12, m20]),
            ]
        tris = new
    total = 0.0
    for t in tris:
        qp = pts @ t
        area = 0.5 * np.linalg.norm(np.cross(t[2] - t[0], t[1] - t[0]))
        total = total + np.tensordot(wts * area, f(qp), axes=(0, 0))
    return total


def test_offplane_closed_forms_match_refined_quadrature():
    """The general (off-plane) Fata-role closed forms
    (FataAnalytical.hpp:236-420 capability) vs a refined 79-point
    oracle at several heights/offsets, plus in-plane consistency with
    the self-term forms."""
    from fmm_bem_tpu.bem.analytical import (
        laplace_layers,
        laplace_single_layer_self,
        stokes_single_layer,
        stokes_single_layer_self,
        stokes_stresslet_layer,
    )

    tris = _random_triangles(3, seed=7)
    for tri in tris:
        n = np.cross(tri[1] - tri[0], tri[2] - tri[0])
        n /= np.linalg.norm(n)
        size = np.sqrt(np.linalg.norm(
            np.cross(tri[1] - tri[0], tri[2] - tri[0])
        ))
        for hoff, lat in ((0.5, 0.0), (0.15, 0.4), (-0.3, 0.2)):
            x = (
                tri.mean(0) + hoff * size * n
                + lat * (tri[1] - tri[0])
            )[None]
            v = tri[None]
            G, dG = laplace_layers(v, x)
            SL = stokes_single_layer(v, x)
            ST = stokes_stresslet_layer(v, x)

            qG = _refined_quad(
                lambda qp: 1.0 / np.linalg.norm(qp - x, axis=1), tri
            )
            qdG = _refined_quad(
                lambda qp: ((qp - x) @ n)
                / np.linalg.norm(qp - x, axis=1) ** 3,
                tri,
            )

            def sl(qp):
                d = qp - x
                r2 = (d * d).sum(1)
                r3 = r2 * np.sqrt(r2)
                return (
                    r2[:, None, None] * np.eye(3)
                    + d[:, :, None] * d[:, None, :]
                ) / r3[:, None, None]

            def stl(qp):
                # framework convention: dx = x - y
                d = x - qp
                r2 = (d * d).sum(1)
                r5 = r2 * r2 * np.sqrt(r2)
                return (d @ n)[:, None, None] * (
                    d[:, :, None] * d[:, None, :]
                ) / r5[:, None, None]

            qSL = _refined_quad(sl, tri)
            qST = _refined_quad(stl, tri)
            sG = max(abs(qG), 1e-30)
            # tolerances bound the ORACLE's refinement error (the
            # closed forms are exact; 1/r^3, 1/r^5 integrands converge
            # slowest under subdivision)
            assert abs(G[0] - qG) / sG < 1e-6, (hoff, lat)
            assert abs(dG[0] - qdG) / max(abs(qdG), sG) < 1e-5
            assert np.abs(SL[0] - qSL).max() / np.abs(qSL).max() < 1e-5
            assert np.abs(ST[0] - qST).max() / max(
                np.abs(qST).max(), 1e-12
            ) < 1e-4

        # in-plane limits reduce to the self-term forms
        xc = tri.mean(0)[None]
        v = tri[None]
        assert abs(
            laplace_layers(v, xc)[0][0]
            - laplace_single_layer_self(v, xc)[0]
        ) < 1e-12
        assert np.abs(
            stokes_single_layer(v, xc)[0]
            - stokes_single_layer_self(v, xc)[0]
        ).max() < 1e-12
        # stresslet one-sided limits over the interior = the
        # double-layer jump -+(2 pi/3) I, i.e. +-2 pi I after the
        # traction -3 scale — the reference's self convention
        eps = 1e-9 * size
        up = stokes_stresslet_layer(v, xc + eps * n)
        dn = stokes_stresslet_layer(v, xc - eps * n)
        assert np.abs(-3 * up + 2 * np.pi * np.eye(3)).max() < 1e-5
        assert np.abs(-3 * dn - 2 * np.pi * np.eye(3)).max() < 1e-5


def test_stokes_near_entries_analytical_beats_fine_quadrature():
    """The VERDICT-requested study in executable form: on adjacent
    sphere panels (the near-singular set), compare BOTH the analytical
    path and the reference's fine-K quadrature against a refined
    subdivided oracle.  The closed form must (a) agree with the oracle
    to its refinement error and (b) be at least as accurate as fine-K
    everywhere, and strictly better on the closest pairs."""
    from fmm_bem_tpu.kernels.stokes_bem import stokes_near_entries

    tris = unit_sphere(2)
    fields = make_panels(tris, K=4)
    n = len(tris)
    centers = np.asarray(fields["xyz"])
    area = np.asarray(fields["area"])
    # nearest non-self pairs: the worst case for quadrature
    d2 = ((centers[:, None] - centers[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    s_idx = np.argmin(d2, axis=1)[:12]
    t_idx = np.arange(12)
    # sanity: these are genuinely near-singular per the ref criterion
    dist = np.linalg.norm(centers[t_idx] - centers[s_idx], axis=1)
    assert (np.sqrt(2 * area[s_idx]) / dist >= 0.5).all()

    va, ta = stokes_near_entries(
        fields, fields, t_idx, s_idx, mu=0.5, fine_K=25, analytical=True
    )
    vq, tq = stokes_near_entries(
        fields, fields, t_idx, s_idx, mu=0.5, fine_K=25,
        analytical=False,
    )
    verts = np.asarray(fields["vertices"])[s_idx]
    normal = np.asarray(fields["normal"])[s_idx]
    x = centers[t_idx]

    for i in range(len(t_idx)):
        xi = x[i]

        def sl(qp):
            d = qp - xi
            r2 = (d * d).sum(1)
            r3 = r2 * np.sqrt(r2)
            return (
                r2[:, None, None] * np.eye(3)
                + d[:, :, None] * d[:, None, :]
            ) / r3[:, None, None]

        def stl(qp):
            d = xi - qp
            r2 = (d * d).sum(1)
            r5 = r2 * r2 * np.sqrt(r2)
            return (d @ normal[i])[:, None, None] * (
                d[:, :, None] * d[:, None, :]
            ) / r5[:, None, None]

        oSL = _refined_quad(sl, verts[i], depth=5)  # /(2 mu) applied below
        oST = _refined_quad(stl, verts[i], depth=5) * -3.0
        sv = np.abs(oSL).max()
        st = max(np.abs(oST).max(), 1e-6)
        errA_v = np.abs(va[i] - oSL).max() / sv
        errQ_v = np.abs(vq[i] - oSL).max() / sv
        errA_t = np.abs(ta[i] - oST).max() / st
        errQ_t = np.abs(tq[i] - oST).max() / st
        assert errA_v < 5e-6, (i, errA_v)
        assert errA_t < 5e-5, (i, errA_t)
        assert errA_v <= errQ_v + 1e-9
        assert errA_t <= errQ_t + 1e-7
