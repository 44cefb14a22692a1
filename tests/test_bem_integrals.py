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


DEGREES = {1: 1, 3: 2, 4: 3, 7: 5, 13: 7, 16: 8, 17: 8, 19: 9, 25: 10}


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
