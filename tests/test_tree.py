"""Tree-structure invariants (analogue of the reference test_tree.cpp and
the structural half of tests/correctness.cpp)."""

import numpy as np

from fmm_bem_tpu.tree import morton
from fmm_bem_tpu.tree.octree import build_tree


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    ix = rng.integers(0, morton.CELLS_PER_SIDE, size=1000)
    iy = rng.integers(0, morton.CELLS_PER_SIDE, size=1000)
    iz = rng.integers(0, morton.CELLS_PER_SIDE, size=1000)
    code = morton.interleave(ix, iy, iz)
    jx, jy, jz = morton.deinterleave(code)
    assert (ix == jx).all() and (iy == jy).all() and (iz == jz).all()


def test_morton_order_matches_lexicographic_cells():
    # sorting by morton code must group points by octant recursively:
    # the top 3 bits are the octant at level 1
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, size=(512, 3))
    t = build_tree(pts, ncrit=32)
    # codes sorted ascending
    assert (np.diff(t.codes) >= 0).all()
    # perm is a permutation reproducing the stored points
    assert np.allclose(pts[t.perm], t.points)


def _check_invariants(t, ncrit):
    n = t.num_bodies
    # root covers everything
    assert t.box_body_start[0] == 0 and t.box_body_count[0] == n
    # levels contiguous ascending
    assert (np.diff(t.box_level) >= 0).all()
    for lvl in range(t.num_levels):
        sl = slice(t.level_offset[lvl], t.level_offset[lvl + 1])
        assert (t.box_level[sl] == lvl).all()
    # children partition the parent's body range
    for b in range(t.num_boxes):
        c0, nc = t.box_child_start[b], t.box_child_count[b]
        if t.box_is_leaf[b]:
            assert nc == 0
            assert t.box_body_count[b] <= ncrit or t.box_level[b] == 10
        else:
            assert nc >= 1
            kids = np.arange(c0, c0 + nc)
            assert (t.box_parent[kids] == b).all()
            assert t.box_body_start[kids[0]] == t.box_body_start[b]
            ends = t.box_body_start[kids] + t.box_body_count[kids]
            assert ends[-1] == t.box_body_start[b] + t.box_body_count[b]
            assert (t.box_body_start[kids][1:] == ends[:-1]).all()
    # every body is inside its leaf box geometrically
    centers = t.box_center[t.body_leaf]
    radii = t.box_radius[t.body_leaf]
    assert (np.abs(t.points - centers) <= radii[:, None] * (1 + 1e-9)).all()
    # leaves cover all bodies exactly once
    leaf_counts = t.box_body_count[t.box_is_leaf]
    assert leaf_counts.sum() == n


def test_tree_invariants_uniform():
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 1, size=(2000, 3))
    t = build_tree(pts, ncrit=64)
    _check_invariants(t, 64)


def test_tree_invariants_clustered():
    rng = np.random.default_rng(3)
    # two tight clusters far apart -> deep adaptive refinement
    a = rng.normal(0, 1e-3, size=(500, 3))
    b = rng.normal(0, 1e-3, size=(500, 3)) + 10.0
    t = build_tree(np.concatenate([a, b]), ncrit=16)
    _check_invariants(t, 16)
    assert t.num_levels > 3


def test_tree_small_n_single_leaf():
    rng = np.random.default_rng(4)
    pts = rng.uniform(0, 1, size=(10, 3))
    t = build_tree(pts, ncrit=64)
    assert t.num_boxes == 1 and t.box_is_leaf[0]


def test_format_tree():
    """ASCII tree printer (ref Octree.hpp:736-753): depth-first, one
    line per box, 2-space indent per level, body ranges consistent."""
    rng = np.random.default_rng(7)
    tree = build_tree(rng.uniform(0, 1, (300, 3)), ncrit=16)
    out = tree.format_tree()
    lines = out.splitlines()
    assert len(lines) == tree.num_boxes
    assert lines[0].startswith("Box 0: level 0, 300 bodies")
    # every leaf line is marked; indentation tracks the level
    import re

    for ln in lines:
        m = re.match(r"( *)Box (\d+): level (\d+)", ln)
        assert m, ln
        assert len(m.group(1)) == 2 * int(m.group(3))
        b = int(m.group(2))
        assert ln.rstrip().endswith("leaf") == bool(tree.box_is_leaf[b])
    # truncation cap
    short = tree.format_tree(max_boxes=5)
    assert "boxes total" in short.splitlines()[-1]
