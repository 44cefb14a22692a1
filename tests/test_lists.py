"""Traversal completeness: every (source, target) body pair must be
covered by exactly one interaction (P2P, or one far-field pair between
ancestor boxes).  This is the array-level statement of the UnitKernel
exactness oracle (ref tests/correctness.cpp:21-80: FMM with K===1 equals
direct summation to 1e-13)."""

import numpy as np
import pytest

from fmm_bem_tpu.tree.octree import build_tree
from fmm_bem_tpu.traversal.lists import build_interaction_lists, expand_to_leaves


def _coverage_counts(tree, lists, treecode=False):
    """For unit charges, accumulate how many sources each morton-ordered
    target body 'sees' through the lists."""
    n = tree.num_bodies
    counts = np.zeros(n, dtype=np.int64)
    far = lists.m2p_pairs if treecode else lists.m2l_pairs
    for s, t in far:
        ts, tc = tree.box_body_start[t], tree.box_body_count[t]
        counts[ts : ts + tc] += tree.box_body_count[s]
    for s, t in lists.p2p_pairs:
        ts, tc = tree.box_body_start[t], tree.box_body_count[t]
        counts[ts : ts + tc] += tree.box_body_count[s]
    return counts


@pytest.mark.parametrize("theta", [0.5, 0.8])
@pytest.mark.parametrize("ncrit", [16, 64])
def test_single_tree_coverage(theta, ncrit):
    rng = np.random.default_rng(10)
    pts = rng.uniform(-1, 1, size=(3000, 3))
    tree = build_tree(pts, ncrit=ncrit)
    lists = build_interaction_lists(tree, theta=theta)
    counts = _coverage_counts(tree, lists)
    assert (counts == tree.num_bodies).all()


def test_treecode_coverage():
    rng = np.random.default_rng(11)
    pts = rng.uniform(-1, 1, size=(2000, 3))
    tree = build_tree(pts, ncrit=32)
    lists = build_interaction_lists(tree, theta=0.5, treecode=True)
    # all m2p targets are leaves
    assert tree.box_is_leaf[lists.m2p_pairs[:, 1]].all()
    counts = _coverage_counts(tree, lists, treecode=True)
    assert (counts == tree.num_bodies).all()


def test_dual_tree_coverage():
    """Separate source and target trees (ref tests/dual_correctness.cpp)."""
    rng = np.random.default_rng(12)
    src = rng.uniform(-1, 1, size=(1500, 3))
    tgt = rng.uniform(-1, 1, size=(1100, 3))
    # shared bounding cube so morton cells align
    allpts = np.concatenate([src, tgt])
    from fmm_bem_tpu.tree.octree import bounding_cube

    pmin, side = bounding_cube(allpts)
    st = build_tree(src, ncrit=32, pmin=pmin, side=side)
    tt = build_tree(tgt, ncrit=32, pmin=pmin, side=side)
    lists = build_interaction_lists(st, theta=0.5, tgt_tree=tt)
    n = tt.num_bodies
    counts = np.zeros(n, dtype=np.int64)
    for s, t in lists.m2l_pairs:
        ts, tc = tt.box_body_start[t], tt.box_body_count[t]
        counts[ts : ts + tc] += st.box_body_count[s]
    for s, t in lists.p2p_pairs:
        ts, tc = tt.box_body_start[t], tt.box_body_count[t]
        counts[ts : ts + tc] += st.box_body_count[s]
    assert (counts == st.num_bodies).all()


def test_mac_separation():
    """Every accepted M2L pair must actually satisfy the MAC."""
    rng = np.random.default_rng(13)
    pts = rng.uniform(-1, 1, size=(2000, 3))
    tree = build_tree(pts, ncrit=32)
    theta = 0.5
    lists = build_interaction_lists(tree, theta=theta)
    s, t = lists.m2l_pairs[:, 0], lists.m2l_pairs[:, 1]
    d2 = ((tree.box_center[s] - tree.box_center[t]) ** 2).sum(axis=1)
    rhs = (tree.box_radius[s] + tree.box_radius[t]) / theta
    # tie-consistent MAC: accepted pairs satisfy the tolerant predicate
    assert (d2 > rhs * rhs * (1.0 - 1e-12)).all()


def test_expand_to_leaves():
    rng = np.random.default_rng(14)
    pts = rng.uniform(-1, 1, size=(800, 3))
    tree = build_tree(pts, ncrit=16)
    leaves, rows = expand_to_leaves(tree, np.array([0], dtype=np.int32))
    assert sorted(leaves.tolist()) == sorted(tree.leaves.tolist())
    assert (rows == 0).all()
