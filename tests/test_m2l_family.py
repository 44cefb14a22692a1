"""Family-grouped M2L (executor/plan._build_m2l_families).

The family path re-partitions the SAME operator: with it on or off the
matvec must agree to arithmetic precision, for point and panel kernels,
at full and relaxed p.  The build-time exactness guard (actual combo
mask == class-union mask & existing children) is what makes this safe
for any adaptive tree; these tests are the oracle for it.
"""

import numpy as np
import pytest

from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import FMMConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.laplace import LaplaceKernel
from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel


@pytest.fixture(scope="module")
def point_plans():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, (3000, 3))
    mk = lambda fam: FmmPlan(
        LaplaceKernel(),
        {"xyz": pts},
        FMMConfig(ncrit=32, max_p=5, dtype="float64", m2l_family=fam),
    )
    return mk(True), mk(False), rng.normal(size=3000)


def test_family_covers_most_pairs(point_plans):
    on, off, _ = point_plans
    fam = on.m2l_fam
    assert fam is not None
    total = sum(len(s) for s in off.m2l_classes.src)
    # volume distribution: the strong majority of pairs are same-level
    assert fam.npairs > 0.5 * total
    # residual tiles shrink accordingly
    assert len(on.m2l_tile_src) < len(off.m2l_tile_src)


def test_family_matvec_equivalence_points(point_plans):
    on, off, q = point_plans
    for p in (5, 3):
        a = np.asarray(on.apply(q, p=p))
        b = np.asarray(off.apply(q, p=p))
        assert np.abs(a - b).max() <= 1e-12 * np.abs(b).max()


def test_family_matvec_equivalence_bem():
    tris = unit_sphere(4)
    fields = make_panels(tris, K=3)
    rng = np.random.default_rng(5)
    q = rng.normal(size=len(tris))
    mk = lambda fam: FmmPlan(
        LaplaceBEMKernel(K=3),
        fields,
        FMMConfig(ncrit=64, max_p=5, dtype="float64", m2l_family=fam),
    )
    a = np.asarray(mk(True).apply(q, p=5))
    b = np.asarray(mk(False).apply(q, p=5))
    assert np.abs(a - b).max() <= 1e-12 * np.abs(b).max()


def test_family_partition_is_exact(point_plans):
    """Families + residual tiles partition the full pair set: the
    family pair count plus unpadded residual pairs equals the class
    path's total."""
    on, off, _ = point_plans
    total = sum(len(s) for s in off.m2l_classes.src)
    dummy = on.tgt.tree.num_boxes
    res_real = int((on.m2l_tile_tgt != dummy).sum())
    assert on.m2l_fam.npairs + res_real == total
