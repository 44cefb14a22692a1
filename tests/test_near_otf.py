"""On-the-fly near-field mode (FMMConfig.near_mode="otf").

The OTF operator must equal the cached-panel operator to arithmetic
precision: same near-singular corrections (stored as deltas vs the
regular quadrature the device recomputes), same far field.  Mirrors
the reference's plain lazy evaluator (EvalInteractionLazy.hpp:239-252)
vs its sparse twin — two storage strategies for one operator.
"""

import numpy as np
import pytest

from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import FMMConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel
from fmm_bem_tpu.kernels.yukawa_bem import YukawaBEMKernel


@pytest.fixture(scope="module")
def sphere4():
    tris = unit_sphere(4)
    return tris, make_panels(tris, K=3)


def _pair(kern_f, fields, **cfg):
    mk = lambda mode: FmmPlan(
        kern_f(),
        fields,
        FMMConfig(
            ncrit=64, max_p=5, dtype="float64", near_mode=mode, **cfg
        ),
    )
    return mk("cached"), mk("otf")


def test_otf_matches_cached_laplace(sphere4):
    tris, fields = sphere4
    cached, otf = _pair(lambda: LaplaceBEMKernel(K=3), fields)
    assert otf._otf_near and not cached._otf_near
    rng = np.random.default_rng(0)
    q = rng.normal(size=len(tris))
    a = np.asarray(cached.apply(q, p=5))
    b = np.asarray(otf.apply(q, p=5))
    assert np.abs(a - b).max() <= 1e-12 * np.abs(a).max()
    # the flipped-BC (RHS) operator too — the delta store is rebuilt
    # per BC variant
    af = np.asarray(cached.apply_flipped_bc(q, p=5))
    bf = np.asarray(otf.apply_flipped_bc(q, p=5))
    assert np.abs(af - bf).max() <= 1e-12 * np.abs(af).max()


def test_otf_slots_path(sphere4):
    tris, fields = sphere4
    _, otf = _pair(lambda: LaplaceBEMKernel(K=3), fields)
    ref = np.asarray(otf.apply(np.ones(len(tris)), p=5))[:, 0]
    mv, op4p, to_s, from_s, _ = otf.solver_ops_slots()
    x = np.asarray(from_s(mv(op4p(5), to_s(np.ones(len(tris))), 5)))
    assert np.abs(x - ref).max() <= 1e-12 * np.abs(ref).max()


def test_otf_store_is_small(sphere4):
    tris, fields = sphere4
    cached, otf = _pair(lambda: LaplaceBEMKernel(K=3), fields)
    big_dev, _ = cached.near_panels()
    otf_dev, _ = otf.near_panels()
    big = int(np.prod(big_dev["A"].shape)) * big_dev["A"].dtype.itemsize
    small = sum(
        int(np.prod(otf_dev[k].shape)) * otf_dev[k].dtype.itemsize
        for k in ("corr_valw", "corr_gleaf", "corr_gidx", "corr_rowof")
    )
    # the O(N) correction COO is a small fraction of the cached store
    assert small < 0.25 * big


def test_otf_matches_cached_yukawa(sphere4):
    tris, fields = sphere4
    cached, otf = _pair(lambda: YukawaBEMKernel(K=3, kappa=0.5), fields)
    rng = np.random.default_rng(2)
    q = rng.normal(size=len(tris))
    a = np.asarray(cached.apply(q, p=5))
    b = np.asarray(otf.apply(q, p=5))
    assert np.abs(a - b).max() <= 1e-12 * np.abs(a).max()
