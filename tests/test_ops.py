"""Tests for the TPU-native executor ops: bucketed leaf-panel near
field (ops/near_panel.py) and scatter-free gather-sum reductions
(ops/bucket_sum.py), including the Pallas kernel in interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import FMMConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel
from fmm_bem_tpu.kernels.stokes_bem import StokesBEMKernel
from fmm_bem_tpu.ops.bucket_sum import build_bucket_sum, bucket_sum_apply


def test_bucket_sum_matches_segment_sum():
    rng = np.random.default_rng(0)
    for nrows, P in ((7, 40), (100, 1000), (3, 3), (50, 0)):
        targets = rng.integers(0, nrows + 2, P)  # some ids out of range
        x = rng.standard_normal((P, 5))
        plan = build_bucket_sum(targets, P, nrows)
        got = np.asarray(bucket_sum_apply(plan.device(), jnp.asarray(x)))
        ref = np.zeros((nrows, 5))
        for t, row in zip(targets, x):
            if t < nrows:
                ref[t] += row
        assert got.shape == (nrows, 5)
        assert np.allclose(got, ref, atol=1e-12), (nrows, P)


def _panel_plans(kernel_factory, seed=0):
    tris = unit_sphere(3)
    fields = make_panels(tris, K=3)
    n = len(tris)
    cfg_panel = FMMConfig(ncrit=16, dtype="float64", max_p=6)
    cfg_coo = FMMConfig(ncrit=16, dtype="float64", max_p=6, near_panel=False)
    pa = FmmPlan(kernel_factory(), fields, cfg_panel)
    pb = FmmPlan(kernel_factory(), fields, cfg_coo)
    return pa, pb, n


def test_near_panels_match_coo_laplace():
    pa, pb, n = _panel_plans(lambda: LaplaceBEMKernel(K=3))
    q = np.random.default_rng(1).standard_normal(n)
    for p in (3, 5):
        oa = np.asarray(pa.apply(q, p=p))
        ob = np.asarray(pb.apply(q, p=p))
        assert np.allclose(oa, ob, atol=1e-11)
    fa = np.asarray(pa.apply_flipped_bc(q, p=5))
    fb = np.asarray(pb.apply_flipped_bc(q, p=5))
    assert np.allclose(fa, fb, atol=1e-11)


def test_near_panels_match_coo_stokes():
    pa, pb, n = _panel_plans(lambda: StokesBEMKernel(K=4, fine_K=17, mu=1e-3))
    q = np.random.default_rng(2).standard_normal((n, 3))
    oa = np.asarray(pa.apply(q, p=5))
    ob = np.asarray(pb.apply(q, p=5))
    scale = np.abs(ob).max()
    assert np.allclose(oa, ob, atol=1e-9 * scale)


def test_linear_tables_match_runtime_ops():
    """The precomputed P2M/L2P linear tables must reproduce the kernel
    ops exactly (they are just the frozen linear maps)."""
    tris = unit_sphere(3)
    fields = make_panels(tris, K=3)
    n = len(tris)
    q = np.random.default_rng(3).standard_normal(n)
    # max_p=6: the default 16 precomputes f64 tables an order of
    # magnitude larger than the p=5 comparison ever reads (this test
    # was 68 s of pure table build)
    pa = FmmPlan(
        LaplaceBEMKernel(K=3), fields,
        FMMConfig(ncrit=16, dtype="float64", max_p=6),
    )
    kb = LaplaceBEMKernel(K=3)
    kb.linear_p2m = False
    if hasattr(type(kb), "l2p_table"):
        # instance-level shadow so the plan skips the table path
        pb = FmmPlan(
            kb, fields,
            FMMConfig(ncrit=16, dtype="float64", max_p=6,
                      near_panel=False),
        )
        pb_aux = pb.variant_aux(5)
        assert "p2m_tab" not in pb_aux
    oa = np.asarray(pa.apply(q, p=5))
    ob = np.asarray(pb.apply(q, p=5))
    assert np.allclose(oa, ob, atol=1e-11)


def test_panel_pallas_interpret_matches_einsum():
    """The Pallas near-panel kernel (run in interpreter mode on CPU)
    computes the same contraction as the XLA einsum path."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fmm_bem_tpu.ops import near_panel as npnl

    rng = np.random.default_rng(4)
    nl_b, KTr, L = 16, 8, 256
    A = jnp.asarray(rng.standard_normal((nl_b, KTr, L)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((nl_b, L)), jnp.float32)

    ref = npnl._contract_einsum(A, x)

    bl = npnl.LEAF_TILE

    def kern(a_ref, x_ref, o_ref):
        o_ref[:] = jnp.sum(a_ref[:] * x_ref[:][:, None, :], axis=2)

    got = pl.pallas_call(
        kern,
        grid=(nl_b // bl,),
        in_specs=[
            pl.BlockSpec((bl, KTr, L), lambda i: (i, 0, 0)),
            pl.BlockSpec((bl, L), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bl, KTr), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nl_b, KTr), A.dtype),
        interpret=True,
    )(A, x)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_device_near_assembly_chunked_matches_one_shot():
    """The row-chunked device assembly (large-N path: the one-shot
    quadrature-block temp would OOM at 524k panels) must produce
    exactly the same panels as the one-shot path."""
    from fmm_bem_tpu.ops import near_panel as npnl

    tris = unit_sphere(3)
    fields = make_panels(tris, K=3)
    # f32 on CPU so the device-assembly path is exercised
    cfg = FMMConfig(ncrit=16, dtype="float32", max_p=6)
    pa = FmmPlan(LaplaceBEMKernel(K=3), fields, cfg)
    assert getattr(pa, "_device_near", False), "device path not active"
    dev_one, meta_one = pa.near_panels()
    A_one = np.asarray(dev_one["A"])

    old = npnl.ONE_SHOT_LIMIT
    npnl.ONE_SHOT_LIMIT = 1  # force chunked assembly
    try:
        pb = FmmPlan(LaplaceBEMKernel(K=3), fields, cfg)
        dev_ch, meta_ch = pb.near_panels()
    finally:
        npnl.ONE_SHOT_LIMIT = old
    A_ch = np.asarray(dev_ch["A"])
    assert A_one.shape == A_ch.shape
    assert np.array_equal(
        np.asarray(dev_one["pidx"]), np.asarray(dev_ch["pidx"])
    )
    assert np.array_equal(
        np.asarray(dev_one["chunk_tgt"]), np.asarray(dev_ch["chunk_tgt"])
    )
    scale = np.abs(A_one).max()
    assert np.abs(A_one - A_ch).max() <= 1e-6 * scale
