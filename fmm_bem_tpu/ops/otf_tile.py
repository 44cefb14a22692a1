"""On-the-fly BEM near field as one fused Pallas kernel.

The chunked-vmap OTF product (executor/plan._near_otf_core's lax.map
path) materialises per-chunk [ch, KT, KS, K, 3] quadrature geometry in
HBM — ~150 kB per pair per matvec, which held the 524k-panel OTF
matvec at 340 ms.  This kernel computes each pair block entirely in
VMEM with the super-block layout of ops/p2p_tile.py (same chunk
metadata builder): per chunk, K-point quadrature planes against the
target leaf, BC-selected, contracted with the charges on the spot.

Laplace/Yukawa BEM math, matching kernels/laplace_bem.near_block_device
exactly (the correction deltas are computed against that function, so
the fused path must reproduce it bit-for-bit up to f32 reassociation).

Packed source-tile layout [nl+1, CS+1, K] (component-major, K panels
on lanes):
  rows 0..3K-1   quadrature points, dim-major (qp_d[k] at row d*K+k)
  rows 3K..4K-1  quadrature weights * area (zero for padded panels)
  rows 4K..4K+2  panel normal
  row  CS        charges (rebuilt per matvec)
Target tiles [nl+1, 4, K]: xyz rows + BC flag row.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from fmm_bem_tpu.ops.p2p_tile import SENTINEL


def pack_otf_src(fields_tiled, mask, KQ):
    """Static source components [nl+1, CS, K] from leaf-tiled panel
    fields ({'xyz','qp_off','qw','area','normal'} each [nl, K, ...])."""
    xyz = np.asarray(fields_tiled["xyz"])          # [nl, K, 3]
    qp = np.asarray(fields_tiled["qp_off"]) + xyz[:, :, None, :]
    w = np.asarray(fields_tiled["qw"]) * np.asarray(
        fields_tiled["area"]
    )[..., None]                                    # [nl, K, KQ]
    nrm = np.asarray(fields_tiled["normal"])        # [nl, K, 3]
    mask = np.asarray(mask)                         # [nl, K]
    nl, K = mask.shape
    CS = 4 * KQ + 3
    out = np.zeros((nl + 1, CS, K), np.float32)
    for d in range(3):
        for k in range(KQ):
            out[:nl, d * KQ + k, :] = qp[:, :, k, d]
    for k in range(KQ):
        out[:nl, 3 * KQ + k, :] = np.where(mask, w[:, :, k], 0.0)
    for d in range(3):
        out[:nl, 4 * KQ + d, :] = nrm[:, :, d]
    # dummy/padded panels: quadrature points at the sentinel (far away)
    # with zero weight — contributions vanish through w
    out[nl, : 3 * KQ, :] = SENTINEL
    pad3 = ~mask
    for d in range(3):
        for k in range(KQ):
            out[:nl, d * KQ + k, :] = np.where(
                pad3, SENTINEL, out[:nl, d * KQ + k, :]
            )
    return out


def pack_otf_tgt(xyz_tiled, bc_tiled, mask):
    """Target components [nl+1, 4, K]: xyz rows + BC flag row."""
    xyz = np.asarray(xyz_tiled)
    bc = np.asarray(bc_tiled)
    mask = np.asarray(mask)
    nl, K = mask.shape
    out = np.zeros((nl + 1, 4, K), np.float32)
    for d in range(3):
        out[:nl, d, :] = np.where(mask, xyz[:, :, d], SENTINEL)
    out[:nl, 3, :] = bc
    out[nl, :3, :] = SENTINEL
    return out


def otf_superblock_bem(src_stage_tab, q_tiles, tgt_tab, meta_dev, meta,
                       KQ, kappa=0.0, interpret=False):
    """Fused OTF near product.

    src_stage_tab : [nl_s+1, CS, K] static source components.
    q_tiles : [nl_s+1, 1, K] per-matvec charges (padded rows zero).
    tgt_tab : [nl_t+1, 4, K] target components (BC per variant).
    Returns [nsb*sb, K] leaf potential tiles.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nsb, nj8 = meta["nsb"], meta["nj8"]
    sb, m0, ns_pad = meta["sb"], meta["m0"], meta["ns_pad"]
    CB = meta["cb"]
    K = src_stage_tab.shape[2]
    CS = src_stage_tab.shape[1]
    dt = q_tiles.dtype

    xyzq = jnp.concatenate([src_stage_tab, q_tiles], axis=1)

    def kern(cm_ref, src_ref, tgt_ref, o_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        for c8 in range(CB):
            ct = cm_ref[0, c8, m0]

            @pl.when(ct < sb)
            def _(c8=c8, ct=ct):
                t = tgt_ref[0, pl.ds(ct, 1)][0]  # [4, K]
                tc = [t[d: d + 1, :].reshape(K, 1) for d in range(3)]
                bc_col = t[3: 4, :].reshape(K, 1)
                is_g = bc_col == 0.0

                # fori over the m0 source tiles: a fully unrolled
                # CB*m0*KQ plane pipeline exceeded the remote Mosaic
                # compile at 524k; the loop body is ONE tile's math
                def tile_body(kk, acc):
                    s = src_ref[0, pl.ds(cm_ref[0, c8, kk], 1)][0]
                    G = jnp.zeros((K, K), dt)
                    dG = jnp.zeros((K, K), dt)
                    nr = [s[4 * KQ + d: 4 * KQ + d + 1, :]
                          for d in range(3)]
                    for k in range(KQ):
                        dd = [
                            s[d * KQ + k: d * KQ + k + 1, :] - tc[d]
                            for d in range(3)
                        ]
                        r2 = (dd[0] * dd[0] + dd[1] * dd[1]
                              + dd[2] * dd[2])
                        r2 = jnp.maximum(r2, 1e-30)
                        inv_r = jax.lax.rsqrt(r2)
                        w = s[3 * KQ + k: 3 * KQ + k + 1, :]
                        # dn = -(t - qp).n = (qp - t).n = dd.n
                        dn = (dd[0] * nr[0] + dd[1] * nr[1]
                              + dd[2] * nr[2])
                        if kappa:
                            scr = jnp.exp(-kappa / inv_r)
                            G = G + w * scr * inv_r
                            dG = dG + (
                                w * dn * (kappa / inv_r + 1.0)
                                * scr * inv_r * inv_r * inv_r
                            )
                        else:
                            G = G + w * inv_r
                            dG = dG + w * dn * inv_r * inv_r * inv_r
                    blk = jnp.where(is_g, G, dG)
                    q = s[CS: CS + 1, :]
                    return acc + jnp.sum(blk * q, axis=1)[None, :]

                acc = jax.lax.fori_loop(
                    0, m0, tile_body, jnp.zeros((1, K), dt)
                )
                o_ref[0, pl.ds(ct, 1)] += acc

    # segment the block staging: the per-block source unions overlap
    # (Morton halos), so staging ALL blocks at once materialises
    # 5-15x the leaf tables — 2.7 GB at 2.1M panels.  Each segment
    # stages ~256 MB, runs its grid slice, and the transient is freed
    # before the next (one executable, reused per segment).
    row_bytes = ns_pad * (CS + 1) * K * 4
    SEG = max(8, (256 << 20) // max(row_bytes, 1))
    nseg = -(-nsb // SEG)

    def run_segment(cmeta_s, src_stage_s, tgt_stage_s):
        return pl.pallas_call(
            kern,
            grid=(SEG, nj8),
            in_specs=[
                pl.BlockSpec((1, CB, m0 + 1), lambda i, j: (i, j, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, ns_pad, CS + 1, K),
                             lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sb, 4, K), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, sb, K), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((SEG, sb, K), dt),
            cost_estimate=pl.CostEstimate(
                flops=int(2 * meta["npairs"] * K * K * KQ * 10 / nseg),
                bytes_accessed=int(SEG * row_bytes),
                transcendentals=int(
                    meta["npairs"] * K * K * KQ / nseg
                ),
            ),
            interpret=interpret,
        )(cmeta_s, src_stage_s, tgt_stage_s)

    loc_src = meta_dev["loc_src"]
    loc_tgt = meta_dev["loc_tgt"]
    cmeta = meta_dev["cmeta"]
    pad_b = nseg * SEG - nsb
    if pad_b:
        loc_src = jnp.concatenate(
            [loc_src,
             jnp.full((pad_b,) + loc_src.shape[1:],
                      src_stage_tab.shape[0] - 1, loc_src.dtype)]
        )
        loc_tgt = jnp.concatenate(
            [loc_tgt,
             jnp.full((pad_b,) + loc_tgt.shape[1:],
                      tgt_tab.shape[0] - 1, loc_tgt.dtype)]
        )
        dummy_meta = jnp.full(
            (pad_b,) + cmeta.shape[1:], 0, cmeta.dtype
        ).at[:, :, m0].set(sb)  # ct == sb -> skipped
        cmeta = jnp.concatenate([cmeta, dummy_meta])
    outs = []
    for s0 in range(0, nseg * SEG, SEG):
        src_stage = xyzq[loc_src[s0: s0 + SEG]]
        tgt_stage = tgt_tab[loc_tgt[s0: s0 + SEG]]
        outs.append(
            run_segment(cmeta[s0: s0 + SEG], src_stage, tgt_stage)
        )
    out = jnp.concatenate(outs, axis=0)[:nsb]
    return out.reshape(nsb * sb, K)
