"""Point-kernel P2P as one fused Pallas kernel (super-block layout).

The chunked-vmap P2P pass materialises every [K, K] pair plane in HBM
(npairs * K^2 floats per intermediate), which held the 1e6-point direct
pass at ~13% of VPU peak (PERF.md round 4).  This kernel keeps the
whole pair computation in VMEM:

- target leaves are grouped into SUPER-BLOCKS of ``sb`` leaves; each
  super-block's result tile ([sb, 4, K]) and its compacted source-tile
  set ([ns_pad, 4, K] — near-field sources are Morton-local, so the
  union of a super-block's source leaves is small) live in VMEM for
  the whole block;
- the grid is (num_superblocks, max_chunks); each step contracts one
  target leaf against m0 source tiles gathered from the VMEM stage by
  SMEM indices (the proven near-field-kernel pattern);
- charges ride the xyz tiles as a packed [nl+1, 4, K] array rebuilt
  per matvec (xyz part is plan-constant); the dummy tile sits at a
  far-away sentinel position with zero charge.

Laplace-specific math (pot + difference-form force, matching
kernels/laplace.p2p exactly — LaplaceSpherical.hpp:153-162); other
point kernels keep the vmap path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


#: dummy source tiles sit here: far enough that inv_r underflows to a
#: harmless tiny value even against real targets, with q = 0 anyway
SENTINEL = 1e15


def build_p2p_superblocks(sslot, tslot, nl_s, nl_t, m0=8, sb=256,
                          ns_cap=1536, nj_cap=256):
    """Host-side chunk + super-block structures.

    Super-blocks are formed GREEDILY over the target-leaf order: a
    block closes when it reaches ``sb`` leaves or its source-leaf
    union would exceed ``ns_cap`` — Morton order is spatially local
    for volume point clouds, but surface meshes jump across the
    z-curve, and an uncapped fixed-stride block at 524k panels pulled
    a 70%-of-all-leaves union (a 50 MB VMEM stage that killed the
    compile).

    Returns dict of numpy arrays:
      loc_src  [nsb, ns_pad]  global source-leaf id per local slot
                              (dummy slots -> nl_s, the sentinel tile)
      loc_tgt  [nsb, sb]      global target-leaf id (dummy -> nl_t)
      row_of_leaf [nl_t]      flattened output row of each leaf
      cmeta    [nsb, nj8*8, m0+1]  chunk metadata (see below)
    """
    sslot = np.asarray(sslot)
    tslot = np.asarray(tslot)
    order = np.lexsort((sslot, tslot))
    ss, ts = sslot[order], tslot[order]
    row_ptr = np.searchsorted(ts, np.arange(nl_t + 1))
    m_per = np.diff(row_ptr)
    nchunk = -(-m_per // m0)

    # per-leaf chunk expansion (global)
    C = int(nchunk.sum())
    l_of_c = np.repeat(np.arange(nl_t), nchunk)
    cum = np.concatenate([[0], np.cumsum(nchunk)])
    j_of_c = np.arange(C) - cum[l_of_c]
    starts = row_ptr[l_of_c] + j_of_c * m0
    counts = np.minimum(row_ptr[l_of_c + 1] - starts, m0)
    k = np.arange(m0)
    pid = starts[:, None] + k[None, :]
    valid = k[None, :] < counts[:, None]
    src_g = np.where(
        valid, ss[np.clip(pid, 0, max(len(ss) - 1, 0))], nl_s
    ).astype(np.int64)

    # greedy leaf-contiguous blocks under three caps: target count,
    # source-union size (VMEM stage), and CHUNK count — the grid is
    # rectangular over (block, chunk-step), so uneven per-block chunk
    # counts turn straight into padded (skipped but scheduled) steps
    blocks = []
    lo = 0
    union = set()
    cur_chunks = 0
    for l in range(nl_t):
        srcs_l = set(ss[row_ptr[l]: row_ptr[l + 1]].tolist())
        ch_l = int(nchunk[l])
        if l > lo and (
            len(union | srcs_l) > ns_cap
            or l - lo >= sb
            or cur_chunks + ch_l > nj_cap
        ):
            blocks.append((lo, l))
            lo, union, cur_chunks = l, set(srcs_l), ch_l
        else:
            union |= srcs_l
            cur_chunks += ch_l
    blocks.append((lo, nl_t))
    nsb = len(blocks)
    sb = max(hi - lo for lo, hi in blocks)
    sb = -(-sb // 8) * 8

    sb_of_l = np.zeros(nl_t, np.int64)
    for i, (lo, hi) in enumerate(blocks):
        sb_of_l[lo:hi] = i
    sb_of_c = sb_of_l[l_of_c]
    nj = int(np.bincount(sb_of_c, minlength=nsb).max()) if C else 1

    ns_pad = 8
    loc_lists = []
    for i, (lo, hi) in enumerate(blocks):
        sel = np.nonzero(sb_of_c == i)[0]
        uniq = np.unique(src_g[sel])
        uniq = uniq[uniq != nl_s]
        loc_lists.append(uniq)
        ns_pad = max(ns_pad, len(uniq) + 1)
    ns_pad = -(-ns_pad // 8) * 8

    loc_tgt = np.full((nsb, sb), nl_t, np.int32)
    row_of_leaf = np.zeros(nl_t, np.int32)
    for i, (lo, hi) in enumerate(blocks):
        loc_tgt[i, : hi - lo] = np.arange(lo, hi, dtype=np.int32)
        row_of_leaf[lo:hi] = i * sb + np.arange(hi - lo)

    # 8 chunks per grid step: Mosaic SMEM blocks need their
    # second-to-last dim divisible by 8, and the batching amortises
    # per-step grid overhead 8x.  Chunk metadata packs [m0 local src
    # slots, local target] per row so ONE SMEM input carries it all.
    CB = 8
    nj8 = max(-(-nj // CB), 1)
    nj_pad = nj8 * CB
    loc_src = np.full((nsb, ns_pad), nl_s, np.int32)
    cmeta = np.full((nsb, nj_pad, m0 + 1), ns_pad - 1, np.int32)
    cmeta[:, :, m0] = sb  # dummy chunks skip via ct == sb
    for i, (lo, hi) in enumerate(blocks):
        uniq = loc_lists[i]
        loc_src[i, : len(uniq)] = uniq
        # global -> local map (dummy nl_s -> last slot, which holds the
        # sentinel tile because loc_src is prefilled with nl_s)
        g2l = {g: li for li, g in enumerate(uniq)}
        sel = np.nonzero(sb_of_c == i)[0]
        for jj, c in enumerate(sel):
            cmeta[i, jj, m0] = l_of_c[c] - lo
            for kk in range(m0):
                g = src_g[c, kk]
                if g != nl_s:
                    cmeta[i, jj, kk] = g2l[g]
    return {
        "loc_src": loc_src,
        "loc_tgt": loc_tgt,
        "row_of_leaf": row_of_leaf,
        "cmeta": cmeta,
        "nsb": nsb,
        "nj8": nj8,
        "ns_pad": ns_pad,
        "sb": sb,
        "m0": m0,
        "cb": CB,
        "npairs": int(len(ss)),
    }


def pack_xyzq(xyz_tiles, q_tiles):
    """[nl, 3, K] xyz + [nl, 1, K] charges -> [nl+1, 4, K] with the
    sentinel dummy tile appended."""
    nl, _, K = xyz_tiles.shape
    body = jnp.concatenate([xyz_tiles, q_tiles], axis=1)
    dummy = jnp.concatenate(
        [
            jnp.full((1, 3, K), SENTINEL, body.dtype),
            jnp.zeros((1, 1, K), body.dtype),
        ],
        axis=1,
    )
    return jnp.concatenate([body, dummy], axis=0)


def p2p_superblock_laplace(xyzq, meta_dev, meta, eps2, interpret=False):
    """Run the fused P2P kernel.  Returns [nsb*sb, 4, K] leaf result
    tiles (pot, fx, fy, fz; padded target leaves hold garbage rows the
    caller masks)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nsb, nj8 = meta["nsb"], meta["nj8"]
    sb, m0, ns_pad = meta["sb"], meta["m0"], meta["ns_pad"]
    CB = meta["cb"]
    K = xyzq.shape[2]
    dt = xyzq.dtype

    src_stage = xyzq[meta_dev["loc_src"]]  # [nsb, ns_pad, 4, K]
    # per-block target gather (blocks are leaf-contiguous but
    # variable-length; dummies hit the sentinel tile)
    tgt_stage = xyzq[meta_dev["loc_tgt"]]  # [nsb, sb, 4, K]

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
                # target components as [K, 1] columns (one transpose
                # per chunk; sources stay row-major)
                tc = [t[d: d + 1, :].reshape(K, 1) for d in range(3)]
                acc = jnp.zeros((4, K), dt)
                for kk in range(m0):
                    s = src_ref[0, pl.ds(cm_ref[0, c8, kk], 1)][0]
                    dd = [s[d: d + 1, :] - tc[d] for d in range(3)]
                    r2 = dd[0] * dd[0] + dd[1] * dd[1] + dd[2] * dd[2]
                    inv_r2 = jnp.where(
                        r2 < eps2, 0.0, 1.0 / jnp.maximum(r2, eps2)
                    )
                    inv_r = jnp.sqrt(inv_r2)
                    q = s[3: 4, :]  # [1, K] source charges
                    pot = jnp.sum(q * inv_r, axis=1)  # [K]
                    w = q * inv_r * inv_r2
                    f = [jnp.sum(w * dd[d], axis=1) for d in range(3)]
                    acc = acc + jnp.stack([pot] + f, axis=0)
                o_ref[0, pl.ds(ct, 1)] += acc[None]

    out = pl.pallas_call(
        kern,
        grid=(nsb, nj8),
        in_specs=[
            pl.BlockSpec((1, CB, m0 + 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ns_pad, 4, K), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sb, 4, K), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, sb, 4, K), lambda i, j: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nsb, sb, 4, K), dt),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * meta["npairs"] * K * K * 12),
            bytes_accessed=int(src_stage.size + tgt_stage.size) * 4,
            transcendentals=int(meta["npairs"] * K * K),
        ),
        interpret=interpret,
    )(meta_dev["cmeta"], src_stage, tgt_stage)
    return out.reshape(nsb * sb, 4, K)
