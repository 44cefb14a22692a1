"""Near-field leaf-panel matvec (the TPU-native EvalInteractionLazySparse).

The reference caches the singular/near-singular panel integrals in a CSR
matrix and replays ``results += A @ charges`` every GMRES iteration
(EvalInteractionLazySparse.hpp:112,134-150).  A COO/CSR replay is
pathological on TPU — per-entry gather + scatter-add runs at scalar
speed (measured ~40x slower than streaming the same bytes densely).

TPU-native layout instead: for every *target leaf*, concatenate the
dense interaction blocks against each of its near-field source leaves
into one row-panel

    A_leaf  [KT*rdim,  m * KS*cdim]          (m = #near source leaves)

so a leaf's entire near field is ONE dense matrix-vector product whose
contraction axis is the hardware lane dimension (hundreds to thousands
wide — perfectly tiled), not the 30-wide unaligned axis a per-pair
block layout would give.  Leaves are bucketed by m to bound padding
waste; each bucket is evaluated by a Pallas kernel streaming panel
tiles HBM->VMEM with a broadcast-multiply + lane reduction (the matvec
is bandwidth-bound: the panel bytes are touched exactly once).

Supports scalar entries (Laplace/Yukawa BEM: rdim = cdim = 1) and
matrix entries (Stokes BEM: 3x3 blocks) by expanding to DOF-level
rows/columns.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

#: bucket upper edges for #near-source-leaves per target leaf
DEFAULT_EDGES = (4, 8, 16, 24, 32, 48, 64, 96, 160, 256)
#: leaves per Pallas grid step
LEAF_TILE = 8


@dataclasses.dataclass
class NearPanels:
    """Host-side panel structure; ``device()`` uploads the arrays."""

    #: per bucket: (A [nl_b, KTr, Lb], pair_idx [nl_b, m_b])
    buckets: list
    #: concat-row -> leaf-slot inverse permutation [nl_t]
    inv_order: np.ndarray
    npairs: int
    rdim: int
    cdim: int
    KT: int
    KS: int

    def device(self, dtype):
        dt = jnp.dtype(dtype)
        return {
            "A": tuple(jnp.asarray(A, dt) for A, _ in self.buckets),
            "pidx": tuple(jnp.asarray(pi) for _, pi in self.buckets),
            "inv_order": jnp.asarray(self.inv_order),
        }

    @property
    def nbytes(self):
        return sum(A.nbytes for A, _ in self.buckets)


def build_near_panels(
    pair_src_slot,
    pair_tgt_slot,
    rows,
    cols,
    vals,
    src_side,
    tgt_side,
    nl_t,
    edges=DEFAULT_EDGES,
    dtype=np.float32,
    tgt_slot_local=None,
    src_slot_local=None,
    nl_src_local=None,
):
    """Assemble bucketed leaf panels from COO near-field entries.

    Parameters
    ----------
    pair_src_slot / pair_tgt_slot : leaf-slot ids per near leaf pair.
    rows / cols : Morton body indices per entry (target, source).
    vals : [nnz] scalar or [nnz, rdim, cdim] matrix entry values,
        already BC-selected for the operator variant.
    src_side / tgt_side : plan _TreeSide objects (leaf tiles).
    tgt_slot_local / src_slot_local : optional monotone global->local
        slot maps (LET sharding: bucket rows / charge-table columns are
        indexed in a device-local numbering while entry bookkeeping
        stays global).  ``nl_t`` then counts LOCAL target leaves and
        ``nl_src_local`` sizes the local charge table.
    """
    vals = np.asarray(vals)
    if vals.ndim == 1:
        rdim = cdim = 1
        vals3 = vals[:, None, None]
    else:
        rdim, cdim = vals.shape[1], vals.shape[2]
        vals3 = vals
    KT, KS = tgt_side.leaf_pad, src_side.leaf_pad
    KTr, KSc = KT * rdim, KS * cdim

    # sort pairs by (target slot, source slot): target-contiguous panels
    # + strictly increasing pair keys for the entry searchsorted below
    pair_tgt_slot = np.asarray(pair_tgt_slot)
    pair_src_slot = np.asarray(pair_src_slot)
    po = np.lexsort((pair_src_slot, pair_tgt_slot))
    ts = pair_tgt_slot[po]
    ss = pair_src_slot[po]
    npairs = len(ts)
    # bucket rows by the (local) target index; a monotone local map
    # preserves the sort order above
    ts_b = ts if tgt_slot_local is None else tgt_slot_local[ts]
    ss_l = ss if src_slot_local is None else src_slot_local[ss]
    row_ptr = np.searchsorted(ts_b, np.arange(nl_t + 1))
    m_per = np.diff(row_ptr)

    # entry -> (pair, in-block position)
    st_leaf = src_side.tree.body_leaf
    tt_leaf = tgt_side.tree.body_leaf
    s_slot = src_side.box_to_slot[st_leaf]
    t_slot = tgt_side.box_to_slot[tt_leaf]
    s_pos = np.arange(src_side.tree.num_bodies) - \
        src_side.tree.box_body_start[st_leaf]
    t_pos = np.arange(tgt_side.tree.num_bodies) - \
        tgt_side.tree.box_body_start[tt_leaf]
    mult = int(len(src_side.leaf_ids)) + 1
    pair_key = ts.astype(np.int64) * mult + ss

    blocks = np.zeros((npairs, KTr, KSc), dtype)
    from fmm_bem_tpu import native

    filled = np.dtype(dtype) == np.float32 and native.panel_fill(
        rows, cols, np.ascontiguousarray(vals3, np.float32),
        t_slot, s_slot, t_pos, s_pos, pair_key, mult,
        rdim, cdim, KT, KS, blocks,
    )
    if not filled:
        # numpy fallback (f64 accuracy runs / missing .so) — the
        # searchsorted + fancy scatter cost ~250s at 1e8 entries, which
        # is why the f32 path is native
        entry_key = t_slot[rows].astype(np.int64) * mult + s_slot[cols]
        pidx_e = np.searchsorted(pair_key, entry_key)
        rr = t_pos[rows] * rdim
        cc = s_pos[cols] * cdim
        for i in range(rdim):
            for j in range(cdim):
                blocks[pidx_e, rr + i, cc + j] = vals3[:, i, j]

    # bucket target leaves by m
    edges = [e for e in edges if e <= max(int(m_per.max(initial=1)), 1)]
    if not edges or edges[-1] < m_per.max(initial=0):
        edges = list(edges) + [int(m_per.max(initial=1))]
    buckets, order = [], []
    lo = 0
    for hi in edges:
        sel = np.where((m_per > lo) & (m_per <= hi))[0]
        lo = hi
        if len(sel) == 0:
            continue
        m_b = hi
        nl_b = -(-len(sel) // LEAF_TILE) * LEAF_TILE  # pad to tile
        # pad the lane dim to the f32 lane tile so Mosaic never relayouts
        Lb = -(-m_b * KSc // 128) * 128
        A = np.zeros((nl_b, KTr, Lb), dtype)
        # source-leaf slot per panel column group; dummy = nl_src (a
        # zero charge row appended by panel_matvec)
        nl_src = (
            len(src_side.leaf_ids) if nl_src_local is None else nl_src_local
        )
        pidx = np.full((nl_b, m_b), nl_src, np.int32)
        for k, l in enumerate(sel):
            p0, p1 = row_ptr[l], row_ptr[l + 1]
            m = p1 - p0
            A[k, :, : m * KSc] = (
                blocks[p0:p1].transpose(1, 0, 2).reshape(KTr, m * KSc)
            )
            pidx[k, :m] = ss_l[p0:p1]
        buckets.append((A, pidx))
        order.append(sel)

    if order:
        order = np.concatenate(
            [
                np.concatenate([sel, np.full(len(b[0]) - len(sel), nl_t)])
                for sel, b in zip(order, buckets)
            ]
        )
    else:
        order = np.zeros(0, np.int64)
    # inverse: leaf slot -> row in the concatenated bucket output;
    # leaves with no near pairs point at the appended zero row
    inv_order = np.full(nl_t, len(order), np.int32)
    valid = order < nl_t
    inv_order[order[valid]] = np.arange(len(order), dtype=np.int32)[valid]
    return NearPanels(
        buckets=buckets,
        inv_order=inv_order,
        npairs=npairs,
        rdim=rdim,
        cdim=cdim,
        KT=KT,
        KS=KS,
    )


def build_near_panels_on_device(
    pair_src_slot,
    pair_tgt_slot,
    src_side,
    tgt_side,
    nl_t,
    blocks_fn,
    corr=None,
    rdim=1,
    cdim=1,
    edges=DEFAULT_EDGES,
    dtype=jnp.float32,
    jit_cache=None,
    tgt_slot_local=None,
    src_slot_local=None,
    nl_src_local=None,
):
    """Assemble bucketed leaf panels with the interaction blocks
    computed ON the accelerator.

    The regular K-point quadrature entries (the overwhelming bulk) are
    smooth closed-form evaluations — ideal device work — so only the
    near-singular corrections (``corr``) are computed on the host
    (branchy semi-analytical integrals, a few % of entries).  This
    replaces a ~1e8-entry host COO expansion + quadrature loop that
    took minutes per plan on small hosts.

    Parameters
    ----------
    blocks_fn : callable ``(ss, ts) -> [npairs, KT*rdim, KS*cdim]``
        device blocks for the given (src leaf slot, tgt leaf slot)
        pair arrays (the plan wraps the kernel's ``near_block_device``).
    corr : optional ``(rows, cols, vals)`` host COO of near-singular
        entries (Morton body ids; vals already BC-selected,
        [nnz] or [nnz, rdim, cdim]) overwriting the quadrature values.
    Returns (device_dict, NearPanels meta).
    """
    import jax

    KT, KS = tgt_side.leaf_pad, src_side.leaf_pad
    KTr, KSc = KT * rdim, KS * cdim
    pair_tgt_slot = np.asarray(pair_tgt_slot)
    pair_src_slot = np.asarray(pair_src_slot)
    po = np.lexsort((pair_src_slot, pair_tgt_slot))
    ts = pair_tgt_slot[po]
    ss = pair_src_slot[po]
    npairs = len(ts)
    # LET sharding: bucket by local target index, column-index the local
    # charge table (see build_near_panels); entry keys stay global
    ts_b = ts if tgt_slot_local is None else tgt_slot_local[ts]
    ss_l = ss if src_slot_local is None else src_slot_local[ss]
    row_ptr = np.searchsorted(ts_b, np.arange(nl_t + 1))
    m_per = np.diff(row_ptr)
    nl_src = (
        len(src_side.leaf_ids) if nl_src_local is None else nl_src_local
    )

    # host: near-singular corrections as FLAT indices into the block
    # array (a 1-D scatter lowers far better than a 3-index one)
    if corr is not None and len(corr[0]):
        rows, cols, vals = corr
        vals = np.asarray(vals)
        vals3 = vals[:, None, None] if vals.ndim == 1 else vals
        s_slot = src_side.box_to_slot[src_side.tree.body_leaf]
        t_slot = tgt_side.box_to_slot[tgt_side.tree.body_leaf]
        s_pos = np.arange(src_side.tree.num_bodies) - \
            src_side.tree.box_body_start[src_side.tree.body_leaf]
        t_pos = np.arange(tgt_side.tree.num_bodies) - \
            tgt_side.tree.box_body_start[tgt_side.tree.body_leaf]
        # GLOBAL slot multiplier: ss and s_slot are global leaf slots
        # even when the charge table is locally renumbered
        mult = int(len(src_side.leaf_ids)) + 1
        pair_key = ts.astype(np.int64) * mult + ss
        entry_key = t_slot[rows].astype(np.int64) * mult + s_slot[cols]
        pidx_e = np.searchsorted(pair_key, entry_key)
        base = pidx_e.astype(np.int64) * KTr * KSc
        rr = (t_pos[rows] * rdim).astype(np.int64)
        cc = (s_pos[cols] * cdim).astype(np.int64)
        idx = (
            base[:, None, None]
            + (rr[:, None] + np.arange(rdim))[:, :, None] * KSc
            + (cc[:, None] + np.arange(cdim))[:, None, :]
        ).reshape(-1)
        corr_idx = idx
        corr_vals = vals3.reshape(-1)
    else:
        corr_idx = np.zeros(0, np.int64)
        corr_vals = np.zeros(0)

    # host: bucket structure
    mmax = int(m_per.max(initial=1))
    edges = [e for e in edges if e <= mmax]
    if not edges or edges[-1] < m_per.max(initial=0):
        edges = list(edges) + [mmax]
    bucket_pair_ids, bucket_slot_ids, order = [], [], []
    lo = 0
    for hi in edges:
        sel = np.where((m_per > lo) & (m_per <= hi))[0]
        lo = hi
        if len(sel) == 0:
            continue
        m_b = hi
        nl_b = -(-len(sel) // LEAF_TILE) * LEAF_TILE
        pair_ids = np.full((nl_b, m_b), npairs, np.int32)
        slot_ids = np.full((nl_b, m_b), nl_src, np.int32)
        for k, l in enumerate(sel):
            p0, p1 = row_ptr[l], row_ptr[l + 1]
            m = p1 - p0
            pair_ids[k, :m] = np.arange(p0, p1, dtype=np.int32)
            slot_ids[k, :m] = ss_l[p0:p1]
        bucket_pair_ids.append(pair_ids)
        bucket_slot_ids.append(slot_ids)
        order.append(sel)

    # device stage 1 (plan-cached jit): quadrature blocks.
    # device stage 2 (jit cached across BC variants via ``jit_cache``):
    # flat correction scatter + bucket gather/transpose/pad.  Eager
    # per-op dispatch over a remote backend costs seconds per op, and a
    # fresh jit per variant would recompile the whole assembly.
    def assemble(blocks, corr_idx_d, corr_vals_d, pair_ids_d):
        flat = blocks.reshape(-1)
        flat = flat.at[corr_idx_d].set(corr_vals_d)
        blocks = flat.reshape(npairs, KTr, KSc)
        blocks_z = jnp.concatenate(
            [blocks, jnp.zeros((1, KTr, KSc), blocks.dtype)], axis=0
        )
        outs = []
        for pair_ids in pair_ids_d:
            m_b = pair_ids.shape[1]
            Lb = -(-m_b * KSc // 128) * 128
            blk = blocks_z[pair_ids]  # [nl_b, m_b, KTr, KSc]
            A = blk.transpose(0, 2, 1, 3).reshape(
                pair_ids.shape[0], KTr, m_b * KSc
            )
            if Lb > m_b * KSc:
                A = jnp.pad(A, ((0, 0), (0, 0), (0, Lb - m_b * KSc)))
            outs.append(A)
        return tuple(outs)

    dt = jnp.dtype(dtype)
    key = ("assemble", npairs, KTr, KSc,
           tuple(pi.shape for pi in bucket_pair_ids), len(corr_idx))
    if jit_cache is None:
        jit_cache = {}
    if key not in jit_cache:
        jit_cache[key] = jax.jit(assemble)
    blocks = blocks_fn(jnp.asarray(ss), jnp.asarray(ts))
    A_dev = jit_cache[key](
        blocks,
        jnp.asarray(corr_idx),
        jnp.asarray(corr_vals, dt),
        tuple(jnp.asarray(pi) for pi in bucket_pair_ids),
    )
    pidx_dev = [jnp.asarray(si) for si in bucket_slot_ids]

    if order:
        order = np.concatenate(
            [
                np.concatenate(
                    [sel, np.full(len(pi) - len(sel), nl_t)]
                )
                for sel, pi in zip(order, bucket_slot_ids)
            ]
        )
    else:
        order = np.zeros(0, np.int64)
    inv_order = np.full(nl_t, len(order), np.int32)
    valid = order < nl_t
    inv_order[order[valid]] = np.arange(len(order), dtype=np.int32)[valid]

    meta = NearPanels(
        buckets=[(None, si) for si in bucket_slot_ids],
        inv_order=inv_order,
        npairs=npairs,
        rdim=rdim,
        cdim=cdim,
        KT=KT,
        KS=KS,
    )
    dev = {
        "A": tuple(A_dev),
        "pidx": tuple(pidx_dev),
        "inv_order": jnp.asarray(inv_order),
    }
    return dev, meta


def _contract_einsum(A, x):
    return jnp.einsum("lts,ls->lt", A, x)


def _contract_pallas(A, x):
    """out[l] = A[l] @ x[l] streamed in LEAF_TILE-leaf tiles."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nl_b, KTr, L = A.shape
    bl = LEAF_TILE
    grid = (nl_b // bl,)

    def kern(a_ref, x_ref, o_ref):
        o_ref[:] = jnp.sum(a_ref[:] * x_ref[:][:, None, :], axis=2)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (bl, KTr, L), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bl, L), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (bl, KTr), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nl_b, KTr), A.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nl_b * KTr * L,
            bytes_accessed=A.size * A.dtype.itemsize,
            transcendentals=0,
        ),
    )(A, x)


def _use_pallas(dtype):
    """Pallas path only on a real TPU backend and in f32 (the TPU
    custom-call has no X64 lowering; f64 runs are CPU accuracy tests)."""
    try:
        return (
            jax.default_backend() == "tpu"
            and jnp.dtype(dtype) == jnp.float32
        )
    except Exception:  # pragma: no cover
        return False


def panel_matvec(panels_dev, meta, ql, use_pallas=None):
    """Near-field product from leaf-tiled charges.

    Parameters
    ----------
    panels_dev : dict from NearPanels.device().
    meta : the NearPanels (static bucket shapes).
    ql : [nl_src, KS*cdim] masked per-source-leaf charge tiles.
    Returns [nl_t_padded_rows, KT*rdim] leaf result tiles gathered back
    to leaf-slot order.
    """
    if use_pallas is None:
        use_pallas = _use_pallas(ql.dtype)
    contract = _contract_pallas if use_pallas else _contract_einsum
    KSc = meta.KS * meta.cdim
    xq = jnp.concatenate([ql, jnp.zeros((1, KSc), ql.dtype)], axis=0)
    outs = []
    for A, pidx in zip(panels_dev["A"], panels_dev["pidx"]):
        m_b = pidx.shape[1]
        xb = xq[pidx].reshape(pidx.shape[0], m_b * KSc)
        Lb = A.shape[2]
        if Lb > m_b * KSc:
            xb = jnp.pad(xb, ((0, 0), (0, Lb - m_b * KSc)))
        outs.append(contract(A, xb))
    if not outs:
        return None
    KTr = meta.KT * meta.rdim
    out = jnp.concatenate(
        outs + [jnp.zeros((1, KTr), ql.dtype)], axis=0
    )
    return out[panels_dev["inv_order"]]
