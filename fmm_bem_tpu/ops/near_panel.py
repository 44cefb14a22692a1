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
):
    """Assemble bucketed leaf panels from COO near-field entries.

    Parameters
    ----------
    pair_src_slot / pair_tgt_slot : leaf-slot ids per near leaf pair.
    rows / cols : Morton body indices per entry (target, source).
    vals : [nnz] scalar or [nnz, rdim, cdim] matrix entry values,
        already BC-selected for the operator variant.
    src_side / tgt_side : plan _TreeSide objects (leaf tiles).
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
    row_ptr = np.searchsorted(ts, np.arange(nl_t + 1))
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
    entry_key = t_slot[rows].astype(np.int64) * mult + s_slot[cols]
    pidx_e = np.searchsorted(pair_key, entry_key)

    blocks = np.zeros((npairs, KTr, KSc), dtype)
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
        nl_src = len(src_side.leaf_ids)
        pidx = np.full((nl_b, m_b), nl_src, np.int32)
        for k, l in enumerate(sel):
            p0, p1 = row_ptr[l], row_ptr[l + 1]
            m = p1 - p0
            A[k, :, : m * KSc] = (
                blocks[p0:p1].transpose(1, 0, 2).reshape(KTr, m * KSc)
            )
            pidx[k, :m] = ss[p0:p1]
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
    for (A_h, _), A, pidx in zip(
        meta.buckets, panels_dev["A"], panels_dev["pidx"]
    ):
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
