"""Locally-essential-tree (LET) multi-chip FMM: explicit Morton-range
domain decomposition with shard_map collectives.

The reference parallelises with OpenMP loops over shared-memory lists
(EvalInteractionLazy.hpp:242-300); its TPU-native replacement (SURVEY.md
§5.8) distributes the FMM itself over a device mesh:

ownership
    Bodies are Morton-sorted, so device d owns a contiguous body range
    (= a compact spatial subdomain), aligned to leaf boundaries.  A box
    is OWNED by d when its body range fits inside d's range; boxes that
    span a range boundary are SHARED — they form the small top of the
    tree (O(depth x ndev) boxes) and are replicated on every device.

per-device state (everything sharded, nothing O(N) replicated)
    - its target leaves' near-field panels (bucketed, Pallas-ready)
    - its M2L/M2P pair tiles (assigned by target-box owner)
    - its slice of the body tables (P2M/L2P linear maps, charges)
    - a local box table [shared | own | import | zero | sink] holding
      multipoles/locals for owned boxes, the replicated shared top, and
      the imported halo

one matvec (inside shard_map over the 'sp' mesh axis)
    1. leaf charge tiles of the boundary leaves  -> all_gather  (halo)
    2. local P2M + local M2M (contributions into shared rows)
    3. psum of the shared-M block                               (tiny)
    4. replicated top-of-tree M2M
    5. all_gather of EXPORTED multipoles (the LET halo: only boxes some
       other device's M2L/M2P lists touch — O(boundary), not O(boxes))
    6. local M2L class-tile matmuls + bucketed gather-sum; local near
       field (depends only on step 1, so XLA's latency-hiding scheduler
       overlaps it with the collectives of 3/5)
    7. psum of the shared-L block
    8. replicated shared L2L, then local L2L / L2P / M2P
    Four collectives total, all O(boundary or tree-top); near-field
    panels, M2L tiles and expansions never move between devices.

Use ``LetPlan(plan, ndev)`` on a built FmmPlan, then ``apply(q, p)`` /
``solver_ops(p)``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fmm_bem_tpu.ops.bucket_sum import DEFAULT_EDGES as BS_EDGES


# ----------------------------------------------------------------------
# host-side partition and table construction
# ----------------------------------------------------------------------


def _pad_stack(arrs, fill, dtype=None, min_len=1):
    """Stack per-device 1/2-D arrays padded to a common leading shape."""
    arrs = [np.asarray(a) for a in arrs]
    nd = len(arrs)
    shp = tuple(
        max(min_len if ax == 0 else 0, *(a.shape[ax] for a in arrs))
        for ax in range(arrs[0].ndim)
    )
    dt = dtype or arrs[0].dtype
    out = np.full((nd,) + shp, fill, dt)
    for d, a in enumerate(arrs):
        out[(d,) + tuple(slice(0, s) for s in a.shape)] = a
    return out


@dataclasses.dataclass
class _BucketSumStack:
    """Per-device bucket_sum plans with common shapes (stacked)."""

    idx: list          # per bucket: [ndev, rows_b, m_b]
    inv_order: np.ndarray  # [ndev, nrows]
    nin: int           # dummy index threshold (common across devices)

    def device(self):
        # clamped idx + mask, mirroring ops.bucket_sum (see
        # BucketSum.device for the rationale)
        return {
            "idx": tuple(
                jnp.asarray(np.minimum(i, max(self.nin - 1, 0)))
                for i in self.idx
            ),
            "mask": tuple(
                jnp.asarray((i < self.nin).astype(np.float32))
                for i in self.idx
            ),
            "inv_order": jnp.asarray(self.inv_order),
        }


def _build_bucket_sums(per_dev_targets, nins, nrows, edges=BS_EDGES):
    """build_bucket_sum per device with bucket shapes unified across
    devices so the plans stack into [ndev, ...] arrays."""
    nd = len(per_dev_targets)
    plans = []
    for d in range(nd):
        tg = np.asarray(per_dev_targets[d])
        keep = tg < nrows
        pos = np.arange(len(tg), dtype=np.int64)[keep]
        t = tg[keep]
        order = np.argsort(t, kind="stable")
        t, pos = t[order], pos[order]
        row_ptr = np.searchsorted(t, np.arange(nrows + 1))
        plans.append((pos, row_ptr, np.diff(row_ptr)))
    mmax = max(int(p[2].max(initial=1)) for p in plans)
    es = [e for e in edges if e <= mmax]
    if not es or es[-1] < mmax:
        es = list(es) + [mmax]

    # rows per bucket unified to the max across devices
    rows_per_edge = []
    lo = 0
    for hi in es:
        rows_per_edge.append(
            max(
                1,
                *(
                    int(((p[2] > lo) & (p[2] <= hi)).sum())
                    for p in plans
                ),
            )
        )
        lo = hi

    idx_buckets = [[] for _ in es]
    inv_orders = []
    for d in range(nd):
        pos, row_ptr, m_per = plans[d]
        nin = nins[d] if isinstance(nins, (list, tuple)) else nins
        order_rows = []
        lo = 0
        for bi, hi in enumerate(es):
            sel = np.where((m_per > lo) & (m_per <= hi))[0]
            lo = hi
            rows_b = rows_per_edge[bi]
            idx = np.full((rows_b, hi), nin, np.int32)
            for k, r in enumerate(sel):
                p0, p1 = row_ptr[r], row_ptr[r + 1]
                idx[k, : p1 - p0] = pos[p0:p1]
            idx_buckets[bi].append(idx)
            order_rows.append(
                np.concatenate(
                    [sel, np.full(rows_b - len(sel), nrows, np.int64)]
                )
            )
        order_rows = np.concatenate(order_rows)
        total = len(order_rows)
        inv = np.full(nrows, total, np.int32)  # appended zero row
        valid = order_rows < nrows
        inv[order_rows[valid]] = np.arange(total, dtype=np.int32)[valid]
        inv_orders.append(inv)
    assert not isinstance(nins, (list, tuple)), \
        "stacked bucket plans need a common dummy threshold"
    return _BucketSumStack(
        idx=[np.stack(b) for b in idx_buckets],
        inv_order=np.stack(inv_orders),
        nin=int(nins),
    )


def _bucket_sum_apply(dev, x):
    """Per-device evaluation of a stacked bucket_sum plan (device slice
    already squeezed).  Single flat gather + contiguous reshape-sums —
    see ops/bucket_sum.bucket_sum_apply."""
    from fmm_bem_tpu.ops.bucket_sum import bucket_sum_apply

    return bucket_sum_apply(dev, x)


class LetPlan:
    """Distribute a built FmmPlan over a device mesh.

    Parameters
    ----------
    plan : FmmPlan (single-tree).
    ndev_or_mesh : device count (1-D mesh built from jax.devices()), a
        1-D jax.sharding.Mesh, or a 2-D Mesh ``(outer, inner)`` for
        two-level ICI x DCN topologies (SURVEY.md §5.8): the inner axis
        is an ICI domain (one host's chips), the outer axis crosses
        hosts over DCN.  Morton ranges are laid out so the flattened
        device order is (outer-major, inner-minor) — neighbouring
        ranges share an ICI domain — and the multipole/charge halos are
        exchanged hierarchically: intra-group exports ride ONLY the
        inner axis, and the cross-group all_gather carries only the
        boxes some other group actually imports.
    flipped : distribute the BC-flipped operator variant (the
        reference's switch_BC system matrix).
    """

    AXIS = "sp"
    AXIS_DCN = "dp"

    def __init__(self, plan, ndev_or_mesh, flipped=False):
        assert not plan.dual, "LET sharding: single-tree plans only"
        self.plan = plan
        if isinstance(ndev_or_mesh, Mesh):
            self.mesh = ndev_or_mesh
        else:
            devs = jax.devices()[: int(ndev_or_mesh)]
            self.mesh = Mesh(np.array(devs), (self.AXIS,))
        axes = self.mesh.axis_names
        if len(axes) == 2:
            self.AXIS_DCN, self.AXIS = axes
            self.ndcn = int(self.mesh.shape[self.AXIS_DCN])
            self.nsp = int(self.mesh.shape[self.AXIS])
            self.ndev = self.ndcn * self.nsp
        else:
            (self.AXIS,) = axes
            self.ndcn = 1
            self.nsp = int(self.mesh.shape[self.AXIS])
            self.ndev = self.nsp
        #: flattened-device -> outer-group id (outer-major order)
        self.dev_group = np.arange(self.ndev) // self.nsp
        self.flipped = flipped
        self.dtype = jnp.dtype(plan.config.dtype)
        self._partition()
        self._build_box_tables()
        self._build_m2l()
        self._build_m2p()
        self._build_near()
        self._build_body_tables()
        self._fn_cache = {}
        self._op_cache = {}

    # ------------------------------------------------------------------
    def _partition(self):
        plan = self.plan
        tree = plan.src.tree
        nd = self.ndev
        leaves = plan.src.leaf_ids
        starts = tree.box_body_start[leaves]
        counts = tree.box_body_count[leaves]
        lorder = np.argsort(starts, kind="stable")
        cum = np.cumsum(counts[lorder])
        n = tree.num_bodies
        # split leaf sequence at ~equal body counts
        targets = (np.arange(1, nd) * n) // nd
        cut = np.searchsorted(cum, targets, side="left") + 1
        cut = np.concatenate([[0], cut, [len(leaves)]])
        self.dev_leaf_slots = [
            np.sort(lorder[cut[d] : cut[d + 1]]).astype(np.int32)
            for d in range(nd)
        ]
        # body ranges per device (contiguous by construction)
        self.dev_lo = np.array(
            [
                starts[ls].min() if len(ls) else n
                for ls in (self.dev_leaf_slots)
            ],
            dtype=np.int64,
        )
        self.dev_hi = np.array(
            [
                (starts[ls] + counts[ls]).max() if len(ls) else n
                for ls in self.dev_leaf_slots
            ],
            dtype=np.int64,
        )
        # box ownership: owned iff the body range fits one device range
        bs = tree.box_body_start.astype(np.int64)
        be = bs + tree.box_body_count
        owner = np.searchsorted(self.dev_lo, bs, side="right") - 1
        owner = np.clip(owner, 0, nd - 1)
        contained = (bs >= self.dev_lo[owner]) & (be <= self.dev_hi[owner])
        self.box_owner = np.where(contained, owner, -1).astype(np.int32)
        self.shared_boxes = np.where(self.box_owner < 0)[0].astype(np.int32)
        self.own_boxes = [
            np.where(self.box_owner == d)[0].astype(np.int32)
            for d in range(nd)
        ]
        # pair/tile assignment for shared targets: device at box start
        self.assign_dev = np.where(
            self.box_owner >= 0,
            self.box_owner,
            np.clip(
                np.searchsorted(self.dev_lo, bs, side="right") - 1, 0, nd - 1
            ),
        ).astype(np.int32)

    def _build_box_tables(self):
        plan = self.plan
        tree = plan.src.tree
        nd = self.ndev
        n_sh = len(self.shared_boxes)
        n_own_max = max(1, max(len(o) for o in self.own_boxes))
        self.n_sh = n_sh
        self.n_own_max = n_own_max

        # import sets: M2L/M2P sources not owned-by-d and not shared
        need = [set() for _ in range(nd)]
        cls = plan.m2l_classes
        for ci in range(len(cls.src)):
            s, t = cls.src[ci], cls.tgt[ci]
            dv = self.assign_dev[t]
            for d in range(nd):
                sel = s[dv == d]
                rem = sel[
                    (self.box_owner[sel] != d) & (self.box_owner[sel] >= 0)
                ]
                need[d].update(rem.tolist())
        ms, mt = plan.m2p_src, plan.m2p_tgt_slot
        if len(ms):
            tgt_boxes = plan.tgt.leaf_ids[mt]
            dv = self.assign_dev[tgt_boxes]
            for d in range(nd):
                sel = ms[dv == d]
                rem = sel[
                    (self.box_owner[sel] != d) & (self.box_owner[sel] >= 0)
                ]
                need[d].update(rem.tolist())
        self.import_boxes = [
            np.array(sorted(need[d]), dtype=np.int64) for d in range(nd)
        ]
        n_imp_max = max(1, max(len(i) for i in self.import_boxes))
        self.n_imp_max = n_imp_max

        # local row layout
        self.ZERO = n_sh + n_own_max + n_imp_max
        self.SINK = self.ZERO + 1
        self.R = self.SINK + 1          # M-table rows
        self.R_red = n_sh + n_own_max   # L-table live rows (no imports)
        self.ZERO_L = self.R_red
        self.SINK_L = self.R_red + 1
        self.R_L = self.R_red + 2

        g2l = np.full((nd, tree.num_boxes), self.ZERO, np.int32)
        for d in range(nd):
            g2l[d, self.shared_boxes] = np.arange(n_sh, dtype=np.int32)
            g2l[d, self.own_boxes[d]] = n_sh + np.arange(
                len(self.own_boxes[d]), dtype=np.int32
            )
            g2l[d, self.import_boxes[d]] = (
                n_sh + n_own_max
                + np.arange(len(self.import_boxes[d]), dtype=np.int32)
            )
        self.g2l = g2l

        # M exports: per owner, own-row indices of boxes others import
        exported = [set() for _ in range(nd)]
        for d in range(nd):
            for b in self.import_boxes[d]:
                exported[self.box_owner[b]].add(int(b))
        exp_boxes = [np.array(sorted(e), dtype=np.int64) for e in exported]
        self.n_bexp_max = max(1, max(len(e) for e in exp_boxes))
        # exporter-side gather rows (local own rows); pad -> ZERO row
        self.m_export_rows = _pad_stack(
            [g2l[d, exp_boxes[d]] if len(exp_boxes[d]) else
             np.zeros(0, np.int32) for d in range(nd)],
            self.ZERO, np.int32, min_len=self.n_bexp_max,
        )
        # importer-side positions into the all_gathered [nd * n_bexp_max]
        flat_pos = {}
        for o in range(nd):
            for k, b in enumerate(exp_boxes[o]):
                flat_pos[int(b)] = o * self.n_bexp_max + k
        imp_pos = []
        for d in range(nd):
            imp_pos.append(
                np.array(
                    [flat_pos[int(b)] for b in self.import_boxes[d]],
                    dtype=np.int32,
                )
            )
        # pad -> appended zero row (index nd * n_bexp_max)
        self.m_import_pos = _pad_stack(
            imp_pos, nd * self.n_bexp_max, np.int32, min_len=self.n_imp_max
        )
        if self.ndcn > 1:
            # two-level mesh: hierarchical multipole halo (intra-group
            # over the ICI axis; only cross-group boxes over DCN)
            (
                self.m_exp_intra,
                self.m_exp_inter,
                self.m_import_pos2,
            ) = self._halo_split(
                self.import_boxes,
                self.box_owner,
                lambda o, ids: g2l[o, ids]
                if len(ids)
                else np.zeros(0, np.int32),
                self.ZERO,
            )

        # M2M / L2L class lists.  local: children owned by d (parent is
        # then owned-by-d or shared).  shared: child and parent shared.
        side = plan.src
        self.num_levels = tree.num_levels
        loc_up, shr_up = [], []
        for lvl in range(1, tree.num_levels):
            per_class = side.levels[lvl - 1]
            lc, sc = [], []
            for c in range(8):
                e = per_class[c]
                if e is None:
                    lc.append(None)
                    sc.append(None)
                    continue
                ch, pa, mi = e[0], tree.box_parent[e[0]], e[2]
                own = self.box_owner[ch]
                sh_sel = own < 0
                if sh_sel.any():
                    sc.append(
                        (
                            g2l[0, ch[sh_sel]],
                            g2l[0, pa[sh_sel]],
                            mi,
                        )
                    )
                else:
                    sc.append(None)
                per_dev_ch, per_dev_pa = [], []
                any_local = False
                for d in range(nd):
                    sel = own == d
                    per_dev_ch.append(g2l[d, ch[sel]])
                    per_dev_pa.append(g2l[d, pa[sel]])
                    any_local = any_local or sel.any()
                if any_local:
                    lc.append(
                        (
                            _pad_stack(per_dev_ch, self.ZERO, np.int32),
                            _pad_stack(per_dev_pa, self.SINK, np.int32),
                            mi,
                        )
                    )
                else:
                    lc.append(None)
            loc_up.append(lc)
            shr_up.append(sc)
        self.levels_local = loc_up
        self.levels_shared = shr_up

    def _halo_split(self, imports, owner_of_item, row_of, exp_pad_row):
        """Two-level halo exchange tables (2-D mesh only).

        Splits each owner's export set into items imported only within
        its outer-mesh group (exchanged by an all_gather over the inner
        ICI axis — per group, never touching DCN) and items some other
        group imports (exchanged by one full-mesh all_gather whose DCN
        hop carries ONLY these).  An item imported on both sides
        appears in both tables.

        Parameters
        ----------
        imports : per-device arrays of global item ids.
        owner_of_item : [num_items] owner device per global id.
        row_of : callable ``(owner, ids) -> local row indices``.
        exp_pad_row : exporter-side pad row (a zero row).

        Returns (exp_intra [nd, ni], exp_inter [nd, ne], imp_pos
        [nd, n_imp_max]) with positions into
        ``concat[intra (nsp*ni) | inter (nd*ne) | zero]``.
        """
        nd, nsp, grp = self.ndev, self.nsp, self.dev_group
        intra = [{} for _ in range(nd)]
        inter = [{} for _ in range(nd)]
        for d in range(nd):
            for b in imports[d]:
                o = int(owner_of_item[int(b)])
                tab = intra[o] if grp[d] == grp[o] else inter[o]
                if int(b) not in tab:
                    tab[int(b)] = len(tab)
        bi = [np.array(sorted(t), dtype=np.int64) for t in intra]
        be = [np.array(sorted(t), dtype=np.int64) for t in inter]
        ni = max(1, max(len(b) for b in bi))
        ne = max(1, max(len(b) for b in be))
        exp_intra = _pad_stack(
            [row_of(o, bi[o]) for o in range(nd)],
            exp_pad_row, np.int32, min_len=ni,
        )
        exp_inter = _pad_stack(
            [row_of(o, be[o]) for o in range(nd)],
            exp_pad_row, np.int32, min_len=ne,
        )
        pos_intra = {
            (o, int(b)): (o % nsp) * ni + k
            for o in range(nd)
            for k, b in enumerate(bi[o])
        }
        pos_inter = {
            (o, int(b)): nsp * ni + o * ne + k
            for o in range(nd)
            for k, b in enumerate(be[o])
        }
        zero_pos = nsp * ni + nd * ne
        imp_pos = []
        for d in range(nd):
            rows = []
            for b in imports[d]:
                o = int(owner_of_item[int(b)])
                rows.append(
                    pos_intra[(o, int(b))]
                    if grp[d] == grp[o]
                    else pos_inter[(o, int(b))]
                )
            imp_pos.append(np.array(rows, dtype=np.int32))
        n_imp_max = max(1, max(len(r) for r in imp_pos))
        imp_pos = _pad_stack(imp_pos, zero_pos, np.int32, min_len=n_imp_max)
        return exp_intra, exp_inter, imp_pos

    def _build_m2l(self):
        plan = self.plan
        nd = self.ndev
        cls = plan.m2l_classes
        TS = plan.m2l_tile_size
        G = plan.m2l_tile_group
        per_dev = [
            {"src": [], "tgt": [], "cls": []}
            for _ in range(nd)
        ]
        for ci in range(len(cls.src)):
            s, t = cls.src[ci], cls.tgt[ci]
            dv = self.assign_dev[t]
            for d in range(nd):
                sel = dv == d
                n = int(sel.sum())
                if n == 0:
                    continue
                ntile = -(-n // TS)
                pad = ntile * TS - n
                per_dev[d]["src"].append(self.g2l[d, s[sel]])
                per_dev[d]["tgt"].append(self.g2l[d, t[sel]])
                if pad:
                    per_dev[d]["src"].append(
                        np.full(pad, self.ZERO, np.int32)
                    )
                    per_dev[d]["tgt"].append(
                        np.full(pad, self.R_L, np.int32)  # dropped
                    )
                per_dev[d]["cls"].append(np.full(ntile, ci, np.int32))

        srcs, tgts, clss = [], [], []
        for d in range(nd):
            pd = per_dev[d]
            if pd["src"]:
                srcs.append(np.concatenate(pd["src"]))
                tgts.append(np.concatenate(pd["tgt"]))
                clss.append(np.concatenate(pd["cls"]))
            else:
                srcs.append(np.zeros(0, np.int32))
                tgts.append(np.zeros(0, np.int32))
                clss.append(np.zeros(0, np.int32))
        self.has_m2l = len(cls.mats) > 0
        ntile_max = max(1, max(len(c) for c in clss))
        ntile_max = -(-ntile_max // G) * G
        self.m2l_ntile = ntile_max
        self.m2l_src = _pad_stack(
            srcs, self.ZERO, np.int32, min_len=ntile_max * TS
        )
        self.m2l_tgt = _pad_stack(
            tgts, self.R_L, np.int32, min_len=ntile_max * TS
        )
        self.m2l_cls = _pad_stack(clss, 0, np.int32, min_len=ntile_max)
        self.m2l_bsum = _build_bucket_sums(
            [self.m2l_tgt[d] for d in range(nd)],
            ntile_max * TS,
            self.R_red,
        )

    def _build_m2p(self):
        plan = self.plan
        nd = self.ndev
        ms, mt = plan.m2p_src, plan.m2p_tgt_slot
        self.has_m2p = len(ms) > 0
        if not self.has_m2p:
            return
        tgt_boxes = plan.tgt.leaf_ids[mt]
        dv = self.assign_dev[tgt_boxes]
        src_rows, tgt_loc, isig = [], [], []
        for d in range(nd):
            sel = dv == d
            src_rows.append(self.g2l[d, ms[sel]])
            tgt_loc.append(self.leaf_g2l(d)[mt[sel]])
            isig.append(plan.m2p_inv_sigma[sel])
        self.m2p_rows = _pad_stack(src_rows, self.ZERO, np.int32)
        # padded pairs scatter into an extra segment (nl_d_max)
        self.m2p_tslot = _pad_stack(
            tgt_loc, self.nl_max, np.int32
        )
        self.m2p_isig = _pad_stack(isig, 0.0, np.float64)
        self.m2p_srcbox = _pad_stack(
            [ms[dv == d] for d in range(nd)], 0, np.int32
        )

    def leaf_g2l(self, d):
        """Global leaf slot -> local own-leaf index for device d."""
        if not hasattr(self, "_leaf_g2l"):
            nl = len(self.plan.src.leaf_ids)
            self.nl_max = max(
                1, max(len(ls) for ls in self.dev_leaf_slots)
            )
            m = np.full((self.ndev, nl), self.nl_max, np.int32)
            for dd in range(self.ndev):
                m[dd, self.dev_leaf_slots[dd]] = np.arange(
                    len(self.dev_leaf_slots[dd]), dtype=np.int32
                )
            self._leaf_g2l = m
        return self._leaf_g2l[d]

    def _build_near(self):
        """Per-device near field: panels for owned target leaves with a
        locally-renumbered source-leaf charge table [own | import | 0],
        plus the charge-tile halo exchange plan."""
        plan = self.plan
        nd = self.ndev
        self.leaf_g2l(0)  # materialise nl_max
        kern = plan.kernel
        self.cdim = getattr(kern, "charge_dim", 1)
        self.rdim = getattr(kern, "result_dim", 1)
        K = plan.src.leaf_pad
        self.K = K

        pp_s = plan.p2p_src_slot
        pp_t = plan.p2p_tgt_slot
        tgt_leaf_box = plan.tgt.leaf_ids[pp_t]
        pair_dev = self.assign_dev[tgt_leaf_box]
        # leaf-slot owner (leaves are always owned)
        leaf_owner = self.box_owner[plan.src.leaf_ids]

        # per device: imported source leaf slots (global numbering)
        imp_leaves = []
        for d in range(nd):
            sel = pair_dev == d
            rem = np.unique(pp_s[sel][leaf_owner[pp_s[sel]] != d])
            imp_leaves.append(rem.astype(np.int64))
        self.n_limp_max = max(1, max(len(i) for i in imp_leaves))
        self.imp_leaves = imp_leaves

        # source-leaf local charge-table column map:
        # [own leaves (nl_max) | imports (n_limp_max) | zero]
        nl = len(plan.src.leaf_ids)
        src_l2c = np.full(
            (nd, nl), self.nl_max + self.n_limp_max, np.int32
        )
        for d in range(nd):
            src_l2c[d, self.dev_leaf_slots[d]] = np.arange(
                len(self.dev_leaf_slots[d]), dtype=np.int32
            )
            src_l2c[d, imp_leaves[d]] = self.nl_max + np.arange(
                len(imp_leaves[d]), dtype=np.int32
            )
        self.src_l2c = src_l2c
        self.n_ctab = self.nl_max + self.n_limp_max + 1

        # charge-tile exports (local own-leaf indices per owner)
        exported = [set() for _ in range(nd)]
        for d in range(nd):
            for s in imp_leaves[d]:
                exported[leaf_owner[s]].add(int(s))
        exp_leaves = [np.array(sorted(e), dtype=np.int64) for e in exported]
        self.n_lexp_max = max(1, max(len(e) for e in exp_leaves))
        self.q_export_rows = _pad_stack(
            [
                self._leaf_g2l[d, exp_leaves[d]]
                if len(exp_leaves[d])
                else np.zeros(0, np.int32)
                for d in range(nd)
            ],
            self.nl_max,  # pad -> local zero-pad row (tile of zeros)
            np.int32,
            min_len=self.n_lexp_max,
        )
        flat_pos = {}
        for o in range(nd):
            for k, s in enumerate(exp_leaves[o]):
                flat_pos[int(s)] = o * self.n_lexp_max + k
        self.q_import_pos = _pad_stack(
            [
                np.array(
                    [flat_pos[int(s)] for s in imp_leaves[d]],
                    dtype=np.int32,
                )
                for d in range(nd)
            ],
            nd * self.n_lexp_max,
            np.int32,
            min_len=self.n_limp_max,
        )
        if self.ndcn > 1:
            # two-level mesh: hierarchical charge-tile halo
            leaf_owner_full = np.full(nl, -1, np.int64)
            leaf_owner_full[:] = leaf_owner
            (
                self.q_exp_intra,
                self.q_exp_inter,
                self.q_import_pos2,
            ) = self._halo_split(
                imp_leaves,
                leaf_owner_full,
                lambda o, ids: self._leaf_g2l[o, ids]
                if len(ids)
                else np.zeros(0, np.int32),
                self.nl_max,
            )

        self.pair_dev = pair_dev
        self.use_panels = plan._use_panels
        self.use_p2p = (
            plan.near_rows is None and len(plan.p2p_src_slot) > 0
        )
        if plan.near_rows is not None and not plan._use_panels:
            raise NotImplementedError(
                "LET sharding needs the panel near field (near_panel=True)"
                " or a direct-P2P kernel; the COO replay mode is not"
                " distributed"
            )
        self._near_variant_cache = {}

    def _near_panels_local(self, tgt_fields_host):
        """Per-device NearPanels (device dicts + metas), built with the
        refactored builders in ops/near_panel.py using local target/
        source renumbering."""
        plan = self.plan
        nd = self.ndev
        key = np.asarray(tgt_fields_host.get("bc", np.zeros(0))).tobytes()
        if key in self._near_variant_cache:
            return self._near_variant_cache[key]
        from fmm_bem_tpu.ops.near_panel import (
            build_near_panels,
            build_near_panels_on_device,
        )

        pp_s, pp_t = plan.p2p_src_slot, plan.p2p_tgt_slot
        rows, cols = plan.near_rows, plan.near_cols
        bc = np.asarray(tgt_fields_host.get("bc", np.zeros(0)))
        vsel = plan.kernel.near_select(
            plan.near_vals, bc[rows] if len(bc) else None
        )
        t_slot_of_body = plan.tgt.box_to_slot[plan.tgt.tree.body_leaf]

        # one chunk width for ALL devices (panels stack to one shape);
        # a target leaf belongs to exactly one device, so the global
        # per-leaf pair counts are exactly the union of the per-device
        # ones
        from fmm_bem_tpu.ops.near_panel import choose_m0

        m_per_global = np.bincount(
            np.asarray(pp_t), minlength=len(plan.tgt.leaf_ids)
        )
        m0 = choose_m0(m_per_global, self.K * self.cdim)

        devs, metas = [], []
        for d in range(nd):
            psel = self.pair_dev == d
            ss_d = pp_s[psel]
            ts_d = pp_t[psel]
            # entries whose target body lies in an owned target leaf of
            # a pair assigned to d: filter by the pair's device through
            # the (tgt leaf, src leaf) key
            tgt_set = np.zeros(len(plan.tgt.leaf_ids) + 1, bool)
            # a target leaf can appear in pairs of exactly one device
            tgt_set[ts_d] = True
            esel = tgt_set[t_slot_of_body[rows]]
            tgl = self.leaf_g2l(d).astype(np.int64)
            if getattr(plan, "_device_near", False):
                dev, meta = build_near_panels_on_device(
                    ss_d,
                    ts_d,
                    plan.src,
                    plan.tgt,
                    self.nl_max,
                    plan._near_blocks_fn(tgt_fields_host),
                    corr=(rows[esel], cols[esel], vsel[esel]),
                    rdim=self.rdim,
                    cdim=self.cdim,
                    m0=m0,
                    dtype=self.dtype,
                    jit_cache=plan.__dict__.setdefault(
                        "_panel_jit_cache", {}
                    ),
                    tgt_slot_local=tgl,
                    src_slot_local=self.src_l2c[d].astype(np.int64),
                    nl_src_local=self.n_ctab - 1,
                )
            else:
                meta = build_near_panels(
                    ss_d,
                    ts_d,
                    rows[esel],
                    cols[esel],
                    vsel[esel],
                    plan.src,
                    plan.tgt,
                    self.nl_max,
                    m0=m0,
                    dtype=np.dtype(self.dtype),
                    tgt_slot_local=tgl,
                    src_slot_local=self.src_l2c[d].astype(np.int64),
                    nl_src_local=self.n_ctab - 1,
                )
                dev = meta.device(self.dtype)
            devs.append(dev)
            metas.append(meta)

        # uniform chunk shape (same m0 everywhere): pad the chunk rows
        # to the max device count and stack with a leading device axis.
        # Dummy rows carry pidx = zero-charge column and chunk_tgt =
        # nl_max (the dropped tail segment of the segment-sum).
        A_stk = jnp.asarray(
            _pad_stack(
                [np.asarray(dv["A"]) for dv in devs],
                0.0,
                np.dtype(self.dtype),
            )
        )
        pidx_stk = jnp.asarray(
            _pad_stack(
                [np.asarray(dv["pidx"]) for dv in devs],
                self.n_ctab - 1,
                np.int32,
            )
        )
        ct_stk = jnp.asarray(
            _pad_stack(
                [np.asarray(dv["chunk_tgt"]) for dv in devs],
                self.nl_max,
                np.int32,
            )
        )
        out = {"A": A_stk, "pidx": pidx_stk, "chunk_tgt": ct_stk}
        meta0 = metas[0]
        self._near_variant_cache[key] = (out, meta0)
        if len(self._near_variant_cache) > 4:
            self._near_variant_cache.pop(
                next(iter(self._near_variant_cache))
            )
        return out, meta0

    def _build_body_tables(self):
        plan = self.plan
        nd = self.ndev
        tree = plan.src.tree
        n = tree.num_bodies
        self.nb_max = int(
            max(self.dev_hi[d] - self.dev_lo[d] for d in range(nd))
        )
        side = plan.src
        K = self.K

        def body_slice(arr, fill=0.0):
            return _pad_stack(
                [
                    np.asarray(arr)[self.dev_lo[d] : self.dev_hi[d]]
                    for d in range(nd)
                ],
                fill,
                min_len=self.nb_max,
            )

        self._body_slice = body_slice
        # per-device leaf tiles: local body ids (global - lo), masked
        lb_idx, lb_mask, leaf_rows = [], [], []
        flat_slot = []
        body_leaf_row = []
        for d in range(nd):
            ls = self.dev_leaf_slots[d]
            idx = side.leaf_body_idx[ls] - self.dev_lo[d]
            msk = side.leaf_body_mask[ls]
            idx = np.where(msk, idx, 0).astype(np.int32)
            lb_idx.append(idx)
            lb_mask.append(msk)
            leaf_rows.append(
                self.g2l[d, plan.src.leaf_ids[ls]]
            )
            # body -> local (leaf-local slot * K + pos)
            sl = self.leaf_g2l(d)[
                side.box_to_slot[tree.body_leaf[
                    self.dev_lo[d] : self.dev_hi[d]
                ]]
            ]
            pos = (
                np.arange(self.dev_lo[d], self.dev_hi[d])
                - tree.box_body_start[
                    tree.body_leaf[self.dev_lo[d] : self.dev_hi[d]]
                ]
            )
            flat_slot.append((sl * K + pos).astype(np.int32))
            body_leaf_row.append(
                self.g2l[
                    d, tree.body_leaf[self.dev_lo[d] : self.dev_hi[d]]
                ].astype(np.int32)
            )
        self.leaf_body_idx = _pad_stack(lb_idx, 0, np.int32)
        self.leaf_body_mask = _pad_stack(lb_mask, False, bool)
        self.leaf_rows = _pad_stack(
            leaf_rows, self.SINK, np.int32, min_len=self.nl_max
        )
        # padded body slots -> appended zero row of the leaf result tile
        self.body_flat_slot = _pad_stack(
            flat_slot, self.nl_max * K, np.int32, min_len=self.nb_max
        )
        self.body_leaf_row = _pad_stack(
            body_leaf_row, self.ZERO_L, np.int32, min_len=self.nb_max
        )

    # ------------------------------------------------------------------
    # device data (per p, per variant)
    # ------------------------------------------------------------------
    def _operand(self, p, tgt_fields_host=None):
        plan = self.plan
        nd = self.ndev
        key = (
            int(p),
            None
            if tgt_fields_host is None
            else np.asarray(tgt_fields_host["bc"]).tobytes(),
        )
        if key in self._op_cache:
            return self._op_cache[key]
        dt = self.dtype
        tfh = (
            tgt_fields_host
            if tgt_fields_host is not None
            else (
                plan._flipped_fields()[0]
                if self.flipped
                else plan.src.fields
            )
        )
        aux = plan.variant_aux(
            p,
            src_host=tfh if (self.flipped or tgt_fields_host) else None,
            tgt_host=tfh if (self.flipped or tgt_fields_host) else None,
        )
        kern = plan.kernel
        W = kern.width(min(int(p), plan.config.max_p))
        cW = kern.ncomp * W

        d = {
            "m2m_mats": jnp.asarray(
                plan._slice_mats(plan.src.m2m_mats, p), dt
            ),
            "l2l_mats": jnp.asarray(
                plan._slice_mats(plan.tgt.l2l_mats, p), dt
            ),
            "m2l_mats": jnp.asarray(
                plan._slice_mats(plan.m2l_classes.mats, p), dt
            ),
            "m2l_src": jnp.asarray(self.m2l_src),
            "m2l_cls": jnp.asarray(self.m2l_cls),
            "m2l_bsum": self.m2l_bsum.device(),
            "leaf_body_idx": jnp.asarray(self.leaf_body_idx),
            "leaf_body_mask": jnp.asarray(self.leaf_body_mask),
            "leaf_rows": jnp.asarray(self.leaf_rows),
            "body_flat_slot": jnp.asarray(self.body_flat_slot),
            "body_leaf_row": jnp.asarray(self.body_leaf_row),
            "m_export_rows": jnp.asarray(self.m_export_rows),
            "m_import_pos": jnp.asarray(self.m_import_pos),
            "q_export_rows": jnp.asarray(self.q_export_rows),
            "q_import_pos": jnp.asarray(self.q_import_pos),
        }
        if self.ndcn > 1:
            d["m_exp_intra"] = jnp.asarray(self.m_exp_intra)
            d["m_exp_inter"] = jnp.asarray(self.m_exp_inter)
            d["m_import_pos"] = jnp.asarray(self.m_import_pos2)
            d["q_exp_intra"] = jnp.asarray(self.q_exp_intra)
            d["q_exp_inter"] = jnp.asarray(self.q_exp_inter)
            d["q_import_pos"] = jnp.asarray(self.q_import_pos2)
        # body tables (sliced per device)
        if "p2m_tab" in aux:
            tab = np.asarray(aux["p2m_tab"])
            if tab.ndim == 2:  # [n, cW]
                d["p2m_tab"] = jnp.asarray(self._body_slice(tab), dt)
            else:  # [cdim, n, cW]
                d["p2m_tab"] = jnp.asarray(
                    np.stack(
                        [
                            self._body_slice(tab[c])
                            for c in range(tab.shape[0])
                        ],
                        axis=1,
                    ),
                    dt,
                )
        if "l2p_tab" in aux:
            d["l2p_tab"] = jnp.asarray(
                self._body_slice(np.asarray(aux["l2p_tab"])), dt
            )
        # near field
        if self.use_panels:
            panels, meta = self._near_panels_local(tfh)
            d["panels"] = panels
            self._near_meta = meta
        if self.use_p2p or self.has_m2p or "p2m_tab" not in aux:
            # per-device body field arrays (kernel operator inputs)
            d["fields"] = {
                k: jnp.asarray(self._body_slice(np.asarray(v)), dt)
                for k, v in plan.src.fields.items()
                if k != "vertices"
            }
        if self.use_p2p:
            # per-device source-leaf FIELD tiles over the charge-table
            # columns [own | import | zero]
            sf_tiles = {}
            for k, v in plan.src.fields.items():
                if k == "vertices":
                    continue
                v = np.asarray(v)
                gathered = v[plan.src.leaf_body_idx]  # [nl, K, ...]
                per_dev = []
                for dd in range(nd):
                    own = gathered[self.dev_leaf_slots[dd]]
                    imp = gathered[self.imp_leaves[dd]]
                    own = np.concatenate(
                        [
                            own,
                            np.zeros(
                                (self.nl_max - len(own),) + own.shape[1:],
                                v.dtype,
                            ),
                            imp,
                            np.zeros(
                                (self.n_limp_max - len(imp) + 1,)
                                + own.shape[1:],
                                v.dtype,
                            ),
                        ]
                    )
                    per_dev.append(own)
                sf_tiles[k] = jnp.asarray(np.stack(per_dev), dt)
            d["src_leaf_fields"] = sf_tiles
            smask = plan.src.leaf_body_mask
            per_dev = []
            for dd in range(nd):
                own = smask[self.dev_leaf_slots[dd]]
                imp = smask[self.imp_leaves[dd]]
                per_dev.append(
                    np.concatenate(
                        [
                            own,
                            np.zeros(
                                (self.nl_max - len(own), self.K), bool
                            ),
                            imp,
                            np.zeros(
                                (self.n_limp_max - len(imp) + 1, self.K),
                                bool,
                            ),
                        ]
                    )
                )
            d["src_leaf_mask"] = jnp.asarray(np.stack(per_dev))
            # per-device p2p pair lists (local charge-table cols, local
            # target leaves)
            pp_s, pp_t = plan.p2p_src_slot, plan.p2p_tgt_slot
            ssl, tsl = [], []
            for dd in range(nd):
                sel = self.pair_dev == dd
                ssl.append(self.src_l2c[dd, pp_s[sel]])
                tsl.append(self.leaf_g2l(dd)[pp_t[sel]])
            d["p2p_src_col"] = jnp.asarray(
                _pad_stack(ssl, self.n_ctab - 1, np.int32)
            )
            d["p2p_tgt_loc"] = jnp.asarray(
                _pad_stack(tsl, self.nl_max, np.int32)
            )
            # local target leaf tiles for p2p row fields (host gather:
            # per-device body slice indexed by its local leaf tiles)
            tlt = {}
            for k, v in plan.src.fields.items():
                if k == "vertices":
                    continue
                v = np.asarray(v)
                per = []
                for dd in range(nd):
                    body = np.zeros(
                        (self.nb_max,) + v.shape[1:], v.dtype
                    )
                    seg = v[self.dev_lo[dd] : self.dev_hi[dd]]
                    body[: len(seg)] = seg
                    per.append(body[self.leaf_body_idx[dd]])
                tlt[k] = jnp.asarray(np.stack(per), dt)
            d["tgt_leaf_fields"] = tlt
        if self.has_m2p:
            d["m2p_rows"] = jnp.asarray(self.m2p_rows)
            d["m2p_tslot"] = jnp.asarray(self.m2p_tslot)
            d["m2p_isig"] = jnp.asarray(self.m2p_isig, dt)
            d["m2p_center"] = jnp.asarray(
                _pad_stack(
                    [
                        plan.src.tree.box_center[self.m2p_srcbox[dd]]
                        for dd in range(nd)
                    ],
                    0.0,
                ),
                dt,
            )
        if "p2m_tab" not in d or "l2p_tab" not in d:
            d["body_dnorm"] = jnp.asarray(
                self._body_slice(plan.src.body_dnorm), dt
            )
            d["body_inv_sigma"] = jnp.asarray(
                self._body_slice(plan.src.body_inv_sigma), dt
            )
            d.setdefault(
                "fields",
                {
                    k: jnp.asarray(self._body_slice(np.asarray(v)), dt)
                    for k, v in plan.src.fields.items()
                    if k != "vertices"
                },
            )
        self._op_cache[key] = (d, p, cW)
        if len(self._op_cache) > 6:
            self._op_cache.pop(next(iter(self._op_cache)))
        return self._op_cache[key]

    # ------------------------------------------------------------------
    # the sharded matvec
    # ------------------------------------------------------------------
    def _local_matvec(self, d, q_loc, p, cW):
        """Per-device body of the shard_map (arrays already squeezed to
        this device's block)."""
        plan = self.plan
        kern = plan.kernel
        dt = self.dtype
        AX = self.AXIS
        K = self.K
        cdim, rdim = self.cdim, self.rdim
        ncomp = kern.ncomp
        W = cW // ncomp
        from fmm_bem_tpu.executor.plan import apply_flat_trans

        # ---- 1. leaf charge tiles + halo all_gather (fires first; XLA
        # overlaps it with the local upward pass)
        qg = q_loc[d["leaf_body_idx"]]
        if cdim > 1:
            qg = jnp.where(d["leaf_body_mask"][..., None], qg, 0.0)
            ql_own = qg.reshape(qg.shape[0], K * cdim)
        else:
            ql_own = jnp.where(d["leaf_body_mask"], qg, 0.0)
        ql_own_z = jnp.concatenate(
            [ql_own, jnp.zeros((1, K * cdim), dt)], axis=0
        )
        if self.ndcn > 1:
            # hierarchical halo: intra-group tiles ride the ICI axis
            # only; the cross-group gather carries just the leaves some
            # other group imports
            gi = jax.lax.all_gather(ql_own_z[d["q_exp_intra"]], AX)
            ge = jax.lax.all_gather(
                ql_own_z[d["q_exp_inter"]], (self.AXIS_DCN, AX)
            )
            gathered = jnp.concatenate(
                [
                    gi.reshape(-1, K * cdim),
                    ge.reshape(-1, K * cdim),
                    jnp.zeros((1, K * cdim), dt),
                ],
                axis=0,
            )
        else:
            exports = ql_own_z[d["q_export_rows"]]
            gathered = jax.lax.all_gather(exports, AX)  # [nd, nexp, KSc]
            gathered = jnp.concatenate(
                [
                    gathered.reshape(-1, K * cdim),
                    jnp.zeros((1, K * cdim), dt),
                ],
                axis=0,
            )
        imports = gathered[d["q_import_pos"]]
        # charge table [own | import | zero]
        xq = jnp.concatenate(
            [ql_own, imports, jnp.zeros((1, K * cdim), dt)], axis=0
        )

        # ---- 2. P2M + local M2M
        if "p2m_tab" in d:
            tab = d["p2m_tab"]
            if q_loc.ndim == 1:
                contrib = q_loc[:, None] * tab
            else:
                contrib = jnp.einsum("nc,cnw->nw", q_loc, tab)
        else:
            contrib = kern.p2m(
                d["fields"],
                q_loc,
                d["body_dnorm"],
                d["body_inv_sigma"],
                p,
            ).reshape(-1, cW)
        ct = contrib[d["leaf_body_idx"]]
        ct = jnp.where(d["leaf_body_mask"][..., None], ct, 0.0)
        leaf_M = jnp.sum(ct, axis=1)  # [nl_max, cW]
        # padded leaf rows scatter into SINK; padded child gathers read
        # the ZERO row, which nothing ever writes — no resets needed
        M = jnp.zeros((self.R, cW), dt).at[d["leaf_rows"]].add(leaf_M)

        for lvl in range(self.num_levels - 1, 0, -1):
            for c in range(8):
                e = self.levels_local[lvl - 1][c]
                if e is None:
                    continue
                ch = d["lvl_loc"][lvl - 1][c][0]
                pa = d["lvl_loc"][lvl - 1][c][1]
                M = M.at[pa].add(
                    apply_flat_trans(M[ch], d["m2m_mats"][e[2]], ncomp)
                )

        # ---- 3./4. shared top: psum + replicated M2M
        AX_ALL = (self.AXIS_DCN, AX) if self.ndcn > 1 else AX
        if self.n_sh:
            sh = jax.lax.psum(M[: self.n_sh], AX_ALL)
            M = M.at[: self.n_sh].set(sh)
            for lvl in range(self.num_levels - 1, 0, -1):
                for c in range(8):
                    e = self.levels_shared[lvl - 1][c]
                    if e is None:
                        continue
                    ch, pa, mi = e
                    ch = d["lvl_sh"][lvl - 1][c][0]
                    pa = d["lvl_sh"][lvl - 1][c][1]
                    M = M.at[pa].add(
                        apply_flat_trans(M[ch], d["m2m_mats"][mi], ncomp)
                    )

        # ---- 5. LET halo: export owned multipoles, import remote ones
        if self.ndcn > 1:
            gi = jax.lax.all_gather(M[d["m_exp_intra"]], AX)
            ge = jax.lax.all_gather(
                M[d["m_exp_inter"]], (self.AXIS_DCN, AX)
            )
            gm = jnp.concatenate(
                [
                    gi.reshape(-1, cW),
                    ge.reshape(-1, cW),
                    jnp.zeros((1, cW), dt),
                ],
                axis=0,
            )
        else:
            exp_m = M[d["m_export_rows"]]
            gm = jax.lax.all_gather(exp_m, AX).reshape(-1, cW)
            gm = jnp.concatenate([gm, jnp.zeros((1, cW), dt)], axis=0)
        M = M.at[
            self.n_sh + self.n_own_max :
            self.n_sh + self.n_own_max + self.n_imp_max
        ].set(gm[d["m_import_pos"]])

        # ---- 6. M2L tiles + bucketed reduction into local L
        if self.has_m2l:
            TS = plan.m2l_tile_size
            npairs = self.m2l_ntile * TS
            # component axis folded into matmul rows (see plan._phase_m2l)
            Mg = M[d["m2l_src"]].reshape(
                self.m2l_ntile, TS * ncomp, W
            )
            mats = d["m2l_mats"][d["m2l_cls"]]  # [ntile, W, W]
            outp = jnp.einsum("tpw,tvw->tpv", Mg, mats).reshape(
                npairs, cW
            )
            L_red = _bucket_sum_apply(d["m2l_bsum"], outp)  # [R_red, cW]
        else:
            L_red = jnp.zeros((self.R_red, cW), dt)

        # near field (independent of M -> overlaps collectives)
        near_leaf = None
        if self.use_panels and "panels" in d:
            from fmm_bem_tpu.ops.near_panel import panel_matvec

            near_leaf = panel_matvec(d["panels"], self._near_meta, xq)
        p2p_leaf = None
        if self.use_p2p:
            sbt = d["src_leaf_fields"]
            smask = d["src_leaf_mask"]
            scol = d["p2p_src_col"]
            tloc = d["p2p_tgt_loc"]
            src_rows = {k: v[scol] for k, v in sbt.items()}
            tgt_rows = {
                k: v[tloc] for k, v in d["tgt_leaf_fields"].items()
            }
            qgp = xq[scol].reshape(
                scol.shape[0], K, cdim
            ) if cdim > 1 else xq[scol]
            mrow = smask[scol]
            qgp = jnp.where(
                mrow[..., None] if cdim > 1 else mrow, qgp, 0.0
            )
            from fmm_bem_tpu.executor.plan import chunked_vmap

            vals = chunked_vmap(
                lambda tf, sf, qr, mr: kern.p2p_block(tf, sf, qr, mr),
                (tgt_rows, src_rows, qgp, mrow),
                plan.config.p2p_chunk,
            )
            p2p_leaf = jax.ops.segment_sum(
                vals, tloc, num_segments=self.nl_max + 1
            )[: self.nl_max].reshape(self.nl_max, K * rdim)

        if self.n_sh:
            # ---- 7. shared-L psum
            shL = jax.lax.psum(L_red[: self.n_sh], AX_ALL)
            L_red = L_red.at[: self.n_sh].set(shL)

        L = jnp.concatenate(
            [L_red, jnp.zeros((2, cW), dt)], axis=0
        )  # + ZERO_L, SINK_L

        if plan.config.evaluator.value == "fmm":
            # ---- 8. shared L2L (replicated), then local L2L top-down
            for lvl in range(1, self.num_levels):
                for c in range(8):
                    e = self.levels_shared[lvl - 1][c]
                    if e is not None:
                        ch = d["lvl_sh"][lvl - 1][c][0]
                        pa = d["lvl_sh"][lvl - 1][c][1]
                        L = L.at[ch].add(
                            apply_flat_trans(
                                L[pa], d["l2l_mats"][e[2]], ncomp
                            )
                        )
                for c in range(8):
                    e = self.levels_local[lvl - 1][c]
                    if e is not None:
                        ch = d["lvl_loc"][lvl - 1][c][0]
                        pa = d["lvl_loc"][lvl - 1][c][1]
                        # local lists carry M-table pad rows (ZERO/SINK
                        # beyond R_red); clamp onto the L layout's
                        # zero-read / garbage-sink rows
                        L = L.at[jnp.minimum(ch, self.SINK_L)].add(
                            apply_flat_trans(
                                L[jnp.minimum(pa, self.ZERO_L)],
                                d["l2l_mats"][e[2]],
                                ncomp,
                            )
                        )

            Lb = L[d["body_leaf_row"]]
            if "l2p_tab" in d:
                res = jnp.einsum("nw,nwr->nr", Lb, d["l2p_tab"])
            else:
                res = kern.l2p(
                    d["fields"],
                    Lb.reshape(-1, kern.ncomp, kern.width(p)),
                    d["body_dnorm"],
                    d["body_inv_sigma"],
                    p,
                )
        else:
            res = jnp.zeros((self.nb_max, rdim), dt)

        # ---- M2P (treecode / skew fallback)
        if self.has_m2p:
            tslot = d["m2p_tslot"]
            bidx = d["leaf_body_idx"]  # local body ids per leaf
            bidx_z = jnp.concatenate(
                [bidx, jnp.zeros((1, K), jnp.int32)], axis=0
            )
            rows_b = bidx_z[tslot]
            txyz = d["fields"]["xyz"][rows_b]
            centers = d["m2p_center"]
            isig = d["m2p_isig"]
            dn = (txyz - centers[:, None, :]) * isig[:, None, None]
            Ms = M[d["m2p_rows"]].reshape(
                -1, kern.ncomp, kern.width(p)
            )
            fields_rows = {
                k: v[rows_b] for k, v in d["fields"].items()
            }

            def one_pair(m, dnp, s, fr):
                mb = jnp.broadcast_to(m, (K,) + m.shape)
                return kern.m2p(fr, mb, dnp, jnp.full((K,), s, dt), p)

            from fmm_bem_tpu.executor.plan import chunked_vmap

            vals = chunked_vmap(
                one_pair, (Ms, dn, isig, fields_rows),
                plan.config.p2p_chunk,
            )
            seg = jax.ops.segment_sum(
                vals, tslot, num_segments=self.nl_max + 1
            )[: self.nl_max]
            seg = seg.reshape(self.nl_max * K, rdim)
            seg = jnp.concatenate(
                [seg, jnp.zeros((1, rdim), dt)], axis=0
            )
            res = res + seg[d["body_flat_slot"]]

        # near results -> body rows (panel_matvec already applied the
        # leaf reorder: [nl_max, KT*rdim])
        if near_leaf is not None:
            nl_rows = jnp.concatenate(
                [
                    near_leaf.reshape(self.nl_max * K, rdim),
                    jnp.zeros((1, rdim), dt),
                ],
                axis=0,
            )
            res = res + nl_rows[d["body_flat_slot"]]
        if p2p_leaf is not None:
            pr = jnp.concatenate(
                [
                    p2p_leaf.reshape(self.nl_max * K, rdim),
                    jnp.zeros((1, rdim), dt),
                ],
                axis=0,
            )
            res = res + pr[d["body_flat_slot"]]
        return res

    def matvec_fn(self, p, tgt_fields_host=None):
        """Jitted shard_map matvec: padded Morton layout in/out.

        Input charges [ndev * nb_max(, cdim)] (zero-padded per range),
        output results [ndev * nb_max, rdim].
        """
        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map

        key = (
            int(p),
            None
            if tgt_fields_host is None
            else np.asarray(tgt_fields_host["bc"]).tobytes(),
        )
        if key in self._fn_cache:
            return self._fn_cache[key]
        d, p_eff, cW = self._operand(p, tgt_fields_host)
        AX = self.AXIS
        nd = self.ndev

        # stack level lists into device-indexed arrays inside the
        # operand (shard_map needs uniform pytrees); shared lists are
        # replicated per device for spec uniformity
        lvl_loc, lvl_sh = [], []
        for lvl in range(1, self.num_levels):
            ll, ls = [], []
            for c in range(8):
                e = self.levels_local[lvl - 1][c]
                ll.append(
                    None
                    if e is None
                    else (jnp.asarray(e[0]), jnp.asarray(e[1]))
                )
                es = self.levels_shared[lvl - 1][c]
                ls.append(
                    None
                    if es is None
                    else (jnp.asarray(es[0]), jnp.asarray(es[1]))
                )
            lvl_loc.append(ll)
            lvl_sh.append(ls)
        dd = dict(d)
        dd["lvl_loc"] = lvl_loc
        dd["lvl_sh"] = lvl_sh

        sharded_keys = {
            "m2l_src", "m2l_cls", "leaf_body_idx",
            "leaf_body_mask", "leaf_rows", "body_flat_slot",
            "body_leaf_row", "m_export_rows", "m_import_pos",
            "q_export_rows", "q_import_pos", "p2m_tab", "l2p_tab",
            "m2p_rows", "m2p_tslot", "m2p_isig", "m2p_center",
            "p2p_src_col", "p2p_tgt_loc",
            "src_leaf_mask", "body_dnorm", "body_inv_sigma",
            "m_exp_intra", "m_exp_inter", "q_exp_intra", "q_exp_inter",
        }
        sharded_trees = {
            "m2l_bsum", "panels", "fields", "src_leaf_fields",
            "tgt_leaf_fields",
        }

        # sharded leading axis: over both mesh axes on a 2-D mesh
        # (flattened device order is outer-major)
        SH = P((self.AXIS_DCN, AX)) if self.ndcn > 1 else P(AX)

        def spec_of(k):
            if k in ("lvl_loc",):
                return jax.tree_util.tree_map(lambda a: SH, dd[k])
            if k in ("lvl_sh",):
                return jax.tree_util.tree_map(lambda a: P(), dd[k])
            if k in sharded_keys:
                return SH
            if k in sharded_trees:
                return jax.tree_util.tree_map(lambda a: SH, dd[k])
            return jax.tree_util.tree_map(lambda a: P(), dd[k]) \
                if isinstance(dd[k], (dict, tuple, list)) else P()

        in_specs = ({k: spec_of(k) for k in dd}, SH)
        out_specs = SH
        nb_max = self.nb_max
        cdim = self.cdim

        def body(dloc, q):
            # squeeze the device axis off every sharded leaf ([1, ...]
            # blocks of the stacked [ndev, ...] tables); the charge
            # block arrives as [nb_max(, cdim)] (axis split, not
            # indexed) and the result block [nb_max, rdim] reassembles
            # to [ndev*nb_max, rdim] under out_specs
            def squeeze(spec_tree, val_tree):
                return jax.tree_util.tree_map(
                    lambda s, v: v[0] if s == SH else v,
                    spec_tree,
                    val_tree,
                    is_leaf=lambda x: isinstance(x, P),
                )

            dsq = squeeze(in_specs[0], dloc)
            return self._local_matvec(dsq, q, p_eff, cW)

        fn = shard_map(
            body,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )

        apply_fn = jax.jit(fn)

        self._fn_cache[key] = (apply_fn, dd)
        if len(self._fn_cache) > 6:
            self._fn_cache.pop(next(iter(self._fn_cache)))
        return self._fn_cache[key]

    # ------------------------------------------------------------------
    # layout conversion + public API
    # ------------------------------------------------------------------
    def to_padded(self, q):
        """User-order charges -> padded sharded Morton layout."""
        plan = self.plan
        qm = np.asarray(q)[plan.src.tree.perm]
        cdim = self.cdim
        shape = (
            (self.ndev * self.nb_max,)
            if cdim == 1
            else (self.ndev * self.nb_max, cdim)
        )
        out = np.zeros(shape, qm.dtype)
        for d in range(self.ndev):
            lo, hi = self.dev_lo[d], self.dev_hi[d]
            out[d * self.nb_max : d * self.nb_max + (hi - lo)] = qm[lo:hi]
        return jnp.asarray(out, self.dtype)

    def from_padded(self, x):
        """Padded sharded results -> user order [n, rdim]."""
        plan = self.plan
        x = np.asarray(x)
        n = plan.src.tree.num_bodies
        out_m = np.zeros((n,) + x.shape[1:], x.dtype)
        for d in range(self.ndev):
            lo, hi = self.dev_lo[d], self.dev_hi[d]
            out_m[lo:hi] = x[d * self.nb_max : d * self.nb_max + (hi - lo)]
        inv = np.argsort(plan.src.tree.perm)
        return out_m[inv]

    def apply(self, q, p=None):
        """One distributed matvec; user-order in/out (test oracle)."""
        p = int(p if p is not None else self.plan.config.max_p)
        fn, dd = self.matvec_fn(p)
        qp = self.to_padded(q)
        return self.from_padded(fn(dd, qp))

    def solver_ops(self):
        """(matvec, operand_for_p, to_padded, from_padded) for
        gmres_device: vectors live in the padded sharded Morton layout
        (zero padding is dot-product safe)."""
        rdim, cdim = self.rdim, self.cdim

        def operand_for_p(p):
            # operand is the (pytree-of-arrays) device data only; the
            # compiled shard_map fn is recovered from the static p
            _, dd = self.matvec_fn(int(p))
            return dd

        def matvec(operand, x, p):
            fn, _ = self.matvec_fn(int(p))
            q = x if cdim == 1 else x.reshape(-1, cdim)
            out = fn(operand, q)
            return out[:, 0] if rdim == 1 else out.reshape(-1)

        return matvec, operand_for_p

    def stats(self):
        """Per-device memory/work accounting (the scaling evidence)."""
        import math

        nd = self.ndev
        panel_bytes = 0
        if self.use_panels:
            panels, _ = self._near_panels_local(
                self.plan._flipped_fields()[0]
                if self.flipped
                else self.plan.src.fields
            )
            # panels["A"] is ONE stacked [ndev, Cmax, KTr, Lb] array
            # (uniform chunks, round 4); per-device state is the slice
            A = panels["A"]
            panel_bytes = int(np.prod(A.shape[1:])) * A.dtype.itemsize
        W = self.plan.kernel.width(self.plan.config.max_p)
        cW = self.plan.kernel.ncomp * W
        itemsize = jnp.dtype(self.dtype).itemsize
        return {
            "ndev": nd,
            "bodies_per_dev": self.nb_max,
            "own_boxes_max": self.n_own_max,
            "shared_boxes": self.n_sh,
            "halo_boxes_max": self.n_imp_max,
            "halo_leaves_max": self.n_limp_max,
            "m2l_pairs_per_dev": int(self.m2l_ntile)
            * self.plan.m2l_tile_size,
            "near_panel_bytes_per_dev": int(panel_bytes),
            "expansion_bytes_per_dev": int(self.R * cW * itemsize),
            "halo_multipole_bytes": int(
                self.ndev * self.n_bexp_max * cW * itemsize
            ),
            "halo_charge_bytes": int(
                self.ndev * self.n_lexp_max * self.K * self.cdim * itemsize
            ),
        }
