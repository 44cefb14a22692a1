"""FMM execution plan: tree + interaction lists + batched device matvec.

TPU-native re-design of the reference execution layer
(include/FMM_plan.hpp + include/executor/ExecutorSingleTree.hpp +
EvalInteractionLazy*.hpp): one host-side *plan build* materialises every
charge-independent structure — the octree, the traversal lists, the
translation-class grouping, per-body normalised offsets — and the
per-iteration matvec is a single jitted function replaying them as
batched XLA ops:

    P2M   segment-sum of per-body harmonic contributions into leaves
    M2M   8 octant-class matmuls per level, bottom-up
    M2L   one dense [pairs, W] x [W, W] matmul per translation class
          (scale-normalised classes are shared across levels), then one
          segment-sum into target locals
    L2L   8 octant-class matmuls per level, top-down
    L2P   per-body expansion evaluation (forces by autodiff)
    M2P   treecode far-field path / fallback for level-skewed pairs
    P2P   leaf-pair tiles over padded per-leaf body lists

The relaxation hook (`K.set_p(p)` in the reference, GMRES.hpp:195-196)
becomes a *static* argument: ``apply(charges, p)`` jit-compiles one
specialisation per requested order, slicing all term dimensions to
p(p+1)/2 — smaller p genuinely costs less, with no table rebuilds.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fmm_bem_tpu.config import Evaluator, FMMConfig
from fmm_bem_tpu.tree.octree import Tree, build_tree
from fmm_bem_tpu.traversal.lists import InteractionLists, build_interaction_lists


def _seg_sum(x, ids, num):
    return jax.ops.segment_sum(x, ids, num_segments=num)


@dataclasses.dataclass
class _ClassedPairs:
    """M2L pairs grouped by scale-normalised translation class."""

    #: per-class numpy arrays of source/target box ids
    src: list
    tgt: list
    #: per-class per-pair kernel scale factor (e.g. 1/sigma_src)
    scale: list
    #: stacked real translation matrices [ncls, W, W]
    mats: np.ndarray


class FmmPlan:
    """Single-tree FMM/treecode matvec plan for a kernel.

    Parameters
    ----------
    kernel : kernel object (LaplaceKernel, ...) following the batched
        operator protocol (p2m / l2p / m2p / p2p + *_matrix builders).
    fields : dict of per-source numpy arrays; must contain "xyz" [N,3].
        Extra arrays (panel normals, areas, ...) are permuted into
        Morton order and passed to the kernel's batched operators.
    config : FMMConfig.
    """

    def __init__(self, kernel, fields, config: Optional[FMMConfig] = None):
        self.kernel = kernel
        self.config = config or FMMConfig()
        cfg = self.config

        xyz = np.asarray(fields["xyz"], dtype=np.float64)
        self.tree: Tree = build_tree(xyz, cfg.ncrit, cfg.max_level)
        treecode = cfg.evaluator == Evaluator.TREECODE
        self.lists: InteractionLists = build_interaction_lists(
            self.tree, cfg.theta, treecode=treecode
        )
        self.fields = {
            k: np.asarray(v)[self.tree.perm] for k, v in fields.items()
        }
        self._build_host_structures()
        self._apply_cache = {}

    # ------------------------------------------------------------------
    # host-side build
    # ------------------------------------------------------------------
    def _build_host_structures(self):
        t = self.tree
        kern = self.kernel
        pmax = self.config.max_p
        n = t.num_bodies

        # ---- leaves: padded body lists (bounded by ncrit, ref Octree leaf
        # criterion) so P2P/M2P tiles are rectangular
        leaves = t.leaves
        self.leaf_ids = leaves.astype(np.int32)
        nl = len(leaves)
        self.box_to_slot = np.full(t.num_boxes, -1, dtype=np.int32)
        self.box_to_slot[leaves] = np.arange(nl, dtype=np.int32)
        K = int(t.box_body_count[leaves].max())
        self.leaf_pad = K
        self.leaf_body_idx = np.zeros((nl, K), dtype=np.int32)
        self.leaf_body_mask = np.zeros((nl, K), dtype=bool)
        counts = t.box_body_count[leaves]
        starts = t.box_body_start[leaves]
        pos = np.arange(K)[None, :]
        self.leaf_body_mask = pos < counts[:, None]
        self.leaf_body_idx = np.where(
            self.leaf_body_mask, starts[:, None] + pos, 0
        ).astype(np.int32)
        # body -> (leaf slot, position) flattened index for gather-out
        slot_of_body = self.box_to_slot[t.body_leaf]
        pos_of_body = np.arange(n) - t.box_body_start[t.body_leaf]
        self.body_flat_slot = (slot_of_body * K + pos_of_body).astype(np.int32)

        # ---- per-body normalised offsets (P2M and L2P share them in the
        # single-tree case)
        sigma_b = t.box_radius[t.body_leaf]
        self.body_dnorm = (t.points - t.box_center[t.body_leaf]) / sigma_b[:, None]
        self.body_inv_sigma = 1.0 / sigma_b
        self.body_leaf_box = t.body_leaf.astype(np.int32)

        # ---- M2M / L2L octant classes.  For scale-invariant kernels
        # (Laplace family) the 8 octant matrices are shared across all
        # levels; otherwise (e.g. Yukawa, whose screened operators are
        # level-dependent) one set of 8 is built per level.
        scale_inv = getattr(kern, "scale_invariant", True)
        self.m2m_levels = []  # [(class_id -> (child_ids, parent_ids, mat_idx))]
        child_boxes = np.arange(1, t.num_boxes, dtype=np.int32)
        if len(child_boxes):
            par = t.box_parent[child_boxes]
            off = t.box_center[child_boxes] - t.box_center[par]
            octant = (
                (off[:, 0] > 0).astype(np.int32)
                + 2 * (off[:, 1] > 0).astype(np.int32)
                + 4 * (off[:, 2] > 0).astype(np.int32)
            )
        m2m_mats = []
        l2l_mats = []
        mat_key = {}  # (lvl-or-None, octant) -> index into mats
        for lvl in range(1, t.num_levels):
            lo, hi = t.level_offset[lvl], t.level_offset[lvl + 1]
            ids = child_boxes[(child_boxes >= lo) & (child_boxes < hi)]
            per_class = []
            for c in range(8):
                sel = ids[octant[ids - 1] == c]
                if len(sel) == 0:
                    per_class.append(None)
                    continue
                key = (None if scale_inv else lvl, c)
                if key not in mat_key:
                    b = int(sel[0])
                    pb = int(t.box_parent[b])
                    sig_c = t.box_radius[b]
                    sig_p = t.box_radius[pb]
                    drm = t.box_center[pb] - t.box_center[b]
                    mat_key[key] = len(m2m_mats)
                    m2m_mats.append(kern.m2m_matrix(drm, sig_c, sig_p, pmax))
                    l2l_mats.append(kern.l2l_matrix(-drm, sig_p, sig_c, pmax))
                per_class.append(
                    (
                        sel.astype(np.int32),
                        t.box_parent[sel].astype(np.int32),
                        mat_key[key],
                    )
                )
            self.m2m_levels.append(per_class)
        W = kern.width(pmax)
        if not m2m_mats:
            m2m_mats = [np.eye(W)]
            l2l_mats = [np.eye(W)]
        self.m2m_mats = np.stack(m2m_mats)
        self.l2l_mats = np.stack(l2l_mats)

        # ---- M2L translation classes + skew fallback to M2P
        self._build_m2l_classes()

        # ---- P2P pairs as leaf-slot pairs
        pp = self.lists.p2p_pairs
        self.p2p_src_slot = self.box_to_slot[pp[:, 0]].astype(np.int32)
        self.p2p_tgt_slot = self.box_to_slot[pp[:, 1]].astype(np.int32)

        # ---- optional precomputed sparse near field (the array form of
        # EvalInteractionLazySparse's CSR, the default BEM path): entry
        # values are charge-independent, branchy (singular quadrature),
        # and p-independent -> assembled once on the host
        self.near_rows = self.near_cols = self.near_vals = None
        if getattr(kern, "near_sparse", False):
            rows, cols = [], []
            for s, tg in self.lists.p2p_pairs:
                ts, tc = t.box_body_start[tg], t.box_body_count[tg]
                ss, sc = t.box_body_start[s], t.box_body_count[s]
                tb = np.arange(ts, ts + tc, dtype=np.int32)
                sb = np.arange(ss, ss + sc, dtype=np.int32)
                rows.append(np.repeat(tb, sc))
                cols.append(np.tile(sb, tc))
            rows = np.concatenate(rows) if rows else np.zeros(0, np.int32)
            cols = np.concatenate(cols) if cols else np.zeros(0, np.int32)
            order = np.argsort(rows, kind="stable")
            rows, cols = rows[order], cols[order]
            self.near_rows = rows
            self.near_cols = cols
            self.near_vals = kern.near_values(self.fields, rows, cols)

    def _build_m2l_classes(self):
        t = self.tree
        kern = self.kernel
        pmax = self.config.max_p
        pairs = self.lists.m2l_pairs
        m2p_extra_s = []
        m2p_extra_t = []

        if len(pairs):
            s, tg = pairs[:, 0], pairs[:, 1]
            sig_s = t.box_radius[s]
            sig_t = t.box_radius[tg]
            # route pairs whose target is much larger than the source to
            # the M2P path: their normalised offsets are unbounded and
            # would explode the class count
            skew = sig_t > 2.0 * sig_s + 1e-12
            if skew.any():
                from fmm_bem_tpu.traversal.lists import expand_to_leaves

                leaves, rows = expand_to_leaves(t, tg[skew])
                m2p_extra_s.append(s[skew][rows])
                m2p_extra_t.append(leaves)
                s, tg, sig_s, sig_t = (
                    s[~skew],
                    tg[~skew],
                    sig_s[~skew],
                    sig_t[~skew],
                )
        else:
            s = np.zeros(0, dtype=np.int32)
            tg = s
            sig_s = np.zeros(0)
            sig_t = sig_s

        scale_inv = getattr(kern, "scale_invariant", True)
        src_list, tgt_list, scale_list, mats = [], [], [], []
        if len(s):
            offn = (t.box_center[tg] - t.box_center[s]) / sig_s[:, None]
            dlvl = (
                t.box_level[s].astype(np.int64)
                - t.box_level[tg].astype(np.int64)
                + 8
            )
            # non-scale-invariant kernels (Yukawa) need distinct
            # matrices per absolute level, not just per level gap
            lkey = dlvl if scale_inv else (
                dlvl * 16 + t.box_level[s].astype(np.int64)
            )
            ki = np.round(offn * 64.0).astype(np.int64) + 4096
            assert (ki >= 0).all() and (ki < 8192).all(), "M2L offset overflow"
            key = ((lkey * 8192 + ki[:, 0]) * 8192 + ki[:, 1]) * 8192 + ki[:, 2]
            uniq, inv = np.unique(key, return_inverse=True)
            order = np.argsort(inv, kind="stable")
            bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
            for ci in range(len(uniq)):
                sel = order[bounds[ci] : bounds[ci + 1]]
                rep = sel[0]
                drm = t.box_center[tg[rep]] - t.box_center[s[rep]]
                mats.append(
                    kern.m2l_matrix(drm, sig_s[rep], sig_t[rep], pmax)
                )
                src_list.append(s[sel].astype(np.int32))
                tgt_list.append(tg[sel].astype(np.int32))
                scale_list.append(kern.m2l_pair_scale(sig_s[sel]))
        W = kern.width(pmax)
        mats_arr = np.stack(mats) if mats else np.zeros((0, W, W))
        self.m2l_classes = _ClassedPairs(
            src=src_list, tgt=tgt_list, scale=scale_list, mats=mats_arr
        )

        # ---- M2P list: treecode far field + skew fallback
        mp = self.lists.m2p_pairs
        parts_s = [mp[:, 0]] + m2p_extra_s
        parts_t = [mp[:, 1]] + m2p_extra_t
        ms = np.concatenate(parts_s).astype(np.int32)
        mt = np.concatenate(parts_t).astype(np.int32)
        self.m2p_src = ms
        self.m2p_tgt_slot = self.box_to_slot[mt].astype(np.int32)
        self.m2p_inv_sigma = (
            1.0 / t.box_radius[ms] if len(ms) else np.zeros(0)
        )

    # ------------------------------------------------------------------
    # device data per p-tier
    # ------------------------------------------------------------------
    def _slice_mats(self, mats, p):
        """Prefix-truncate translation matrices to width(p) (degree-
        ordered layouts make lower p a prefix slice)."""
        W = self.kernel.width(p)
        return mats[..., :W, :W]

    def _device_data(self, p):
        cfg = self.config
        dt = jnp.dtype(cfg.dtype)
        t = self.tree
        d = {
            "xyz": jnp.asarray(t.points, dt),
            "perm": jnp.asarray(t.perm, jnp.int32),
            "body_dnorm": jnp.asarray(self.body_dnorm, dt),
            "body_inv_sigma": jnp.asarray(self.body_inv_sigma, dt),
            "body_leaf_box": jnp.asarray(self.body_leaf_box),
            "body_flat_slot": jnp.asarray(self.body_flat_slot),
            "leaf_body_idx": jnp.asarray(self.leaf_body_idx),
            "leaf_body_mask": jnp.asarray(self.leaf_body_mask),
            "m2m_mats": jnp.asarray(self._slice_mats(self.m2m_mats, p), dt),
            "l2l_mats": jnp.asarray(self._slice_mats(self.l2l_mats, p), dt),
            "m2l_mats": jnp.asarray(self._slice_mats(self.m2l_classes.mats, p), dt),
            "m2l_src": [jnp.asarray(a) for a in self.m2l_classes.src],
            "m2l_tgt": [jnp.asarray(a) for a in self.m2l_classes.tgt],
            "m2l_scale": [jnp.asarray(a, dt) for a in self.m2l_classes.scale],
            "p2p_src_slot": jnp.asarray(self.p2p_src_slot),
            "p2p_tgt_slot": jnp.asarray(self.p2p_tgt_slot),
            "m2p_src": jnp.asarray(self.m2p_src),
            "m2p_tgt_slot": jnp.asarray(self.m2p_tgt_slot),
            "m2p_inv_sigma": jnp.asarray(self.m2p_inv_sigma, dt),
            "box_center": jnp.asarray(t.box_center, dt),
        }
        if self.near_rows is not None:
            d["near_rows"] = jnp.asarray(self.near_rows)
            d["near_cols"] = jnp.asarray(self.near_cols)
            d["near_vals"] = jnp.asarray(self.near_vals, dt)
        return d

    def device_fields(self, fields=None):
        dt = jnp.dtype(self.config.dtype)
        src = self.fields if fields is None else fields
        return {
            k: jnp.asarray(v, dt)
            for k, v in src.items()
            if k != "vertices"  # host-only geometry
        }

    # ------------------------------------------------------------------
    # the matvec
    # ------------------------------------------------------------------
    def _matvec(self, d, fields, q, p):
        kern = self.kernel
        t = self.tree
        W = kern.width(p)
        nbox = t.num_boxes
        nl = len(self.leaf_ids)
        K = self.leaf_pad
        dt = jnp.dtype(self.config.dtype)
        d = dict(d)
        d["fields"] = fields

        qm = jnp.asarray(q, dt)[d["perm"]]

        # ---- P2M (ref EvalInteractionLazy.hpp:254-260, batched)
        contrib = kern.p2m(d["fields"], qm, d["body_dnorm"], d["body_inv_sigma"], p)
        M = _seg_sum(contrib, d["body_leaf_box"], nbox)  # [B, ncomp, W]
        ncomp = M.shape[1]

        # ---- M2M bottom-up (level-synchronous octant-class matmuls;
        # replaces the reference's serial child->parent walk)
        for lvl in range(t.num_levels - 1, 0, -1):
            per_class = self.m2m_levels[lvl - 1]
            for c in range(8):
                if per_class[c] is None:
                    continue
                child_np, parent_np, mi = per_class[c]
                ch = jnp.asarray(child_np)
                pa = jnp.asarray(parent_np)
                mc = M[ch].reshape(len(child_np) * ncomp, W)
                out = (mc @ d["m2m_mats"][mi].T).reshape(
                    len(child_np), ncomp, W
                )
                M = M.at[pa].add(out)

        res_dim = kern.result_dim
        res_m = jnp.zeros((t.num_bodies, res_dim), dt)

        # ---- M2L: per-class dense matmuls + one scatter-add
        if self.m2l_classes.src:
            Lparts = []
            tgts = []
            for ci in range(len(self.m2l_classes.src)):
                sidx = d["m2l_src"][ci]
                npair = sidx.shape[0]
                ms = M[sidx].reshape(npair * ncomp, W)
                out = (ms @ d["m2l_mats"][ci].T).reshape(npair, ncomp, W)
                out = out * d["m2l_scale"][ci][:, None, None]
                Lparts.append(out)
                tgts.append(d["m2l_tgt"][ci])
            Lall = jnp.concatenate(Lparts, axis=0)
            tall = jnp.concatenate(tgts, axis=0)
            L = _seg_sum(Lall, tall, nbox)
        else:
            L = jnp.zeros_like(M)

        if self.config.evaluator == Evaluator.FMM:
            # ---- L2L top-down
            for lvl in range(1, t.num_levels):
                per_class = self.m2m_levels[lvl - 1]
                for c in range(8):
                    if per_class[c] is None:
                        continue
                    child_np, parent_np, mi = per_class[c]
                    ch = jnp.asarray(child_np)
                    pa = jnp.asarray(parent_np)
                    lp = L[pa].reshape(len(parent_np) * ncomp, W)
                    out = (lp @ d["l2l_mats"][mi].T).reshape(
                        len(child_np), ncomp, W
                    )
                    L = L.at[ch].add(out)

            # ---- L2P at bodies
            Lb = L[d["body_leaf_box"]]
            res_m = res_m + kern.l2p(
                d["fields"], Lb, d["body_dnorm"], d["body_inv_sigma"], p
            )

        # ---- M2P (treecode far field and/or skew fallback)
        if len(self.m2p_src):
            res_m = res_m + self._m2p_pass(d, M, p, nl, K, dt)

        # ---- near field: precomputed sparse values (BEM) or direct P2P
        if self.near_rows is not None:
            if len(self.near_rows):
                res_m = res_m + kern.near_matvec(
                    d["near_vals"],
                    d["near_rows"],
                    d["near_cols"],
                    d["fields"],
                    qm,
                    t.num_bodies,
                )
        elif len(self.p2p_src_slot):
            res_m = res_m + self._p2p_pass(d, qm, nl, K, dt)

        # back to user ordering
        out = jnp.zeros_like(res_m).at[d["perm"]].set(res_m)
        return out

    def _m2p_pass(self, d, M, p, nl, K, dt):
        kern = self.kernel
        tgt_slots = d["m2p_tgt_slot"]
        src_ids = d["m2p_src"]
        npair = src_ids.shape[0]
        # bodies of each target leaf
        bidx = d["leaf_body_idx"][tgt_slots]  # [np, K]
        txyz = d["xyz"][bidx]  # [np, K, 3]
        centers = d["box_center"][src_ids]  # [np, 3]
        inv_sig = d["m2p_inv_sigma"]  # [np]
        dn = (txyz - centers[:, None, :]) * inv_sig[:, None, None]
        Ms = M[src_ids]  # [np, ncomp, 2, T]

        def one_pair(m, dnp, isig, fields_rows):
            mb = jnp.broadcast_to(m, (K,) + m.shape)
            return kern.m2p(fields_rows, mb, dnp, jnp.full((K,), isig, dt), p)

        fields_rows = {k: v[bidx] for k, v in d["fields"].items()}
        vals = jax.vmap(one_pair)(Ms, dn, inv_sig, fields_rows)  # [np, K, R]
        seg = _seg_sum(vals, tgt_slots, nl)  # [nl, K, R]
        return seg.reshape(nl * K, -1)[d["body_flat_slot"]]

    def _p2p_pass(self, d, qm, nl, K, dt):
        kern = self.kernel
        sslot = d["p2p_src_slot"]
        tslot = d["p2p_tgt_slot"]
        sbidx = d["leaf_body_idx"][sslot]  # [np, K]
        tbidx = d["leaf_body_idx"][tslot]
        smask = d["leaf_body_mask"][sslot]
        src_fields = {k: v[sbidx] for k, v in d["fields"].items()}
        tgt_fields = {k: v[tbidx] for k, v in d["fields"].items()}
        # charges may be scalar [N] or vector [N, c]; zero the padded slots
        qg = qm[sbidx]
        mask = smask if qg.ndim == 2 else smask[..., None]
        qg = jnp.where(mask, qg, 0.0)

        def one_pair(tf, sf, qrow, mrow):
            return kern.p2p_block(tf, sf, qrow, mrow)

        vals = jax.vmap(one_pair)(tgt_fields, src_fields, qg, smask)
        seg = _seg_sum(vals, tslot, nl)
        return seg.reshape(nl * K, -1)[d["body_flat_slot"]]

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def apply(self, charges, p=None, fields=None):
        """One FMM matvec at truncation order ``p`` (ref
        FMM_plan::execute, FMM_plan.hpp:75-90 + the set_p relaxation
        hook).  Compiles one specialisation per distinct p.

        ``fields`` overrides per-source arrays at call time (already in
        Morton order) — e.g. flipped BC flags to evaluate the RHS
        operator, replacing the reference's full plan rebuild
        (LaplaceBEM.cpp:218-232) with a pure input change.
        """
        p = int(p if p is not None else self.config.max_p)
        # the plan's buffers/matrices are allocated at config.max_p
        p = min(p, self.config.max_p)
        if p not in self._apply_cache:
            d = self._device_data(p)

            def f(fl, q):
                return self._matvec(d, fl, q, p)

            self._apply_cache[p] = jax.jit(f)
        return self._apply_cache[p](self.device_fields(fields), charges)

    def apply_flipped_bc(self, charges, p=None):
        """Matvec with every panel's BC flag flipped (the reference's
        switch_BC RHS trick) — same plan, same compiled executable."""
        fl = dict(self.fields)
        fl["bc"] = 1.0 - np.asarray(fl["bc"])
        return self.apply(charges, p=p, fields=fl)

    # alias matching the reference naming (FMM_plan::execute)
    execute = apply
