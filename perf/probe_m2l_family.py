"""Host-side probe: can the M2L pair list be regrouped into
(source-parent, target-parent) FAMILY pairs with a shared dense
[8W, 8W] class operator?

Presence predicate for combo (o_s, o_t) in family (sp, tp), derived from
the traversal's split order (equal sides -> split target, then source):
    present  iff  NOT MAC(sp, tc)  AND  MAC(sc, tc)
restricted to children that exist.  If that holds exactly, the combo
mask folds into the parent-offset class matrix and families of one
class share a dense [8W, 8W] operator.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.tree.octree import build_tree
from fmm_bem_tpu.traversal.lists import build_interaction_lists

rec = int(sys.argv[1]) if len(sys.argv) > 1 else 8
tris = unit_sphere(rec)
fields = make_panels(tris, K=3)
xyz = fields["xyz"]
print(f"panels: {len(xyz)}")

t0 = time.time()
tree = build_tree(xyz, ncrit=64)
lists = build_interaction_lists(tree, theta=0.5)
print(f"tree+lists {time.time()-t0:.1f}s  stats={lists.stats}")

theta = 0.5
inv_theta = 1.0 / theta

pairs = lists.m2l_pairs
s, t = pairs[:, 0], pairs[:, 1]
sl = tree.box_level[s]
tl = tree.box_level[t]
same = sl == tl
sp = tree.box_parent[s]
tp = tree.box_parent[t]
ok = same & (sp >= 0) & (tp >= 0)
print(f"same-level pairs: {ok.sum()}/{len(pairs)} ({100*ok.mean():.1f}%)")


def octant(b):
    par = tree.box_parent[b]
    off = tree.box_center[b] - tree.box_center[par]
    return ((off[:, 0] > 0).astype(np.int64)
            + 2 * (off[:, 1] > 0).astype(np.int64)
            + 4 * (off[:, 2] > 0).astype(np.int64))


os_ = octant(s[ok])
ot_ = octant(t[ok])
spo, tpo = sp[ok].astype(np.int64), tp[ok].astype(np.int64)

fam_key = spo * tree.num_boxes + tpo
uf, fam_inv = np.unique(fam_key, return_inverse=True)
print(f"families: {len(uf)}  pairs/family avg {ok.sum()/len(uf):.2f}")

combo = (os_ * 8 + ot_).astype(np.uint64)
mask = np.zeros(len(uf), dtype=np.uint64)
np.bitwise_or.at(mask, fam_inv, np.uint64(1) << combo)

fam_sp = (uf // tree.num_boxes).astype(np.int64)
fam_tp = (uf % tree.num_boxes).astype(np.int64)

# existing-children masks per parent (octant -> child box id or -1)
child_oct = np.full((tree.num_boxes, 8), -1, dtype=np.int64)
all_children = np.nonzero(tree.box_parent >= 0)[0]
co = octant(all_children)
child_oct[tree.box_parent[all_children], co] = all_children

sig = np.array([[1 if (o >> a) & 1 else -1 for a in range(3)]
                for o in range(8)], dtype=np.float64)

# geometric prediction, vectorized over families
rp = tree.box_radius[fam_sp]                      # parent half-side
rc = 0.5 * rp
d = tree.box_center[fam_tp] - tree.box_center[fam_sp]   # [F, 3]
cs = 0.5 * rp[:, None, None] * sig[None, :, :]    # [F, 8, 3] src child off
ct = d[:, None, :] + 0.5 * rp[:, None, None] * sig[None, :, :]  # tgt child
# MAC(sp, tc): |ct|^2 > ((rp + rc)/theta)^2
mac_sp_tc = (ct ** 2).sum(-1) > ((rp[:, None] + rc[:, None]) * inv_theta) ** 2
# MAC(sc, tc)
dd = ct[:, None, :, :] - cs[:, :, None, :]        # [F, 8s, 8t, 3]
mac_sc_tc = (dd ** 2).sum(-1) > ((2 * rc[:, None, None]) * inv_theta) ** 2
pred = (~mac_sp_tc[:, None, :]) & mac_sc_tc       # [F, 8s, 8t]

# restrict to existing children
s_exist = child_oct[fam_sp] >= 0                  # [F, 8]
t_exist = child_oct[fam_tp] >= 0
pred_exist = pred & s_exist[:, :, None] & t_exist[:, None, :]
pred_mask = (pred_exist.reshape(len(uf), 64)
             @ (1 << np.arange(64, dtype=np.uint64))).astype(np.uint64)

exact = (pred_mask == mask)
print(f"families where actual mask == predicted (pred & exist): "
      f"{exact.sum()}/{len(uf)} ({100*exact.mean():.2f}%)")
if not exact.all():
    bad = np.nonzero(~exact)[0][:5]
    for b in bad:
        print(f"  fam sp={fam_sp[b]} tp={fam_tp[b]} lvl="
              f"{tree.box_level[fam_sp[b]]} actual={mask[b]:016x} "
              f"pred={pred_mask[b]:016x}")

# class = quantized parent offset (+ level for non-scale-invariant)
offn = d / rp[:, None]
ki = np.round(offn * 8.0).astype(np.int64)
ckey = ((ki[:, 0] + 2048) * 4096 + ki[:, 1] + 2048) * 4096 + ki[:, 2] + 2048
uc = np.unique(ckey)
print(f"parent-offset classes (scale-invariant): {len(uc)}")
# with geometric masks folded in, same offset -> same pred (not pred_exist)
pm_full = (pred.reshape(len(uf), 64)
           @ (1 << np.arange(64, dtype=np.uint64))).astype(np.uint64)
chk = {}
bad_cls = 0
for c, m in zip(ckey, pm_full):
    if c in chk:
        if chk[c] != m:
            bad_cls += 1
    else:
        chk[c] = m
print(f"offset classes with inconsistent GEOMETRIC pred mask: {bad_cls}")

cnt = np.bincount(fam_inv)
print("pairs/family percentiles:",
      {q: int(np.percentile(cnt, q)) for q in (10, 50, 90, 99)})
print("residual cross-level pairs:", int((~ok).sum()))
