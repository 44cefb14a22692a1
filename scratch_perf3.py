"""Perf experiment 3: bucket_sum alternatives + slot-space p2m/near."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import fmm_bem_tpu  # noqa: F401
from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import FMMConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel

REC = int(sys.argv[1]) if len(sys.argv) > 1 else 8
P = 5
CHAIN = 20
ITERS = 3

tris = unit_sphere(REC)
fields = make_panels(tris, K=3)
plan = FmmPlan(
    LaplaceBEMKernel(K=3), fields,
    FMMConfig(ncrit=64, dtype="float32", max_p=8),
)
print(f"n={plan.tree.num_bodies}", flush=True)

d = plan.device_data(P)
aux = plan.variant_aux(P)
sf = plan.device_fields()
meta = plan._near_meta
n = plan.tree.num_bodies
kern = plan.kernel
cW = kern.ncomp * kern.width(P)
TS = plan.m2l_tile_size
npairs_pad = len(plan.m2l_tile_src)
ntile = npairs_pad // TS
nbox = plan.tree.num_boxes
qm0 = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)


def mix(x, out):
    s = out
    while s.ndim > 0:
        s = s.sum(axis=-1) if s.ndim > 1 else s.sum()
    return x * (1.0 + 1e-30 * s)


def timed(label, body, extra=None):
    args = (d, aux, sf, qm0) if extra is None else (d, aux, sf, qm0, extra)

    def run_(d_, aux_, sf_, x, *e):
        def step(x, _):
            return mix(x, body(d_, aux_, sf_, x, *e)), None
        y, _ = jax.lax.scan(step, x, None, length=CHAIN)
        return y
    run = jax.jit(run_)
    np.asarray(run(*args))
    t0 = time.time()
    for _ in range(ITERS):
        np.asarray(run(*args))
    ms = max((time.time() - t0) / ITERS - t_base, 0.0) / CHAIN * 1e3
    print(f"{label:44s} {ms:8.3f} ms", flush=True)
    return ms


@jax.jit
def ident(x):
    return x * 1.0000001


np.asarray(ident(qm0))
t0 = time.time()
for _ in range(ITERS):
    np.asarray(ident(qm0))
t_base = (time.time() - t0) / ITERS
print(f"baseline {t_base*1e3:.1f}", flush=True)


def upward(d_, aux_, sf_, x):
    qm = x[d_["s_perm"]]
    M = plan._phase_p2m(d_, aux_, sf_, qm, P)
    return plan._phase_m2m(d_, M)


def m2l_matmul(d_, aux_, sf_, x):
    M = upward(d_, aux_, sf_, x)
    Mg = M[d_["m2l_tile_src"]].reshape(ntile, TS, cW)
    mats = d_["m2l_mats"][d_["m2l_tile_cls"]]
    outp = jnp.einsum("tpw,tvw->tpv", Mg, mats).reshape(npairs_pad, cW)
    return outp * d_["m2l_tile_scale"][:, None]


# --- current bucket_sum
from fmm_bem_tpu.ops.bucket_sum import bucket_sum_apply


def m2l_cur(d_, aux_, sf_, x):
    return bucket_sum_apply(d_["m2l_bsum"], m2l_matmul(d_, aux_, sf_, x))


# --- flattened-index bucket_sum
def bs_flat(dev, x):
    xz = jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)], axis=0)
    parts = []
    for idx in dev["idx"]:
        r_b, m_b = idx.shape
        g = xz[idx.reshape(-1)].reshape(r_b, m_b, -1)
        parts.append(g.sum(axis=1))
    parts.append(jnp.zeros((1,) + x.shape[1:], x.dtype))
    return jnp.concatenate(parts, axis=0)[dev["inv_order"]]


def m2l_flat(d_, aux_, sf_, x):
    return bs_flat(d_["m2l_bsum"], m2l_matmul(d_, aux_, sf_, x))


# --- sort + slab bucket_sum (host build here, device apply)
targets = np.asarray(plan.m2l_tile_tgt)
nrows = nbox
keep = targets < nrows
pos = np.arange(len(targets), dtype=np.int64)[keep]
tg = targets[keep]
order = np.argsort(tg, kind="stable")
tg_s, pos_s = tg[order], pos[order]
row_ptr = np.searchsorted(tg_s, np.arange(nrows + 1))
m_per = np.diff(row_ptr)
edges = [e for e in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)
         if e <= m_per.max()]
if not edges or edges[-1] < m_per.max():
    edges = list(edges) + [int(m_per.max())]
slab_buckets = []
order_rows = []
lo = 0
for hi in edges:
    sel = np.where((m_per > lo) & (m_per <= hi))[0]
    lo = hi
    if len(sel) == 0:
        continue
    starts = row_ptr[sel].astype(np.int32)
    cnt = m_per[sel].astype(np.int32)
    slab_buckets.append((jnp.asarray(starts), jnp.asarray(cnt), hi))
    order_rows.append(sel)
order_rows = np.concatenate(order_rows)
inv_order2 = np.full(nrows, len(order_rows), np.int32)
inv_order2[order_rows] = np.arange(len(order_rows), dtype=np.int32)
sort_pos = jnp.asarray(pos_s.astype(np.int32))
inv_order2 = jnp.asarray(inv_order2)
print("slab buckets:", [(len(np.asarray(s)), hi) for s, c, hi in
                        slab_buckets], flush=True)


def bs_slab(x):
    xs = x[sort_pos]  # row permutation gather [Pk, cW]
    mx = max(hi for _, _, hi in slab_buckets)
    xs = jnp.concatenate(
        [xs, jnp.zeros((mx, x.shape[1]), x.dtype)], axis=0)
    parts = []
    for starts, cnt, hi in slab_buckets:
        g = jax.vmap(
            lambda s: jax.lax.dynamic_slice(xs, (s, 0), (hi, x.shape[1]))
        )(starts)
        msk = (jnp.arange(hi)[None, :] < cnt[:, None])
        parts.append(jnp.sum(g * msk[..., None], axis=1))
    parts.append(jnp.zeros((1, x.shape[1]), x.dtype))
    return jnp.concatenate(parts, axis=0)[inv_order2]


def m2l_slab(d_, aux_, sf_, x):
    return bs_slab(m2l_matmul(d_, aux_, sf_, x))


timed("m2l full: current bucket_sum", m2l_cur)
timed("m2l full: flattened-idx bucket_sum", m2l_flat)
timed("m2l full: sort+slab bucket_sum", m2l_slab)

# correctness of slab vs current
o1 = jax.jit(lambda d_, x: bucket_sum_apply(
    d_["m2l_bsum"], m2l_matmul(d_, aux, sf, x)))(d, qm0)
o2 = jax.jit(lambda d_, x: bs_slab(m2l_matmul(d_, aux, sf, x)))(d, qm0)
err = float(jnp.max(jnp.abs(o1 - o2)) / (jnp.max(jnp.abs(o1)) + 1e-30))
print(f"slab vs current rel err {err:.2e}", flush=True)

# --- slot-space p2m + near-ql (preview of the refactor)
starts_leaf = jnp.asarray(
    plan.src.tree.box_body_start[plan.src.leaf_ids].astype(np.int32))
Kpad = plan.src.leaf_pad
maskl = jnp.asarray(plan.src.leaf_body_mask)


def slab_tiles(qm):
    qz = jnp.concatenate([qm, jnp.zeros(Kpad, qm.dtype)])
    g = jax.vmap(lambda s: jax.lax.dynamic_slice(qz, (s,), (Kpad,)))(
        starts_leaf)
    return g * maskl


def p2m_slot(d_, aux_, sf_, x):
    qm = x[d_["s_perm"]]
    tiles = slab_tiles(qm)  # [nl, K]
    tab = aux_["p2m_tab"]
    ct = tab[d_["s_leaf_body_idx"]]  # row gather (fast class)
    ct = jnp.where(d_["s_leaf_body_mask"][..., None], ct, 0.0)
    contrib = tiles[..., None] * ct
    st = plan.src.tree
    return (
        jnp.zeros((st.num_boxes, cW), jnp.float32)
        .at[d_["s_leaf_ids"]]
        .set(jnp.sum(contrib, axis=1))
    )


timed("p2m: slab tiles + row-gathered tab", p2m_slot)
e1 = jax.jit(lambda d_, x: plan._phase_p2m(
    d_, aux, sf, x[d_["s_perm"]], P))(d, qm0)
e2 = jax.jit(lambda d_, x: p2m_slot(d_, aux, sf, x))(d, qm0)
err = float(jnp.max(jnp.abs(e1 - e2)) / (jnp.max(jnp.abs(e1)) + 1e-30))
print(f"p2m slot vs current rel err {err:.2e}", flush=True)
