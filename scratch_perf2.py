"""Perf experiment 2: M2L pipeline decomposition + near-gather pieces."""
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
from fmm_bem_tpu.ops.bucket_sum import bucket_sum_apply

REC = int(sys.argv[1]) if len(sys.argv) > 1 else 8
P = 5
CHAIN = 20
ITERS = 3

t0 = time.time()
tris = unit_sphere(REC)
fields = make_panels(tris, K=3)
plan = FmmPlan(
    LaplaceBEMKernel(K=3), fields,
    FMMConfig(ncrit=64, dtype="float32", max_p=8),
)
print(f"build {time.time()-t0:.1f}s  n={plan.tree.num_bodies}", flush=True)

d = plan.device_data(P)
aux = plan.variant_aux(P)
sf = plan.device_fields()
meta = plan._near_meta
panels = aux["panels"]
n = plan.tree.num_bodies
qm0 = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)


def mix(x, out):
    s = out
    while s.ndim > 0:
        s = s.sum(axis=-1) if s.ndim > 1 else s.sum()
    return x * (1.0 + 1e-30 * s)


def timed(label, body):
    def run_(d_, aux_, sf_, x):
        def step(x, _):
            return mix(x, body(d_, aux_, sf_, x)), None
        y, _ = jax.lax.scan(step, x, None, length=CHAIN)
        return y
    run = jax.jit(run_)
    np.asarray(run(d, aux, sf, qm0))
    t0 = time.time()
    for _ in range(ITERS):
        np.asarray(run(d, aux, sf, qm0))
    ms = max((time.time() - t0) / ITERS - t_base, 0.0) / CHAIN * 1e3
    print(f"{label:40s} {ms:8.3f} ms", flush=True)
    return ms


@jax.jit
def ident(x):
    return x * 1.0000001


np.asarray(ident(qm0))
t0 = time.time()
for _ in range(ITERS):
    np.asarray(ident(qm0))
t_base = (time.time() - t0) / ITERS
print(f"baseline transfer {t_base*1e3:.1f} ms", flush=True)

# ---------------- near gather pieces ----------------
KSc = meta.KS * meta.cdim


def make_ql(d_, x):
    qm = x[d_["s_perm"]]
    qg = qm[d_["s_leaf_body_idx"]]
    return jnp.where(d_["s_leaf_body_mask"], qg, 0.0)


timed("near: make_ql only", lambda d_, a_, s_, x: make_ql(d_, x))


def xq_gather(d_, aux_, sf_, x):
    ql = make_ql(d_, x)
    xq = jnp.concatenate([ql, jnp.zeros((1, KSc), ql.dtype)], axis=0)
    outs = [xq[pidx].sum(axis=(1, 2))[:, None]
            for pidx in aux_["panels"]["pidx"]]
    return jnp.concatenate(outs, axis=0)


def xq_gather_pad64(d_, aux_, sf_, x):
    ql = make_ql(d_, x)
    pad = (-KSc) % 64
    xq = jnp.concatenate([ql, jnp.zeros((1, KSc), ql.dtype)], axis=0)
    xq = jnp.pad(xq, ((0, 0), (0, pad)))
    outs = [xq[pidx].sum(axis=(1, 2))[:, None]
            for pidx in aux_["panels"]["pidx"]]
    return jnp.concatenate(outs, axis=0)


timed("near: ql+xq[pidx] 63-wide", xq_gather)
timed("near: ql+xq[pidx] 64-pad", xq_gather_pad64)

# ---------------- M2L decomposition ----------------
TS = plan.m2l_tile_size
npairs_pad = len(plan.m2l_tile_src)
kern = plan.kernel
cW = kern.ncomp * kern.width(P)
ntile = npairs_pad // TS
nbox = plan.tree.num_boxes
print(f"m2l: npairs={npairs_pad} TS={TS} cW={cW} ntile={ntile} "
      f"nbox={nbox} nmats={np.asarray(d['m2l_mats']).shape} "
      f"bsum_idx={[tuple(np.asarray(i).shape) for i in d['m2l_bsum']['idx']]}",
      flush=True)


def upward(d_, aux_, sf_, x):
    qm = x[d_["s_perm"]]
    M = plan._phase_p2m(d_, aux_, sf_, qm, P)
    return plan._phase_m2m(d_, M)


def p2m_only(d_, aux_, sf_, x):
    qm = x[d_["s_perm"]]
    return plan._phase_p2m(d_, aux_, sf_, qm, P)


def m2l_gather(d_, aux_, sf_, x):
    M = upward(d_, aux_, sf_, x)
    return M[d_["m2l_tile_src"]].reshape(ntile, TS, cW)


def m2l_matmul(d_, aux_, sf_, x):
    Mg = m2l_gather(d_, aux_, sf_, x)
    mats = d_["m2l_mats"][d_["m2l_tile_cls"]]
    outp = jnp.einsum("tpw,tvw->tpv", Mg, mats).reshape(npairs_pad, cW)
    return outp * d_["m2l_tile_scale"][:, None]


def m2l_full(d_, aux_, sf_, x):
    return bucket_sum_apply(d_["m2l_bsum"], m2l_matmul(d_, aux_, sf_, x))


timed("p2m only", p2m_only)
timed("p2m+m2m (upward)", upward)
timed("upward+m2l gather", m2l_gather)
timed("upward+gather+matmul+scale", m2l_matmul)
timed("upward+...+bucket_sum (full m2l)", m2l_full)
