"""Perf experiment: localize near-field + M2L time at 131k panels (TPU).

Times variants of the near-field contraction and the M2L pipeline with
the chained-scan delta method (tunnel-safe). Not part of the package.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import fmm_bem_tpu  # noqa: F401  (forces matmul precision)
from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import FMMConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel

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

A_bytes = sum(int(np.prod(A.shape)) * 4 for A in panels["A"])
print("bucket shapes:", [tuple(A.shape) for A in panels["A"]])
print(f"A bytes total {A_bytes/1e9:.3f} GB -> floor at 819GB/s = "
      f"{A_bytes/819e9*1e3:.2f} ms", flush=True)


def mix(x, out):
    s = out
    while s.ndim > 0:
        s = s.sum(axis=-1) if s.ndim > 1 else s.sum()
    return x * (1.0 + 1e-30 * s)


def timed(label, body, *args):
    """body(d_, aux_, sf_, x) -> out; chained scan, delta-based ms/step."""
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
    dt = (time.time() - t0) / ITERS
    ms = max(dt - t_base, 0.0) / CHAIN * 1e3
    print(f"{label:32s} {ms:8.3f} ms", flush=True)
    return ms


@jax.jit
def ident(x):
    return x * 1.0000001


np.asarray(ident(qm0))
t0 = time.time()
for _ in range(ITERS):
    np.asarray(ident(qm0))
t_base = time.time() - t0
t_base /= ITERS
print(f"baseline transfer {t_base*1e3:.1f} ms", flush=True)


# ---------------- near-field variants ----------------
from fmm_bem_tpu.ops.near_panel import LEAF_TILE, panel_matvec


def make_ql(d_, x):
    qm = x[d_["s_perm"]]
    qg = qm[d_["s_leaf_body_idx"]]
    return jnp.where(d_["s_leaf_body_mask"], qg, 0.0)


def near_now(d_, aux_, sf_, x):
    qm = x[d_["s_perm"]]
    return plan._near_pass(d_, aux_["panels"], sf_, qm)


def contract_pallas_bl(bl):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def contract(A, x):
        nl_b, KTr, L = A.shape
        pad = (-nl_b) % bl
        if pad:
            A = jnp.pad(A, ((0, pad), (0, 0), (0, 0)))
            x = jnp.pad(x, ((0, pad), (0, 0)))
        grid = ((nl_b + pad) // bl,)

        def kern(a_ref, x_ref, o_ref):
            o_ref[:] = jnp.sum(a_ref[:] * x_ref[:][:, None, :], axis=2)

        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bl, KTr, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bl, L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bl, KTr), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nl_b + pad, KTr), A.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * (nl_b + pad) * KTr * L,
                bytes_accessed=(nl_b + pad) * KTr * L * 4,
                transcendentals=0,
            ),
        )(A, x)
        return out[:nl_b]
    return contract


def contract_dot(A, x):
    # batched matvec on MXU
    return jax.lax.dot_general(
        A, x, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def near_variant(contract):
    KSc = meta.KS * meta.cdim

    def body(d_, aux_, sf_, x):
        ql = make_ql(d_, x)
        pans = aux_["panels"]
        xq = jnp.concatenate([ql, jnp.zeros((1, KSc), ql.dtype)], axis=0)
        outs = []
        for A, pidx in zip(pans["A"], pans["pidx"]):
            m_b = pidx.shape[1]
            xb = xq[pidx].reshape(pidx.shape[0], m_b * KSc)
            Lb = A.shape[2]
            if Lb > m_b * KSc:
                xb = jnp.pad(xb, ((0, 0), (0, Lb - m_b * KSc)))
            outs.append(contract(A, xb))
        KTr = meta.KT * meta.rdim
        out = jnp.concatenate(
            outs + [jnp.zeros((1, KTr), ql.dtype)], axis=0)
        return out[pans["inv_order"]]
    return body


def near_gather_only(d_, aux_, sf_, x):
    ql = make_ql(d_, x)
    pans = aux_["panels"]
    KSc = meta.KS * meta.cdim
    xq = jnp.concatenate([ql, jnp.zeros((1, KSc), ql.dtype)], axis=0)
    outs = []
    for A, pidx in zip(pans["A"], pans["pidx"]):
        xb = xq[pidx]
        outs.append(xb.sum(axis=(1, 2), keepdims=False)[:, None])
    return jnp.concatenate(outs, axis=0)


timed("near: current (_near_pass)", near_now)
timed("near: gather-xb only", near_gather_only)
timed("near: einsum", near_variant(lambda A, x: jnp.einsum(
    "lts,ls->lt", A, x)))
timed("near: pallas bl=8", near_variant(contract_pallas_bl(8)))
timed("near: pallas bl=16", near_variant(contract_pallas_bl(16)))
timed("near: pallas bl=32", near_variant(contract_pallas_bl(32)))
timed("near: dot_general", near_variant(contract_dot))


# ---------------- M2L pipeline decomposition ----------------
from fmm_bem_tpu.ops.bucket_sum import bucket_sum_apply

TS = plan.m2l_tile_size
npairs_pad = len(plan.m2l_tile_src)
kern = plan.kernel
cW = kern.ncomp * kern.width(P)
ntile = npairs_pad // TS
print(f"m2l: npairs={npairs_pad} TS={TS} cW={cW} ntile={ntile} "
      f"nmats={np.asarray(d['m2l_mats']).shape}", flush=True)


def upward(d_, aux_, sf_, x):
    qm = x[d_["s_perm"]]
    M = plan._phase_p2m(d_, aux_, sf_, qm, P)
    return plan._phase_m2m(d_, M)


def m2l_gather(d_, aux_, sf_, x):
    M = upward(d_, aux_, sf_, x)
    return M[d_["m2l_tile_src"]].reshape(ntile, TS, cW)


def m2l_matmul(d_, aux_, sf_, x):
    Mg = m2l_gather(d_, aux_, sf_, x)
    mats = d_["m2l_mats"][d_["m2l_tile_cls"]]
    outp = jnp.einsum("tpw,tvw->tpv", Mg, mats).reshape(npairs_pad, cW)
    return outp * d_["m2l_tile_scale"][:, None]


def m2l_full(d_, aux_, sf_, x):
    outp = m2l_matmul(d_, aux_, sf_, x)
    return bucket_sum_apply(d_["m2l_bsum"], outp)


t_up = timed("m2l: upward only (p2m+m2m)", upward)
timed("m2l: +gather", m2l_gather)
timed("m2l: +matmul+scale", m2l_matmul)
timed("m2l: +bucket_sum (full)", m2l_full)
