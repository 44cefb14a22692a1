"""
[timing note: the chain step consumes the FULL output sum —
a sliced consumer lets XLA dead-code most of the work]
In-situ decomposition of the (de-kron'd) M2L phase at bench scale.

Usage: python perf/probe_m2l.py [recursions] [p]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import FMMConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel
from fmm_bem_tpu.ops.bucket_sum import bucket_sum_apply

REC = int(sys.argv[1]) if len(sys.argv) > 1 else 8
P = int(sys.argv[2]) if len(sys.argv) > 2 else 5
TILE = int(sys.argv[3]) if len(sys.argv) > 3 else 32
CHAIN = 200
ITERS = 3
_BASE = None


def timed(name, fn, data, x0, bytes_=0, flops=0):
    global _BASE

    @jax.jit
    def run(data, x):
        def step(c, _):
            xm = x * (1.0 + 1e-12 * c)
            out = fn(data, xm)
            return out.astype(jnp.float32).sum() * 1e-20, None

        o, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=CHAIN)
        return o

    @jax.jit
    def ident(x):
        return x.reshape(-1)[:8].sum() * 1.0000001

    if _BASE is None:
        np.asarray(ident(x0))
        t0 = time.time()
        for _ in range(ITERS):
            np.asarray(ident(x0))
        _BASE = (time.time() - t0) / ITERS

    np.asarray(run(data, x0))
    t0 = time.time()
    for _ in range(ITERS):
        np.asarray(run(data, x0))
    dt = max((time.time() - t0) / ITERS - _BASE, 1e-9) / CHAIN
    line = f"{name:40s} {dt*1e3:8.3f} ms"
    if bytes_:
        line += f"  {bytes_/dt/1e9:7.1f} GB/s ({100*bytes_/dt/819e9:5.1f}%)"
    if flops:
        line += f"  {flops/dt/1e12:6.2f} TF/s"
    print(line, flush=True)
    return dt


def main():
    tris = unit_sphere(REC)
    fields = make_panels(tris, K=3)
    plan = FmmPlan(
        LaplaceBEMKernel(K=3), fields,
        FMMConfig(ncrit=64, dtype="float32", max_p=max(P, 10),
                  m2l_tile=TILE),
    )
    kern = plan.kernel
    W = kern.width(P)
    cW = kern.ncomp * W
    TS = plan.m2l_tile_size
    npairs_pad = len(plan.m2l_tile_src)
    ntile = npairs_pad // TS
    bs = plan.m2l_bsum
    nrows_g = sum(int(np.prod(i.shape)) for i in bs.idx)
    print(
        f"panels={len(tris)} p={P} cW={cW} TS={TS} "
        f"npairs_pad={npairs_pad} ntile={ntile} "
        f"bucket_rows={nrows_g} buckets={[i.shape for i in bs.idx]}",
        flush=True,
    )

    d = plan.device_data(P)
    aux = plan.variant_aux_slots(P)
    sf = plan.device_fields()
    ops = plan.solver_ops_slots()
    q0 = ops[2](jnp.ones(len(tris), jnp.float32))

    @jax.jit
    def mk_M(d_, aux_, sf_, q_):
        nl, K = len(plan.src.leaf_ids), plan.src.leaf_pad
        tab = aux_["p2m_tab_t"]
        contrib = q_[:, None] * tab
        M = (
            jnp.zeros((plan.src.tree.num_boxes, cW), jnp.float32)
            .at[d_["s_leaf_ids"]]
            .set(contrib.reshape(nl, K, cW).sum(axis=1))
        )
        return plan._phase_m2m(d_, M)

    M = jax.block_until_ready(mk_M(d, aux, sf, q0))

    timed("m2l full phase",
          lambda d_, M_: plan._phase_m2l(d_, M_, P), d, M,
          bytes_=(3 * npairs_pad * cW + ntile * W * W) * 4,
          flops=2.0 * npairs_pad * cW * W)

    timed("  gather Mg", lambda d_, M_: M_[d_["m2l_tile_src"]], d, M,
          bytes_=2 * npairs_pad * cW * 4)

    def g_einsum(d_, M_):
        Mg = M_[d_["m2l_tile_src"]].reshape(ntile, TS * kern.ncomp, W)
        mats = d_["m2l_mats"][d_["m2l_tile_cls"]]
        return jnp.einsum(
            "tpw,tvw->tpv", Mg, mats,
            preferred_element_type=jnp.float32,
        ).reshape(npairs_pad, cW)

    timed("  gather+einsum", g_einsum, d, M,
          flops=2.0 * npairs_pad * cW * W)

    outp = jax.block_until_ready(jax.jit(g_einsum)(d, M))
    timed("  bucket_sum alone",
          lambda d_, o: bucket_sum_apply(d_["m2l_bsum"], o * 1.0),
          d, outp,
          bytes_=2 * nrows_g * cW * 4)

    # ---- family path decomposition
    f = plan.m2l_fam
    if f is None:
        return
    nc = kern.ncomp
    Fpad = sum(len(a) for a in f.cls_sp)
    tbytes = sum(4 * (8 * W) ** 2 for _ in f.cls_sp)
    print(f"family: F={f.npairs} "
          f"Fpad={Fpad} nusp={f.nusp} nutp={f.nutp} "
          f"ncls={len(f.cls_sp)} T_bytes={tbytes/1e6:.1f} MB", flush=True)

    timed("  fam full", lambda d_, M_: plan._phase_m2l_family(d_, M_, P),
          d, M, flops=2.0 * Fpad * nc * (8 * W) ** 2)

    def stage(d_, M_):
        g = M_[d_["fam_src_child"]] * d_["fam_src_mask"][..., None]
        return (
            g.reshape(f.nusp, 8, nc, W)
            .transpose(0, 2, 1, 3)
            .reshape(f.nusp, nc * 8 * W)
        )

    timed("    fam stage Mfam", stage, d, M,
          bytes_=2 * f.nusp * 8 * cW * 4)
    Mfam = jax.block_until_ready(jax.jit(stage)(d, M))

    def cls_matmuls(d_, Mf):
        outs = []
        for ci, sp_rows in enumerate(d_["fam_cls_sp"]):
            rows = Mf[sp_rows]
            Tc = d_["fam_mats"][ci]
            out_c = rows.reshape(-1, 8 * W) @ Tc
            outs.append(out_c.reshape(-1, nc, 8 * W))
        out = jnp.concatenate(outs, axis=0)
        Fp = out.shape[0]
        return (
            out.reshape(Fp, nc, 8, W)
            .transpose(0, 2, 1, 3)
            .reshape(Fp, 8 * nc * W)
        )

    timed("    fam matmuls+transpose", cls_matmuls, d, Mfam,
          bytes_=(2 * Fpad * nc * 8 * W * 3) * 4 + tbytes,
          flops=2.0 * Fpad * nc * (8 * W) ** 2)
    fout = jax.block_until_ready(jax.jit(cls_matmuls)(d, Mfam))

    def fam_reduce(d_, o):
        Lred = bucket_sum_apply(d_["fam_bsum"], o * 1.0)
        rows = Lred.reshape(f.nutp * 8, nc * W)
        return rows[d_["fam_out_idx"]] * d_["fam_out_mask"][:, None]

    timed("    fam bucket+out", fam_reduce, d, fout,
          bytes_=2 * Fpad * 8 * cW * 4)


if __name__ == "__main__":
    main()
