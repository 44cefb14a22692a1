"""
[timing note: the chain step consumes the FULL output sum —
a sliced consumer lets XLA dead-code most of the work]
Round-3 perf probe: decompose the M2L and near-field phases into
their constituent device ops and time each on the attached backend.

Usage:  python perf/probe_phases.py [recursions] [p]

Timing follows the tunneled-TPU rules (.claude/skills/verify/SKILL.md):
chained lax.scan with a mixing step, device->host transfer as the sync
point, transfer baseline subtracted, and ALL device data passed as jit
arguments (closure capture embeds arrays as compile-time constants,
which the tunneled remote compile rejects / uploads at glacial speed).
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

REC = int(sys.argv[1]) if len(sys.argv) > 1 else 7
P = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CHAIN = 300
ITERS = 3

_BASE = None


def timed(name, fn, data, x0, bytes_=0, flops=0):
    """Time fn(data, x)->array chained CHAIN times; data/x0 are args."""
    global _BASE

    @jax.jit
    def run(data, x):
        def step(c, _):
            xm = x * (1.0 + 1e-30 * c)
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
    line = f"{name:34s} {dt*1e3:8.3f} ms"
    if bytes_:
        line += f"  {bytes_/dt/1e9:7.1f} GB/s ({100*bytes_/dt/819e9:5.1f}% HBM)"
    if flops:
        line += f"  {flops/dt/1e12:6.2f} TF/s"
    print(line, flush=True)
    return dt


def main():
    tris = unit_sphere(REC)
    n = len(tris)
    print(f"panels={n} p={P} backend={jax.devices()[0].platform}", flush=True)
    fields = make_panels(tris, K=3)
    t0 = time.time()
    plan = FmmPlan(
        LaplaceBEMKernel(K=3), fields,
        FMMConfig(ncrit=64, dtype="float32", max_p=max(P, 8)),
    )
    print(f"build {time.time()-t0:.1f}s", flush=True)
    st = plan.src.tree
    print(
        f"nbox={st.num_boxes} nleaf={len(plan.src.leaf_ids)} "
        f"leaf_pad={plan.src.leaf_pad} levels={st.num_levels}"
    )

    cls = plan.m2l_classes
    sizes = np.array([len(s) for s in cls.src])
    npairs = int(sizes.sum())
    W = plan.kernel.width(P)
    cW = plan.kernel.ncomp * W
    print(
        f"m2l: npairs={npairs} padded={len(plan.m2l_tile_src)} "
        f"nclasses={len(sizes)} TS={plan.m2l_tile_size} cW={cW}"
    )
    if len(sizes):
        qs = np.percentile(sizes, [50, 90, 99, 100]).astype(int)
        print(f"  class sizes p50/p90/p99/max = {qs.tolist()}")
    bs = plan.m2l_bsum
    print(f"  bucket_sum: buckets={[i.shape for i in bs.idx]}")

    panels_dev, meta = plan.near_panels()
    A_bytes = int(np.prod(panels_dev["A"].shape)) * 4
    useful = meta.npairs * meta.KT * meta.rdim * meta.KS * meta.cdim * 4
    print(
        f"near: npairs={meta.npairs} KT={meta.KT} KS={meta.KS} "
        f"A_bytes={A_bytes/1e6:.1f}MB useful={useful/1e6:.1f}MB "
        f"pad_waste={100*(1-useful/max(A_bytes,1)):.0f}%"
    )
    print(
        f"  chunks A{tuple(panels_dev['A'].shape)} m0={meta.m0} "
        f"block_rows={meta.block_rows}"
    )
    print(flush=True)

    d = plan.device_data(P)
    aux = plan.variant_aux(P)
    sf = plan.device_fields()
    qm = jnp.ones(n, jnp.float32)[np.asarray(d["s_perm"])]

    # =========== M2L decomposition ===========
    @jax.jit
    def mk_M(d_, aux_, sf_, qm_):
        return plan._phase_m2m(d_, plan._phase_p2m(d_, aux_, sf_, qm_, P))

    M = jax.block_until_ready(mk_M(d, aux, sf, qm))
    TS = plan.m2l_tile_size
    npairs_pad = len(plan.m2l_tile_src)
    ntile = npairs_pad // TS

    timed("m2l full phase",
          lambda d_, M_: plan._phase_m2l(d_, M_, P), d, M,
          bytes_=(3 * npairs_pad * cW + ntile * W * W) * 4,
          flops=2.0 * npairs_pad * cW * W)

    timed("  gather Mg",
          lambda d_, M_: M_[d_["m2l_tile_src"]], d, M,
          bytes_=2 * npairs_pad * cW * 4)

    timed("  gather mats",
          lambda d_, M_: (d_["m2l_mats"] * (1.0 + M_[0, 0]))[
              d_["m2l_tile_cls"]],
          d, M, bytes_=2 * ntile * W * W * 4)

    ncomp = plan.kernel.ncomp

    def one_mat_einsum(d_, M_):
        Mg = M_[d_["m2l_tile_src"]].reshape(ntile, TS * ncomp, W)
        return jnp.einsum(
            "tpw,vw->tpv", Mg, d_["m2l_mats"][0]
        ).reshape(npairs_pad, cW)

    timed("  gather+einsum(1 shared mat)", one_mat_einsum, d, M,
          flops=2.0 * npairs_pad * cW * W)

    def g_einsum(d_, M_):
        Mg = M_[d_["m2l_tile_src"]].reshape(ntile, TS * ncomp, W)
        mats = d_["m2l_mats"][d_["m2l_tile_cls"]]
        return jnp.einsum("tpw,tvw->tpv", Mg, mats).reshape(npairs_pad, cW)

    timed("  gather+einsum", g_einsum, d, M,
          flops=2.0 * npairs_pad * cW * W)

    outp = jax.block_until_ready(jax.jit(g_einsum)(d, M))
    from fmm_bem_tpu.ops.bucket_sum import bucket_sum_apply

    gath_bytes = sum(
        2 * int(np.prod(i.shape)) * cW * 4 for i in d["m2l_bsum"]["idx"]
    )
    timed("  bucket_sum",
          lambda d_, o: bucket_sum_apply(d_["m2l_bsum"], o),
          d, outp, bytes_=gath_bytes)

    # =========== near decomposition ===========
    KSc = meta.KS * meta.cdim
    nd = {"panels": aux["panels"], "d": d}

    @jax.jit
    def mk_ql(d_, qm_):
        return jnp.where(
            d_["s_leaf_body_mask"], qm_[d_["s_leaf_body_idx"]], 0.0
        )

    ql = jax.block_until_ready(mk_ql(d, qm))

    timed("near full pass",
          lambda nd_, q_: plan._near_pass(nd_["d"], nd_["panels"], sf, q_),
          nd, qm, bytes_=A_bytes)

    from fmm_bem_tpu.ops.near_panel import panel_matvec

    timed("  panel_matvec (pallas)",
          lambda nd_, q_: panel_matvec(nd_["panels"], meta, q_),
          nd, ql, bytes_=A_bytes)
    timed("  panel_matvec (einsum)",
          lambda nd_, q_: panel_matvec(nd_["panels"], meta, q_,
                                       use_pallas=False),
          nd, ql, bytes_=A_bytes)

    def xgather(nd_, q_):
        xq = jnp.concatenate([q_, jnp.zeros((1, KSc), q_.dtype)], axis=0)
        return xq[nd_["panels"]["pidx"]].reshape(-1)

    timed("  charge gather only", xgather, nd, ql)

    def stream(nd_, q_):
        acc = q_.reshape(-1)[:8].sum()
        return jnp.abs(nd_["panels"]["A"] + acc).sum(axis=(1, 2))

    timed("  A stream (jnp.sum bound)", stream, nd, ql, bytes_=A_bytes)

    # =========== near-pass small ops (the full-pass overhead) ==========
    out_leaf = jax.block_until_ready(
        jax.jit(
            lambda nd_, q_: panel_matvec(nd_["panels"], meta, q_)
        )(nd, ql)
    )
    nl_t = len(plan.tgt.leaf_ids)
    K_t = plan.tgt.leaf_pad
    nd2 = {"d": d, "chunks": out_leaf, "ct": panels_dev["chunk_tgt"]}

    timed("  mk_ql (mask+gather)",
          lambda d_, q_: jnp.where(
              d_["s_leaf_body_mask"], q_[d_["s_leaf_body_idx"]], 0.0
          ), d, qm)

    # =========== p2m decomposition ===========
    tab = aux["p2m_tab"]
    pd = {"d": d, "tab": tab}
    timed("p2m: contrib = q*tab",
          lambda pd_, q_: q_[:, None] * pd_["tab"], pd, qm,
          bytes_=2 * int(np.prod(tab.shape)) * 4)

    contrib = jax.block_until_ready(
        jax.jit(lambda pd_, q_: q_[:, None] * pd_["tab"])(pd, qm)
    )
    pd2 = {"d": d, "contrib": contrib}

    def p2m_gather(pd_, q_):
        ct = (pd_["contrib"] * (1 + q_[0]))[pd_["d"]["s_leaf_body_idx"]]
        ct = jnp.where(pd_["d"]["s_leaf_body_mask"][..., None], ct, 0.0)
        return jnp.sum(ct, axis=1)

    timed("p2m: leaf gather+sum", p2m_gather, pd2, qm,
          bytes_=2 * int(np.prod(tab.shape)) * 4)

    leafsum = jax.block_until_ready(jax.jit(p2m_gather)(pd2, qm))
    pd3 = {"d": d, "ls": leafsum}
    timed("p2m: scatter to boxes",
          lambda pd_, q_: jnp.zeros(
              (st.num_boxes, cW), jnp.float32
          ).at[pd_["d"]["s_leaf_ids"]].set(pd_["ls"] * (1 + q_[0])),
          pd3, qm)

    # =========== device microbenches ===========
    big = jnp.ones((64, 1024, 1024), jnp.float32)  # 256MB
    timed("copy 256MB (empirical peak)",
          lambda b_, q_: b_ * (1.0 + q_[0]), big, qm,
          bytes_=2 * big.size * 4)

    table = jnp.ones((2048, 1024), jnp.float32)  # 8MB
    ridx = jnp.asarray(
        np.random.default_rng(0).integers(0, 2048, 81920), jnp.int32
    )
    for wid in (16, 60, 128, 480, 1024):
        nrow = 81920 * 60 // wid  # constant payload ~20MB
        gd = {"t": table[:, :wid], "i": ridx[: min(nrow, len(ridx))]}
        payload = gd["i"].shape[0] * wid * 4
        timed(f"row gather w={wid} ({payload/1e6:.0f}MB)",
              lambda gd_, q_: (gd_["t"] * (1 + q_[0]))[gd_["i"]],
              gd, qm, bytes_=2 * payload)


if __name__ == "__main__":
    main()
