"""Honest (materialization-forced) decomposition of the slot P2M/L2P
cost at large N, plus Pallas/k-major candidates.

probe_p2m_l2p.py's scalar-feedback chains let XLA collapse candidates
whose only consumer is a sum (p2m_current "0.2 ms" was the whole op
folded into one reduction).  Here every candidate's full output is a
scan CARRY returned from the jit, so nothing can be dead-coded, and
the fill step (leaf table -> box table) is timed separately from the
multiply-reduce.

Usage: python perf/probe_p2m_l2p2.py [recursions] [p]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import FMMConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel

REC = int(sys.argv[1]) if len(sys.argv) > 1 else 9
P = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CHAIN = 48
REPEATS = 3

tris = unit_sphere(REC)
fields = make_panels(tris, K=3)
t0 = time.time()
plan = FmmPlan(
    LaplaceBEMKernel(K=3), fields,
    FMMConfig(ncrit=64, dtype="float32", max_p=max(P, 10)),
)
aux = plan.variant_aux_slots(P)
d = plan.device_data(P)
nl_s, K_s = len(plan.src.leaf_ids), plan.src.leaf_pad
nl_t, K_t = len(plan.tgt.leaf_ids), plan.tgt.leaf_pad
cW = plan.kernel.ncomp * plan.kernel.width(P)
NB = plan.src.tree.num_boxes
print(f"panels={len(tris)} p={P} build={time.time()-t0:.1f}s "
      f"nl={nl_s} K={K_s} cW={cW} num_boxes={NB}", flush=True)

tab_p2m = aux["p2m_tab_t"]          # [nslots, cW]
tab_l2p = aux["l2p_tab_t"]          # [rdim, nslots, cW]
rdim = tab_l2p.shape[0]
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.standard_normal(nl_s * K_s), jnp.float32)
Ll0 = jnp.asarray(rng.standard_normal((nl_t, cW)), jnp.float32)

leaf_ids = np.asarray(plan.src.leaf_ids)
box_src_leaf = np.full(NB, nl_s, np.int32)
box_src_leaf[leaf_ids] = np.arange(nl_s, dtype=np.int32)
bsl = jnp.asarray(box_src_leaf)
slids = d["s_leaf_ids"]
los = jnp.asarray(np.repeat(np.arange(nl_t, dtype=np.int32), K_t))

# k-major layouts (host-side one-time transposes)
tab_p2m_k = jnp.asarray(
    np.ascontiguousarray(
        np.asarray(tab_p2m).reshape(nl_s, K_s, cW).transpose(1, 0, 2)
    )
)  # [K, nl, cW]
tab_l2p_w = jnp.asarray(
    np.ascontiguousarray(
        np.asarray(tab_l2p).reshape(rdim, nl_t, K_t, cW)
        .transpose(0, 3, 1, 2)
    )
)  # [rdim, cW, nl, K]


def timeit(name, fn, x0, acc_shape, *operands):
    """Chained scan; candidate output accumulates into a carried acc
    that is RETURNED, so the op can never collapse into a scalar."""

    def chain_run(ops, x):
        acc0 = jnp.zeros(acc_shape, jnp.float32)

        def step(carry, _):
            x, acc = carry
            out = fn(ops, x)
            acc = acc + out
            xn = x * (1.0 + 1e-30 * jax.lax.slice(acc.reshape(-1), (0,), (1,))[0])
            return (xn, acc), None

        (y, acc), _ = jax.lax.scan(step, (x, acc0), None, length=CHAIN)
        return y, acc

    run = jax.jit(chain_run)
    null = jax.jit(
        lambda ops, x: (x * 1.0000001, jnp.zeros(acc_shape, jnp.float32))
    )
    xs = [x0 * (1.0 + 1e-5 * r) for r in range(REPEATS)]
    for x in xs:
        x.block_until_ready()
    r = run(operands, x0); jax.block_until_ready(r)
    r = null(operands, x0); jax.block_until_ready(r)
    tb = np.inf
    for rr in range(REPEATS):
        t0 = time.time(); jax.block_until_ready(null(operands, xs[rr]))
        tb = min(tb, time.time() - t0)
    tt = np.inf
    for rr in range(REPEATS):
        t0 = time.time(); jax.block_until_ready(run(operands, xs[rr]))
        tt = min(tt, time.time() - t0)
    ms = max(tt - tb, 0.0) / CHAIN * 1e3
    print(f"{name:28s} {ms:8.3f} ms", flush=True)
    return ms


# ---- P2M multiply-reduce variants -> [nl, cW]
def p2m_cur(ops, q):
    (tab,) = ops
    return (q[:, None] * tab).reshape(nl_s, K_s, cW).sum(axis=1)


def p2m_kmajor(ops, q):
    (tabk,) = ops  # [K, nl, cW]
    qk = q.reshape(nl_s, K_s).T  # [K, nl]
    return (tabk * qk[:, :, None]).sum(axis=0)


def p2m_pallas(ops, q):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (tab,) = ops  # [nslots, cW]
    TL = 128  # leaves per block
    nlp = -(-nl_s // TL) * TL
    tabp = jnp.concatenate(
        [tab, jnp.zeros((nlp * K_s - tab.shape[0], cW), tab.dtype)]
    )
    qp = jnp.concatenate([q, jnp.zeros(nlp * K_s - q.shape[0], q.dtype)])
    q2 = qp.reshape(nlp, K_s)

    def kern(t_ref, q_ref, o_ref):
        x = t_ref[:].reshape(TL, K_s, cW)
        o_ref[:] = jnp.sum(x * q_ref[:][:, :, None], axis=1)

    out = pl.pallas_call(
        kern,
        grid=(nlp // TL,),
        in_specs=[
            pl.BlockSpec((TL * K_s, cW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, K_s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TL, cW), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nlp, cW), tab.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nlp * K_s * cW,
            bytes_accessed=tabp.size * 4,
            transcendentals=0,
        ),
    )(tabp, q2)
    return out[:nl_s]


# ---- fill step: [nl, cW] -> [NB, cW]
def fill_scatter(ops, contrib):
    return jnp.zeros((NB, cW), jnp.float32).at[slids].set(contrib)


def fill_gather(ops, contrib):
    padded = jnp.concatenate(
        [contrib, jnp.zeros((1, cW), jnp.float32)], axis=0
    )
    return padded[bsl]


# ---- L2P variants -> [nslots, rdim]
def l2p_cur(ops, Ll):
    (tab,) = ops
    t4 = tab.reshape(rdim, nl_t, K_t, cW)
    out = (t4 * Ll[None, :, None, :]).sum(-1)
    return out.reshape(-1, nl_t * K_t).T


def l2p_wmajor(ops, Ll):
    (tabw,) = ops  # [rdim, cW, nl, K]
    out = (tabw * Ll.T[None, :, :, None]).sum(axis=1)  # [rdim, nl, K]
    return out.reshape(-1, nl_t * K_t).T


def l2p_pallas(ops, Ll):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (tab,) = ops  # [rdim, nslots, cW] -> use rdim=1 plane
    TL = 128
    nlp = -(-nl_t // TL) * TL
    tabp = jnp.concatenate(
        [tab, jnp.zeros((rdim, nlp * K_t - tab.shape[1], cW), tab.dtype)],
        axis=1,
    )
    Llp = jnp.concatenate(
        [Ll, jnp.zeros((nlp - nl_t, cW), Ll.dtype)], axis=0
    )

    def kern(t_ref, l_ref, o_ref):
        x = t_ref[0].reshape(TL, K_t, cW)
        o_ref[:] = jnp.sum(x * l_ref[:][:, None, :], axis=2)

    out = pl.pallas_call(
        kern,
        grid=(nlp // TL,),
        in_specs=[
            pl.BlockSpec((rdim, TL * K_t, cW), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, cW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TL, K_t), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nlp, K_t), tab.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nlp * K_t * cW,
            bytes_accessed=tabp.size * 4,
            transcendentals=0,
        ),
    )(tabp, Llp)
    return out[:nl_t].reshape(nl_t * K_t, 1)


# correctness
ref_p2m = np.asarray(jax.jit(p2m_cur)((tab_p2m,), q0))
for nm, f, ops in [("p2m_kmajor", p2m_kmajor, (tab_p2m_k,)),
                   ("p2m_pallas", p2m_pallas, (tab_p2m,))]:
    r = np.asarray(jax.jit(f)(ops, q0))
    print(f"{nm} rel err:",
          np.abs(r - ref_p2m).max() / (np.abs(ref_p2m).max() + 1e-30),
          flush=True)
ref_l2p = np.asarray(jax.jit(l2p_cur)((tab_l2p,), Ll0))
for nm, f, ops in [("l2p_wmajor", l2p_wmajor, (tab_l2p_w,)),
                   ("l2p_pallas", l2p_pallas, (tab_l2p,))]:
    r = np.asarray(jax.jit(f)(ops, Ll0))
    print(f"{nm} rel err:",
          np.abs(r - ref_l2p).max() / (np.abs(ref_l2p).max() + 1e-30),
          flush=True)

contrib0 = jnp.asarray(ref_p2m)
timeit("p2m_cur", p2m_cur, q0, (nl_s, cW), tab_p2m)
timeit("p2m_kmajor", p2m_kmajor, q0, (nl_s, cW), tab_p2m_k)
timeit("p2m_pallas", p2m_pallas, q0, (nl_s, cW), tab_p2m)
timeit("fill_scatter", fill_scatter, contrib0, (NB, cW))
timeit("fill_gather", fill_gather, contrib0, (NB, cW))
timeit("l2p_cur", l2p_cur, Ll0, (nl_t * K_t, rdim), tab_l2p)
timeit("l2p_wmajor", l2p_wmajor, Ll0, (nl_t * K_t, rdim), tab_l2p_w)
timeit("l2p_pallas", l2p_pallas, Ll0, (nl_t * K_t, rdim), tab_l2p)


# ---- l2p lanes=nl variant: [rdim, cW, K, nl]
tab_l2p_w2 = jnp.asarray(
    np.ascontiguousarray(
        np.asarray(tab_l2p).reshape(rdim, nl_t, K_t, cW)
        .transpose(0, 3, 2, 1)
    )
)  # [rdim, cW, K, nl]


def l2p_w2(ops, Ll):
    (tabw,) = ops
    out = (tabw * Ll.T[None, :, None, :]).sum(axis=1)  # [rdim, K, nl]
    return out.transpose(2, 1, 0).reshape(nl_t * K_t, rdim)


r = np.asarray(jax.jit(l2p_w2)((tab_l2p_w2,), Ll0))
print("l2p_w2 rel err:",
      np.abs(r - ref_l2p).max() / (np.abs(ref_l2p).max() + 1e-30),
      flush=True)
timeit("l2p_w2", l2p_w2, Ll0, (nl_t * K_t, rdim), tab_l2p_w2)
timeit("l2p_wmajor2", l2p_wmajor, Ll0, (nl_t * K_t, rdim), tab_l2p_w)
