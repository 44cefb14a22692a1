"""Probe alternative formulations of the slot-space P2M / L2P table
contractions at large N.

Motive (round 5, 524k-panel phase record): p2m = 7.6 ms and
l2p = 7.8 ms at ~4% of HBM peak — the elementwise-multiply +
K/W-axis-reduce formulations stop streaming at this size, while each
phase's table (~320 MB at p=5) should stream in <0.5 ms.  Candidates
recast the same contraction as per-leaf batched matmuls so XLA tiles
them for the MXU/VPU instead of a padded elementwise reduce.

Usage: python perf/probe_p2m_l2p.py [recursions] [p]
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
print(f"panels={len(tris)} p={P} build={time.time()-t0:.1f}s", flush=True)

aux = plan.variant_aux_slots(P)
slot_ops = plan.solver_ops_slots()
nl_s, K_s = len(plan.src.leaf_ids), plan.src.leaf_pad
nl_t, K_t = len(plan.tgt.leaf_ids), plan.tgt.leaf_pad
cW = plan.kernel.ncomp * plan.kernel.width(P)
print(f"nl_s={nl_s} K_s={K_s} nl_t={nl_t} K_t={K_t} cW={cW}", flush=True)

tab_p2m = aux["p2m_tab_t"]          # [nslots, cW]
tab_l2p = aux["l2p_tab_t"]          # [rdim, nslots, cW]
rdim = tab_l2p.shape[0]
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.standard_normal(nl_s * K_s), jnp.float32)
Ll0 = jnp.asarray(rng.standard_normal((nl_t, cW)), jnp.float32)


def timeit(name, fn, x0, *operands):
    """Chained-scan timing minus a same-signature null baseline."""

    def chain_run(ops, x):
        def step(x, _):
            out = fn(ops, x)
            s = out
            while s.ndim > 0:
                s = s.sum(axis=-1) if s.ndim > 1 else s.sum()
            return x * (1.0 + 1e-30 * s), None

        y, _ = jax.lax.scan(step, x, None, length=CHAIN)
        return y

    run = jax.jit(chain_run)
    null = jax.jit(lambda ops, x: x * 1.0000001)
    xs = [x0 * (1.0 + 1e-5 * r) for r in range(REPEATS)]
    for x in xs:
        x.block_until_ready()
    np.asarray(run(operands, x0)); np.asarray(null(operands, x0))
    tb = np.inf
    for r in range(REPEATS):
        t0 = time.time(); np.asarray(null(operands, xs[r]))
        tb = min(tb, time.time() - t0)
    tt = np.inf
    for r in range(REPEATS):
        t0 = time.time(); np.asarray(run(operands, xs[r]))
        tt = min(tt, time.time() - t0)
    ms = max(tt - tb, 0.0) / CHAIN * 1e3
    print(f"{name:28s} {ms:8.3f} ms", flush=True)
    return ms


# ---- P2M candidates: q [nslots] x tab [nslots, cW] -> [nl, cW]
def p2m_cur(ops, q):
    (tab,) = ops
    return (q[:, None] * tab).reshape(nl_s, K_s, cW).sum(axis=1)


def p2m_bmm(ops, q):
    (tab,) = ops
    return jnp.einsum(
        "lk,lkw->lw", q.reshape(nl_s, K_s), tab.reshape(nl_s, K_s, cW)
    )


def p2m_dot(ops, q):
    (tab,) = ops
    out = jax.lax.dot_general(
        q.reshape(nl_s, 1, K_s), tab.reshape(nl_s, K_s, cW),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(nl_s, cW)


# ---- L2P candidates: tab [rdim, nslots, cW] x Ll [nl, cW] -> [nslots, rdim]
def l2p_cur(ops, Ll):
    (tab,) = ops
    t4 = tab.reshape(rdim, nl_t, K_t, cW)
    out = (t4 * Ll[None, :, None, :]).sum(-1)
    return out.reshape(-1, nl_t * K_t).T


def l2p_bmm(ops, Ll):
    (tab,) = ops
    t4 = tab.reshape(rdim, nl_t, K_t, cW)
    out = jnp.einsum("rlkw,lw->rlk", t4, Ll)
    return out.reshape(-1, nl_t * K_t).T


def l2p_dot(ops, Ll):
    # [nl, K*rdim, cW] @ [nl, cW, 1]
    (tab,) = ops
    t4 = jnp.transpose(
        tab.reshape(rdim, nl_t, K_t, cW), (1, 2, 0, 3)
    ).reshape(nl_t, K_t * rdim, cW)
    out = jax.lax.dot_general(
        t4, Ll[:, :, None],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(nl_t * K_t, rdim)


r_cur = np.asarray(jax.jit(p2m_cur)((tab_p2m,), q0))
for nm, f in [("p2m_bmm", p2m_bmm), ("p2m_dot", p2m_dot)]:
    r = np.asarray(jax.jit(f)((tab_p2m,), q0))
    err = np.abs(r - r_cur).max() / (np.abs(r_cur).max() + 1e-30)
    print(f"{nm} max rel err vs current: {err:.2e}")

l_cur = np.asarray(jax.jit(l2p_cur)((tab_l2p,), Ll0))
for nm, f in [("l2p_bmm", l2p_bmm), ("l2p_dot", l2p_dot)]:
    r = np.asarray(jax.jit(f)((tab_l2p,), Ll0))
    err = np.abs(r - l_cur).max() / (np.abs(l_cur).max() + 1e-30)
    print(f"{nm} max rel err vs current: {err:.2e}")

gb_p2m = tab_p2m.size * 4 / 1e9
gb_l2p = tab_l2p.size * 4 / 1e9
print(f"table GB: p2m={gb_p2m:.3f} l2p={gb_l2p:.3f} "
      f"(stream floor at 819 GB/s: {gb_p2m/819*1e3:.3f} / "
      f"{gb_l2p/819*1e3:.3f} ms)", flush=True)

for nm, f in [("p2m_current", p2m_cur), ("p2m_bmm", p2m_bmm),
              ("p2m_dot", p2m_dot)]:
    timeit(nm, f, q0, tab_p2m)
for nm, f in [("l2p_current", l2p_cur), ("l2p_bmm", l2p_bmm),
              ("l2p_dot", l2p_dot)]:
    timeit(nm, f, Ll0, tab_l2p)


# ---- round-5b candidates: scatter-free P2M box fill, transposed L2P
d = plan.device_data(P)
num_boxes = plan.src.tree.num_boxes
leaf_ids = np.asarray(plan.src.leaf_ids)
box_src_leaf = np.full(num_boxes, nl_s, np.int32)
box_src_leaf[leaf_ids] = np.arange(nl_s, dtype=np.int32)
bsl = jnp.asarray(box_src_leaf)
slids = d["s_leaf_ids"]

leaf_of_slot = np.repeat(np.arange(nl_t, dtype=np.int32), K_t)
los = jnp.asarray(leaf_of_slot)
tab_l2p_T = jnp.transpose(tab_l2p, (0, 2, 1))  # [rdim, cW, nslots]


def p2m_scatter(ops, q):
    # the production pipeline op: multiply-reduce + box scatter
    (tab,) = ops
    contrib = (q[:, None] * tab).reshape(nl_s, K_s, cW).sum(axis=1)
    return (
        jnp.zeros((num_boxes, cW), jnp.float32).at[slids].set(contrib)
    )


def p2m_gatherfill(ops, q):
    (tab,) = ops
    contrib = (q[:, None] * tab).reshape(nl_s, K_s, cW).sum(axis=1)
    padded = jnp.concatenate(
        [contrib, jnp.zeros((1, cW), jnp.float32)], axis=0
    )
    return padded[bsl]


def l2p_T(ops, Ll):
    (tabT,) = ops  # [rdim, cW, nslots]
    Lg = Ll.T[:, los]                    # [cW, nslots] fused gather
    out = (tabT * Lg[None]).sum(axis=1)  # [rdim, nslots]
    return out.T


rs = np.asarray(jax.jit(p2m_scatter)((tab_p2m,), q0))
rg = np.asarray(jax.jit(p2m_gatherfill)((tab_p2m,), q0))
print("p2m gatherfill max abs diff:", np.abs(rs - rg).max())
rt = np.asarray(jax.jit(l2p_T)((tab_l2p_T,), Ll0))
print("l2p_T max rel err:",
      np.abs(rt - l_cur).max() / (np.abs(l_cur).max() + 1e-30))

timeit("p2m_scatter(pipeline)", p2m_scatter, q0, tab_p2m)
timeit("p2m_gatherfill", p2m_gatherfill, q0, tab_p2m)
timeit("l2p_T", l2p_T, Ll0, tab_l2p_T)
