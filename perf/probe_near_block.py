"""Sweep the near-panel Pallas kernel's row-tile size and contraction
style against the raw A-stream bound (round-4: close the 70% -> 92%
HBM gap the uniform-chunk layout left on the table).

Usage: python perf/probe_near_block.py [recursions]
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import FMMConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel

REC = int(sys.argv[1]) if len(sys.argv) > 1 else 8
CHAIN = 200
ITERS = 3
_BASE = None


def timed(name, fn, data, x0, bytes_=0):
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
    def ident(data, x):
        return x.reshape(-1)[:8].sum() * 1.0000001

    if _BASE is None:
        np.asarray(ident(data, x0))
        t0 = time.time()
        for _ in range(ITERS):
            np.asarray(ident(data, x0))
        _BASE = (time.time() - t0) / ITERS

    np.asarray(run(data, x0))
    t0 = time.time()
    for _ in range(ITERS):
        np.asarray(run(data, x0))
    dt = max((time.time() - t0) / ITERS - _BASE, 1e-9) / CHAIN
    line = f"{name:40s} {dt*1e3:8.3f} ms"
    if bytes_:
        line += f"  {bytes_/dt/1e9:7.1f} GB/s ({100*bytes_/dt/819e9:5.1f}% HBM)"
    print(line, flush=True)
    return dt


def main():
    tris = unit_sphere(REC)
    fields = make_panels(tris, K=3)
    plan = FmmPlan(
        LaplaceBEMKernel(K=3), fields,
        FMMConfig(ncrit=64, dtype="float32", max_p=8),
    )
    panels_dev, meta = plan.near_panels()
    A = panels_dev["A"]
    C, KTr, L = A.shape
    A_bytes = A.size * 4
    print(f"A{tuple(A.shape)} m0={meta.m0} {A_bytes/1e6:.0f}MB", flush=True)

    n = plan.src.tree.num_bodies
    nl = len(plan.src.leaf_ids)
    KSc = meta.KS * meta.cdim
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((C, L)), jnp.float32)
    dat = {"A": A, "x": xb}

    def stream(d_, x_):
        acc = x_.reshape(-1)[:8].sum()
        return jnp.abs(d_["A"] + acc).sum(axis=(1, 2))

    timed("A stream bound", stream, dat, xb, A_bytes)

    def mul_kern(a_ref, x_ref, o_ref):
        o_ref[:] = jnp.sum(a_ref[:] * x_ref[:][:, None, :], axis=2)

    def dot_kern(a_ref, x_ref, o_ref):
        # batched matvec on the MXU: contract L per chunk row
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], x_ref[:],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    for bl in (16, 32, 64, 128, 256):
        if C % bl:
            continue
        for nm, kern in (("mul", mul_kern), ("dot", dot_kern)):
            def pc(d_, x_, bl=bl, kern=kern):
                return pl.pallas_call(
                    kern,
                    grid=(C // bl,),
                    in_specs=[
                        pl.BlockSpec((bl, KTr, L), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((bl, L), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((bl, KTr), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((C, KTr), jnp.float32),
                    cost_estimate=pl.CostEstimate(
                        flops=2 * C * KTr * L,
                        bytes_accessed=A_bytes,
                        transcendentals=0,
                    ),
                )(d_["A"], x_)

            timed(f"pallas {nm} bl={bl} "
                  f"({bl*KTr*L*4/1e6:.1f}MB blocks)", pc, dat, xb, A_bytes)

    # the full production near pass (gather + kernel + segment sum)
    ql = jnp.asarray(rng.standard_normal((nl, KSc)), jnp.float32)
    from fmm_bem_tpu.ops.near_panel import panel_matvec

    timed("panel_matvec (current)",
          lambda d_, q_: panel_matvec(panels_dev, meta, q_), dat, ql,
          A_bytes)


if __name__ == "__main__":
    main()
