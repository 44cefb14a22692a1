"""Matvec wall-clock vs truncation order p on the attached backend.

Quantifies the TPU cost model behind the relaxation finding: the
near field is p-independent (cached panels) and M2L at low p is
latency- not FLOP-bound, so lowering p buys far less per iteration
than it does on the reference's CPU (where P2M/M2L FLOPs dominate).

Usage: python perf/probe_matvec_vs_p.py [recursions] [p1 p2 ...]
"""

import json
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

REC = int(sys.argv[1]) if len(sys.argv) > 1 else 7
PS = [int(a) for a in sys.argv[2:]] or [1, 3, 5, 8, 10]
CHAIN = 50
ITERS = 5


def main():
    tris = unit_sphere(REC)
    n = len(tris)
    plan = FmmPlan(
        LaplaceBEMKernel(K=3), make_panels(tris, K=3),
        FMMConfig(ncrit=64, dtype="float32", max_p=max(PS)),
    )
    mv, op4p, to_slots, _, _ = plan.solver_ops_slots()
    q = to_slots(jnp.ones(n, jnp.float32))
    print(f"panels={n} backend={jax.devices()[0].platform}", flush=True)

    @jax.jit
    def ident(q):
        return q * 1.0000001

    np.asarray(ident(q))
    t0 = time.time()
    for _ in range(ITERS):
        np.asarray(ident(q))
    t_base = (time.time() - t0) / ITERS

    rows = {}
    for p in PS:
        operand = op4p(p)

        def chained(operand, q, _p=p):
            def step(carry, _):
                return mv(operand, carry, _p), None

            o, _ = jax.lax.scan(step, q, None, length=CHAIN)
            return o

        run = jax.jit(chained)
        np.asarray(run(operand, q))
        t0 = time.time()
        for _ in range(ITERS):
            np.asarray(run(operand, q))
        dt = max((time.time() - t0) / ITERS - t_base, 1e-9) / CHAIN
        rows[p] = dt * 1e3
        print(f"p={p:2d}  matvec {dt*1e3:7.3f} ms "
              f"(vs p={PS[-1]}: {dt/ (rows.get(PS[-1]) or dt):.2f}x)"
              if PS[-1] in rows else
              f"p={p:2d}  matvec {dt*1e3:7.3f} ms", flush=True)

    out = {"n_panels": n, "backend": jax.devices()[0].platform,
           "matvec_ms_by_p": rows}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "MATVEC_VS_P.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
