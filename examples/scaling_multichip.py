#!/usr/bin/env python
"""Multi-device scaling harness: FMM matvec interactions/s at 1..N
devices on a Morton-range-sharded mesh (the BASELINE.md scaling metric:
interactions/s at 1 chip / 1 host / N hosts, weak-scaling efficiency).

On a CPU host this exercises the sharded program on virtual devices
(functional validation + comm-pattern inspection); on a TPU slice the
same harness produces the real scaling numbers.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/scaling_multichip.py -N 32768 [-weak]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-N", type=int, default=32768)
    ap.add_argument("-p", type=int, default=5)
    ap.add_argument("-ncrit", type=int, default=64)
    ap.add_argument("-weak", action="store_true",
                    help="scale N with the device count (weak scaling)")
    ap.add_argument("-dtype", default="float32")
    ap.add_argument("-cpu", action="store_true", help="force host platform")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from fmm_bem_tpu.config import FMMConfig
    from fmm_bem_tpu.executor.plan import FmmPlan
    from fmm_bem_tpu.kernels.laplace import LaplaceKernel
    from fmm_bem_tpu.parallel.sharding import make_mesh, sharded_matvec

    ndev_all = len(jax.devices())
    rng = np.random.default_rng(0)
    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev_all]
    base = None
    print(f"devices available: {ndev_all} ({jax.devices()[0].platform})")
    print("ndev      N   matvec[ms]  pairs/s      efficiency")
    for nd in counts:
        n = args.N * nd if args.weak else args.N
        n = (n // nd) * nd  # divisibility for explicit shardings
        pts = rng.uniform(0, 1, (n, 3))
        q = rng.standard_normal(n).astype(args.dtype)
        plan = FmmPlan(
            LaplaceKernel(),
            {"xyz": pts},
            FMMConfig(ncrit=args.ncrit, dtype=args.dtype, max_p=max(args.p, 6)),
        )
        mesh = make_mesh(nd)
        f = sharded_matvec(plan, args.p, mesh)
        out = f(q)
        out.block_until_ready()  # compile
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            out = f(q)
        out.block_until_ready()
        dt = (time.time() - t0) / reps
        rate = n * n / dt
        if base is None:
            base = rate if not args.weak else rate / nd
        eff = (
            rate / (base * nd)
            if not args.weak
            else (rate / nd) / base
        )
        print(f"{nd:4d} {n:8d}   {dt*1e3:9.2f}  {rate:.3e}  {eff:8.1%}")


if __name__ == "__main__":
    main()
