"""Large-N scaling record (VERDICT r3 #4): matvec wall-clock, build
time, and near-panel memory vs problem size on the attached TPU.

Covers the reference's two size axes:
- Laplace BEM sphere at recursions 7/8/9 (32k / 131k / 524k panels) —
  the bench workload pushed to half a million panels;
- point Laplace at N up to 1e6 (the reference's tuning-benchmark scale,
  tests/ncrit_search.cpp:27, ncrit 125).

Timing follows the tunneled-TPU rules: chained lax.scan matvecs, one
device->host transfer as the sync point, identical-signature baseline
subtracted.  Writes results/LARGE_N.json and prints a markdown table.

Usage: python perf/run_largeN.py [quick]
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
from fmm_bem_tpu.kernels.laplace import LaplaceKernel
from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel

P = 5
MODE = sys.argv[1] if len(sys.argv) > 1 else "all"
QUICK = MODE == "quick"


def time_matvec(plan, n, chain=None, iters=3):
    # bound single-call wall-clock: multi-second device calls have
    # been observed to trip the tunnel worker's keepalive
    if chain is None:
        chain = 30 if n <= 300_000 else 8
    slot_ops = plan.solver_ops_slots()
    if slot_ops is not None:
        mv, op4p, to_slots, _, _ = slot_ops
    else:
        mv, op4p = plan.solver_ops()
        to_slots = lambda x: x
    operand = op4p(P)
    q = to_slots(jnp.ones(n, jnp.float32))

    @jax.jit
    def chained(operand, x):
        def step(x, _):
            # mix-style carry: works for any result rank (point
            # kernels return [n, 4] potential+force) while forcing
            # sequential execution
            out = mv(operand, x, P)
            return x * (1.0 + 1e-30 * out.sum()), None

        y, _ = jax.lax.scan(step, x, None, length=chain)
        return y

    @jax.jit
    def ident(operand, x):
        return x * 1.0000001

    t0 = time.time()
    np.asarray(chained(operand, q))
    compile_s = time.time() - t0
    np.asarray(ident(operand, q))
    base = np.inf
    best = np.inf
    for _ in range(iters):
        t0 = time.time()
        np.asarray(ident(operand, q))
        base = min(base, time.time() - t0)
    for _ in range(iters):
        t0 = time.time()
        np.asarray(chained(operand, q))
        best = min(best, time.time() - t0)
    return max(best - base, 1e-9) / chain, compile_s


def near_bytes(plan):
    panels, meta = plan.near_panels()
    if panels is None:
        return 0
    if "A" in panels:
        return int(np.prod(panels["A"].shape)) * 4
    # otf mode: the near store is the correction COO + the otf tiles
    tot = 0
    for k in ("corr_valw", "corr_gleaf", "corr_gidx", "corr_rowof",
              "corr_colp", "corr_valp", "corr_rowof_e"):
        if k in panels:
            tot += int(np.prod(panels[k].shape)) * panels[k].dtype.itemsize
    for grp in ("s_tiles", "t_tiles"):
        for v in panels["otf_tiles"][grp].values():
            tot += int(np.prod(v.shape)) * v.dtype.itemsize
    return tot


def main():
    backend = jax.devices()[0].platform
    out = {"backend": backend, "p": P, "bem": [], "points": []}
    print(f"backend={backend} p={P}", flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "LARGE_N.json",
    )
    # merge into an existing record so bem/points legs can run (and
    # recover from tunnel drops) independently
    if os.path.exists(path):
        try:
            with open(path) as f:
                prev = json.load(f)
            out["bem"] = prev.get("bem", [])
            out["points"] = prev.get("points", [])
            out["bem_otf"] = prev.get("bem_otf", [])
        except Exception:
            pass

    if MODE == "otf":
        # on-the-fly near mode (FMMConfig.near_mode="otf"): the
        # memory-ceiling breaker — record the cached-vs-otf crossover
        # at 524k and the >1M-panel capability point (rec 10 = 2.1M
        # panels, impossible with the ~22 GB cached store)
        legs = [(9, "otf"), (10, "otf")]
    elif MODE == "points":
        legs = []
    else:
        legs = [(r, "cached") for r in ((7, 8) if QUICK else (7, 8, 9))]
    if legs and MODE != "otf":
        out["bem"] = []
    if MODE == "otf":
        out.setdefault("bem_otf", [])
        out["bem_otf"] = []
    for rec, nm in legs:
        tris = unit_sphere(rec)
        n = len(tris)
        fields = make_panels(tris, K=3)
        t0 = time.time()
        plan = FmmPlan(
            LaplaceBEMKernel(K=3), fields,
            FMMConfig(ncrit=64, dtype="float32", max_p=8, leaf_pad=64,
                      near_mode=nm),
        )
        build_s = time.time() - t0
        nb = near_bytes(plan)
        dt, compile_s = time_matvec(plan, n)
        rec_d = {
            "rec": rec, "n_panels": n, "near_mode": nm,
            "build_s": round(build_s, 2),
            "compile_s": round(compile_s, 1),
            "matvec_ms": round(dt * 1e3, 3),
            "pairs_per_s": n * n / dt,
            "near_panel_MB": round(nb / 1e6, 1),
        }
        out["bem_otf" if nm == "otf" else "bem"].append(rec_d)
        print(rec_d, flush=True)
        del plan

    nlist = (
        () if MODE in ("bem", "otf")
        else (250_000,) if QUICK
        else (125_000, 250_000, 500_000, 1_000_000)
    )
    if nlist:
        out["points"] = []
    for n in nlist:
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 1, (n, 3))
        t0 = time.time()
        plan = FmmPlan(
            LaplaceKernel(), {"xyz": pts},
            FMMConfig(ncrit=125, dtype="float32", max_p=8),
        )
        build_s = time.time() - t0
        dt, compile_s = time_matvec(plan, n)
        rec_d = {
            "n": n, "build_s": round(build_s, 2),
            "compile_s": round(compile_s, 1),
            "matvec_ms": round(dt * 1e3, 3),
            "pairs_per_s": n * n / dt,
        }
        out["points"].append(rec_d)
        print(rec_d, flush=True)
        del plan

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "LARGE_N.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}\n")

    print("| workload | N | build s | matvec ms | eff. pairs/s | "
          "near MB |")
    print("|---|---:|---:|---:|---:|---:|")
    for r in out["bem"] + out.get("bem_otf", []):
        nm = r.get("near_mode", "cached")
        print(f"| BEM sphere rec {r['rec']} ({nm}) | {r['n_panels']:,} "
              f"| {r['build_s']} | {r['matvec_ms']} | "
              f"{r['pairs_per_s']:.3e} | {r['near_panel_MB']} |")
    for r in out["points"]:
        print(f"| points ncrit=125 | {r['n']:,} | {r['build_s']} | "
              f"{r['matvec_ms']} | {r['pairs_per_s']:.3e} | — |")


if __name__ == "__main__":
    main()
