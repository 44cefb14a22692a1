"""The paper's flagship experiment, recorded on TPU.

Relaxed-p GMRES vs fixed-p GMRES at equal final accuracy on the
FIRST-KIND Laplace BEM sphere (the reference's default hard workload:
LaplaceBEM.cpp:190 solves for dphi/dn given phi with no -second_kind
flag; the relaxation strategy is SolverOptions::predict_p,
examples/BEM/SolverOptions.hpp:25-38 / GMRES.hpp:195-225).

Runs on the attached accelerator with the device-resident slot-space
GMRES.  Each mode is run twice; the SECOND (warm, all p-tiers
compiled) wall-clock is reported.  Writes results/RELAX_TPU.json and
prints a markdown table for PERF.md.

Usage: python perf/relax_experiment.py [recursions] [max_p] [rhs]

rhs: "uniform" (phi = 1, the trivial constant data — converges in ~3
iterations at bench scale, barely exercising relaxation) or "charge"
(default; boundary data from an off-center interior point charge,
phi = 1/|x - x0| with x0 = (0.5, 0.3, 0.2) — multipolar-rich data the
first-kind operator's decaying spectrum resolves slowly, the regime
the paper's claim is about.  Exact solution dphi/dn =
n.(x - x0)/|x - x0|^3 in this mesh's normal convention, verified
against the f64 host solve at rec 4.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from fmm_bem_tpu.bem.integrals import near_entries_laplace
from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import FMMConfig, SolverConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel
from fmm_bem_tpu.solver.gmres import DeviceGmresContext, gmres_device

REC = int(sys.argv[1]) if len(sys.argv) > 1 else 7
MAX_P = int(sys.argv[2]) if len(sys.argv) > 2 else 10
RHS = sys.argv[3] if len(sys.argv) > 3 else "charge"
TOL = 1e-5


def main():
    tris = unit_sphere(REC)
    n = len(tris)
    fields = make_panels(tris, K=3)
    kern = LaplaceBEMKernel(K=3)
    t0 = time.time()
    plan = FmmPlan(
        kern, fields,
        # leaf_pad pinned like the bench: constant tile shapes across
        # sizes (and no auto-ncrit retune changing the workload mid-
        # comparison)
        FMMConfig(ncrit=64, dtype="float32", max_p=MAX_P, leaf_pad=64),
    )
    print(
        f"panels={n} max_p={MAX_P} backend={jax.devices()[0].platform} "
        f"build={time.time()-t0:.1f}s",
        flush=True,
    )

    # RHS: b = (dGdn operator) @ phi — the flipped-BC matvec replaces
    # the reference's full plan rebuild (LaplaceBEM.cpp:218-232)
    if RHS == "charge":
        x0 = np.array([0.5, 0.3, 0.2])
        xyz = np.asarray(fields["xyz"])
        nrm = np.asarray(fields["normal"])
        dvec = xyz - x0
        r = np.linalg.norm(dvec, axis=1)
        phi = 1.0 / r
        exact = (nrm * dvec).sum(1) / r**3
    else:
        phi = np.ones(n)
        exact = np.ones(n)
    b_user = np.asarray(plan.apply_flipped_bc(phi, p=MAX_P)[:, 0])
    # the flipped-BC RHS evaluation cached a SECOND near-panel store
    # (~5.6 GB at 524k panels) plus full-p body tables; the solve needs
    # only the default variant — drop the device caches so both
    # variants never coexist (the 524k leg OOM'd exactly here)
    plan._near_panel_cache.clear()
    for attr in ("_aux_cache", "_aux_slots_cache",
                 "_p2m_tab_cache", "_l2p_tab_cache"):
        if hasattr(plan, attr):
            setattr(plan, attr, {})

    # the system operator is the DEFAULT-BC plan (first kind: solve
    # G dphi/dn = b); diagonal PC like the reference driver default
    mv, op4p, to_slots, from_slots, _ = plan.solver_ops_slots()
    idx = np.arange(n)
    G, dG = near_entries_laplace(fields, fields, idx, idx,
                                 fine_K=kern.fine_K)
    diag = np.where(np.asarray(fields["bc"]) == 0.0, G, dG)
    inv_slots = to_slots(1.0 / diag.astype(np.float32))
    M = lambda r: inv_slots * r

    b = to_slots(b_user)
    trim_early = os.environ.get("RELAX_MODES", "all") == "trim"
    if trim_early:
        # the calibrated mode is skipped in trim runs; don't pay the
        # body-order probe matvecs (they OOM'd the 524k leg: the body
        # path's full-p tables stack on top of the slot tables)
        calib = (None, None)
    else:
        calib = plan.calibrate_eps()
        print(f"calibrated eps(p): c={calib[0]}, gamma={calib[1]}",
              flush=True)

    def run(label, cfg, p_fixed):
        # the tunneled backend drops a connection every ~15 min of
        # sustained compiles; one retry rebuilds the executable cache
        # from the persistent compile cache in seconds
        for attempt in range(3):
            try:
                return _run(label, cfg, p_fixed)
            except Exception as e:
                print(f"{label}: attempt {attempt} failed "
                      f"({type(e).__name__}); retrying", flush=True)
                time.sleep(5)
        return _run(label, cfg, p_fixed)

    def _run(label, cfg, p_fixed):
        ctx = DeviceGmresContext()
        times = []
        for rep in range(2):
            t0 = time.time()
            x, info = gmres_device(
                mv, b, operand_for_p=op4p, config=cfg,
                p_fixed=p_fixed, M=M, context=ctx,
            )
            times.append(time.time() - t0)
        xu = np.asarray(from_slots(x))
        err = float(
            np.linalg.norm(xu - exact) / np.linalg.norm(exact)
        )
        ps = [h[2] for h in info.history]
        rec = {
            "label": label,
            "iterations": info.iterations,
            "converged": bool(info.converged),
            "residual": float(info.residual),
            "solution_err": err,
            "solve_s_warm": round(times[-1], 3),
            "solve_s_cold": round(times[0], 3),
            "p_trajectory": ps,
        }
        print(
            f"{label:28s} its={info.iterations:3d} warm={times[-1]:7.3f}s "
            f"err={err:.3e} conv={info.converged} "
            f"p:{ps[:3]}..{ps[-3:] if ps else []}",
            flush=True,
        )
        return rec

    base = dict(residual=TOL, max_p=MAX_P, max_iters=150, restart=150)
    #: RELAX_MODES=trim runs only the headline comparison (big-N runs
    #: where the continuous modes' per-p compiles cost minutes each)
    trim = os.environ.get("RELAX_MODES", "all") == "trim"
    results = [
        run("fixed p=5 (ref default)",
            SolverConfig(**base), p_fixed=5),
        run("fixed p=8",
            SolverConfig(**base), p_fixed=8),
        run(f"fixed p={MAX_P}",
            SolverConfig(**base), p_fixed=MAX_P),
    ]
    if not trim:
        results += [
            run("relaxed Bouras p_min=1",
                SolverConfig(**base, p_min=1, variable_p=True), None),
            run("relaxed Bouras p_min=3",
                SolverConfig(**base, p_min=3, variable_p=True), None),
        ]
    # precompute the tier operands, then drop the full-p BODY tables
    # they were sliced from — at 524k those caches (~1 GB) pushed the
    # 3-tier solve over the 16 GB chip on top of the 5.6 GB near store
    tier_env = os.environ.get("RELAX_TIERS", "3,5,max")
    tiers = tuple(
        MAX_P if t == "max" else int(t) for t in tier_env.split(",")
    )
    for pt in tiers:
        op4p(pt)
    for attr in ("_p2m_tab_cache", "_l2p_tab_cache"):
        if hasattr(plan, attr):
            setattr(plan, attr, {})
    results.append(
        run(f"relaxed tiers {tiers}",
            SolverConfig(**base, p_min=1, variable_p=True,
                         p_tiers=tiers), None)
    )
    if calib[0] is not None and not trim:
        scfg = SolverConfig(**base, p_min=1, variable_p=True)
        scfg = scfg.calibrated(plan)
        results.append(run("relaxed calibrated eps(p)", scfg, None))

    out = {
        "n_panels": n,
        "max_p": MAX_P,
        "rhs": RHS,
        "tol": TOL,
        "backend": jax.devices()[0].platform,
        "eps_calib": calib,
        "runs": [
            {k: v for k, v in r.items() if k != "p_trajectory"}
            | {"p_counts": {
                str(p): [h for h in r["p_trajectory"]].count(p)
                for p in sorted(set(r["p_trajectory"]))
            }}
            for r in results
        ],
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "RELAX_TPU.json",
    )
    # one file, one record per (size, rhs): big-N legs merge instead of
    # clobbering the 131k record
    merged = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                prev = json.load(f)
            merged = prev if "runs" not in prev else {}
        except Exception:
            pass
    merged[f"{n}_{RHS}"] = out
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"\nwrote {path}\n")

    print("| mode | iterations | p per iteration | warm solve | "
          "solution err |")
    print("|---|---:|---|---:|---:|")
    for r in results:
        ps = r["p_trajectory"]
        cnt = {}
        for p in ps:
            cnt[p] = cnt.get(p, 0) + 1
        pdesc = ", ".join(
            f"{c}x p={p}" for p, c in sorted(cnt.items(), reverse=True)
        )
        print(
            f"| {r['label']} | {r['iterations']} | {pdesc} | "
            f"{r['solve_s_warm']:.2f} s | {r['solution_err']:.2e} |"
        )


if __name__ == "__main__":
    main()
