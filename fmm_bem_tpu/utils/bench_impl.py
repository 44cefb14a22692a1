"""Benchmark implementation: Laplace BEM sphere FMM matvec throughput.

North-star metric per BASELINE.md: FMM matvec effective interactions/s
per chip on the Laplace BEM sphere (interactions = N^2 source-target
pairs served by the O(N) hierarchical matvec).  The reference publishes
no numbers (BASELINE.json "published": {}), so the recorded ratio is
TPU-chip throughput vs this host's CPU on the identical workload.

Run as a module:  python -m fmm_bem_tpu.utils.bench_impl [cpu|default]
Prints one JSON line {"value": interactions/s, "solve_s": ..., ...}.
"""

from __future__ import annotations

import json
import sys
import time


def run(backend="default", recursions=7, p=5, iters=10, chain=50):
    import jax

    t_start = time.time()
    # the caller (bench.py) passes its remaining wall-clock budget so
    # optional stages degrade gracefully instead of the subprocess
    # being killed with everything lost
    import os

    budget = float(os.environ.get("FMM_BENCH_BUDGET_S", "1e9"))

    def elapsed():
        return time.time() - t_start

    def note(msg):
        # stderr progress marks (stdout carries only the JSON line)
        print(f"[bench +{elapsed():6.1f}s] {msg}", file=sys.stderr,
              flush=True)

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: repeat benches / production runs
    # skip the (tens of seconds) XLA compile entirely
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from fmm_bem_tpu.bem.panels import make_panels
    from fmm_bem_tpu.bem.triangulation import unit_sphere
    from fmm_bem_tpu.config import FMMConfig
    from fmm_bem_tpu.executor.plan import FmmPlan
    from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel

    platform = jax.devices()[0].platform
    if platform == "cpu":
        chain = max(2, chain // 10)
        iters = max(1, iters // 5)
    note(f"start backend={platform} rec={recursions}")
    tris = unit_sphere(recursions)
    fields = make_panels(tris, K=3)
    n = len(tris)

    t0 = time.time()
    plan = FmmPlan(
        LaplaceBEMKernel(K=3),
        fields,
        # max_p 10: the phase record runs at both p=5 and p=10, and the
        # first-kind relaxed solve uses tiers (3, 5, 10).
        # leaf_pad 64: ncrit bounds leaf occupancy at 64 anyway; the
        # even tile makes the near-field chunk lanes exactly
        # m0*KS*cdim = 128 (no relayout pad) and keeps sublanes aligned
        FMMConfig(ncrit=64, dtype="float32", max_p=max(p, 10),
                  leaf_pad=64),
    )
    build_s = time.time() - t0
    note(f"plan built ({build_s:.1f}s)")

    # sustained matvec throughput: chain `chain` matvecs inside one jit
    # (exactly how the device-resident GMRES consumes them) so the
    # number reflects the chip, not the host/tunnel dispatch overhead.
    # The production solve path is SLOT-space (tile-resident Krylov
    # vectors, see FmmPlan.solver_ops_slots) — measure that.
    slot_ops = plan.solver_ops_slots()
    if slot_ops is not None:
        mv, op4p, to_slots, from_slots, _ = slot_ops
    else:
        mv, op4p = plan.solver_ops()
        to_slots = from_slots = lambda x: x
    note("building solver operand (near panels + slot tables)")
    operand = op4p(p)
    note("operand ready")

    @jax.jit
    def chained(operand, q):
        def step(carry, _):
            return mv(operand, carry, p), None

        o, _ = jax.lax.scan(step, q, None, length=chain)
        return o

    # NOTE: block_until_ready does not actually block on tunneled
    # backends — every timing below forces a device->host transfer
    # (np.asarray) and subtracts a baseline measured with the SAME
    # argument signature (per-call dispatch overhead scales with the
    # operand pytree; a q-only baseline under-subtracts by tens of ms).
    # Each timed call gets a distinct charge vector and the minimum
    # over calls is reported (the per-call overhead carries ~15 ms of
    # jitter the min rejects).
    @jax.jit
    def ident(operand, q):
        return q * 1.0000001

    q = to_slots(jnp.ones(n, jnp.float32))
    qs = [q * (1.0 + 1e-5 * r) for r in range(iters)]
    for qr in qs:
        qr.block_until_ready()
    note("compiling chained matvec")
    np.asarray(ident(operand, q))
    t0 = time.time()
    out = np.asarray(chained(operand, q))
    compile_s = time.time() - t0
    note(f"chain compiled ({compile_s:.1f}s); timing")

    t_base = np.inf
    for r in range(iters):
        t0 = time.time()
        np.asarray(ident(operand, qs[r]))
        t_base = min(t_base, time.time() - t0)

    dt = np.inf
    for r in range(iters):
        t0 = time.time()
        out = np.asarray(chained(operand, qs[r]))
        dt = min(dt, time.time() - t0)
    dt = max(dt - t_base, 1e-9) / chain

    stage_s = {"chain_done": round(time.time() - t_start, 1)}
    note("chain timed")

    # every stage below is optional enrichment of the headline number —
    # a transient tunnel failure (observed: "response body closed")
    # must not lose the record, so stages run guarded and the current
    # record is re-printed as stages land (the driver parses the LAST
    # json line on stdout)
    qn = np.ones(n, dtype=np.float32)
    dt_single = None
    solve_s = None
    sol_err = None
    info = None
    near_equiv = None
    fk = None
    phases = {"pending": True}
    phases_p10 = None

    def result():
        value = (float(n) * float(n)) / dt
        return {
            "backend": platform,
            "n_panels": n,
            "p": p,
            "matvec_s": dt,
            "matvec_dispatched_s": dt_single,
            "build_s": build_s,
            "compile_s": compile_s,
            "solve_s": solve_s,
            "solve_iters": None if info is None else info.iterations,
            "solve_converged": None if info is None
            else bool(info.converged),
            "solution_err": sol_err,
            "near_equiv_err": near_equiv,
            "solve_first_kind_relaxed": fk,
            "stage_s": dict(stage_s),
            "phases": phases,
            "phases_p10": phases_p10,
            "value": value,
        }

    def checkpoint():
        print(json.dumps(result()), flush=True)

    checkpoint()

    def stage(name, fn, margin):
        if elapsed() >= budget - margin:
            note(f"{name}: skipped (budget)")
            return
        try:
            fn()
        except Exception as e:  # transient tunnel/compile failures
            note(f"{name} FAILED: {type(e).__name__}: {e}")
        stage_s[f"{name}_done"] = round(time.time() - t_start, 1)
        checkpoint()

    def _dispatched():
        nonlocal dt_single
        np.asarray(plan.apply(qn, p=p))
        t0 = time.time()
        for _ in range(iters):
            np.asarray(plan.apply(qn, p=p))
        dt_single = (time.time() - t0) / iters

    stage("dispatched", _dispatched, 240)

    # GMRES solve wall-clock (the BASELINE.md secondary metric):
    # second-kind sphere equation (well-conditioned; ref -second_kind
    # mode): system = dGdn operator (flipped BC), RHS = G . (dphi/dn=1),
    # analytic solution phi = 1.  Device-resident solver: whole Arnoldi
    # blocks run inside one lax.while_loop per p-tier.
    from fmm_bem_tpu.config import SolverConfig
    from fmm_bem_tpu.solver.gmres import DeviceGmresContext, gmres_device

    def _solve():
        # second-kind sphere equation (well-conditioned; ref
        # -second_kind mode): system = dGdn operator (flipped BC),
        # RHS = G . (dphi/dn=1), analytic solution phi = 1.  The
        # reference's default residual tolerance (SolverOptions.hpp:23)
        # is achievable in f32 on TPU since the framework forces
        # true-f32 matmul precision — and the device solver verifies
        # the TRUE residual after back-substitution, unlike the
        # reference which trusts the Givens recurrence
        nonlocal solve_s, sol_err, info
        b = np.asarray(plan.apply(qn, p=p)[:, 0])
        slot_f = plan.solver_ops_slots(flipped=True)
        if slot_f is not None:
            mvf, op4pf, to_s, from_s = slot_f[:4]
            b = to_s(b)
        else:
            mvf, op4pf = plan.solver_ops(flipped=True)
            from_s = lambda x: x
        cfg = SolverConfig(residual=1e-5, max_p=p, max_iters=60, restart=60)
        ctx = DeviceGmresContext()
        # compile pass (tier executable + finish), then timed solve
        x, info_ = gmres_device(
            mvf, b, operand_for_p=op4pf, config=cfg, p_fixed=p, context=ctx
        )
        t0 = time.time()
        x, info_ = gmres_device(
            mvf, b, operand_for_p=op4pf, config=cfg, p_fixed=p, context=ctx
        )
        solve_s = time.time() - t0
        info = info_
        sol_err = float(
            np.linalg.norm(np.asarray(from_s(x)) - 1.0) / np.sqrt(n)
        )

    stage("solve", _solve, 150)
    note("solve done")

    # the reference's DEFAULT workload: the FIRST-kind equation
    # (LaplaceBEM.cpp:190) solved with the paper's headline feature —
    # relaxed p quantised to TPU tiers (the recommended relaxed mode,
    # results/RELAX_TPU.md).  System = G operator (unflipped BC),
    # RHS = dGdn . phi via the flipped-BC matvec; analytic dphi/dn = 1.
    def _first_kind():
        nonlocal fk
        if slot_ops is None:
            return
        note("first-kind relaxed solve (tiers 3/5/10)")
        bfk = to_slots(
            jnp.asarray(np.asarray(plan.apply_flipped_bc(qn, p=10)[:, 0]))
        )
        cfg_fk = SolverConfig(
            residual=1e-5, max_iters=100, restart=100,
            max_p=10, p_min=1, p_tiers=(3, 5, 10),
        )
        ctx_fk = DeviceGmresContext()
        xf, infof = gmres_device(
            mv, bfk, operand_for_p=op4p, config=cfg_fk, context=ctx_fk
        )
        t0 = time.time()
        xf, infof = gmres_device(
            mv, bfk, operand_for_p=op4p, config=cfg_fk, context=ctx_fk
        )
        fk_s = time.time() - t0
        fk = {
            "solve_s": fk_s,
            "iters": infof.iterations,
            "converged": bool(infof.converged),
            "residual": infof.residual,
            "err": float(
                np.linalg.norm(np.asarray(from_slots(xf)) - 1.0)
                / np.sqrt(n)
            ),
            "p_schedule": [int(h[2]) for h in infof.history],
        }
        note(
            f"first-kind relaxed: {infof.iterations} its, "
            f"{fk_s:.2f}s, converged={infof.converged}"
        )

    stage("first_kind", _first_kind, 180)

    def _near_equiv():
        # near-field kernel equivalence ON THIS BACKEND (the Pallas
        # panel contraction vs the reference einsum on identical device
        # arrays) — the numerical guard the CPU-only suite cannot give
        nonlocal near_equiv
        from fmm_bem_tpu.ops.near_panel import panel_matvec

        d = plan.device_data(p)
        aux = plan.variant_aux(p)
        qm = jnp.asarray(qn)[d["s_perm"]]
        ql = jnp.where(
            d["s_leaf_body_mask"], qm[d["s_leaf_body_idx"]], 0.0
        )
        o_pal = np.asarray(
            panel_matvec(aux["panels"], plan._near_meta, ql)
        )
        o_ein = np.asarray(
            panel_matvec(
                aux["panels"], plan._near_meta, ql, use_pallas=False
            )
        )
        near_equiv = float(
            np.linalg.norm(o_pal - o_ein)
            / max(np.linalg.norm(o_ein), 1e-30)
        )

    stage("near_equiv", _near_equiv, 120)
    note("phases next")

    from fmm_bem_tpu.utils.roofline import phase_breakdown

    def _round(d):
        return {
            k: {
                kk: (round(float(vv), 3) if vv is not None else None)
                if not isinstance(vv, bool) else vv
                for kk, vv in v.items()
            }
            for k, v in d.items()
        }

    def _phases_p5():
        # the bench headline (min-of-10 chained calls) is the most
        # robust matvec number in this record — it anchors sum_ratio
        nonlocal phases
        phases = _round(
            phase_breakdown(plan, p, mv_ms_ref=dt * 1e3)
        )

    def _phases_p10():
        nonlocal phases_p10
        phases_p10 = _round(phase_breakdown(plan, 10))

    stage("phases_p5", _phases_p5, 240)
    stage("phases_p10", _phases_p10, 180)

    return result()


if __name__ == "__main__":
    backend = sys.argv[1] if len(sys.argv) > 1 else "default"
    rec = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    print(json.dumps(run(backend, recursions=rec)))
