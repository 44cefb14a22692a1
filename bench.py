#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: effective interactions/s of the Laplace-BEM-sphere FMM matvec
(the BASELINE.md north star).  vs_baseline is the accelerator-vs-host-CPU
throughput ratio on the identical workload (the reference publishes no
absolute numbers to compare against — BASELINE.json "published": {}).

Budgeting: a HARD global deadline (FMM_BENCH_DEADLINE, default 1100 s)
bounds the whole run.  The accelerator attempt runs FIRST and its JSON
is stashed to results/ the moment it lands; the CPU baseline is reused
from results/bench_cpu_cache.json when present (it is workload-pinned
and changes only when the bench workload does), so a tight deadline
never costs the headline TPU measurement.  Each attempt runs in a
subprocess with the REMAINING budget as its timeout and is told that
budget (FMM_BENCH_BUDGET_S) so it can skip optional stages instead of
being killed.
"""

import json
import os
import subprocess
import sys
import time

REC = int(os.environ.get("FMM_BENCH_RECURSIONS", "8"))
DEADLINE = float(os.environ.get("FMM_BENCH_DEADLINE", "1100"))
_HERE = os.path.dirname(os.path.abspath(__file__))
CPU_CACHE = os.path.join(_HERE, "results", "bench_cpu_cache.json")
LAST_OUT = os.path.join(_HERE, "results", "bench_last.json")

_T0 = time.time()


def _remaining():
    return DEADLINE - (time.time() - _T0)


def _run_at(backend, rec, timeout):
    if timeout < 60:
        return None
    env = dict(os.environ)
    env["FMM_BENCH_BUDGET_S"] = str(int(timeout))
    stdout = ""
    try:
        out = subprocess.run(
            [
                sys.executable,
                "-m",
                "fmm_bem_tpu.utils.bench_impl",
                backend,
                str(rec),
            ],
            capture_output=True,
            text=True,
            timeout=timeout,
            cwd=_HERE,
            env=env,
        )
        stdout = out.stdout or ""
    except subprocess.TimeoutExpired as e:
        # the impl prints an intermediate record BEFORE the optional
        # compile-heavy stages — a killed subprocess still yields the
        # headline measurement
        so = e.stdout or b""
        stdout = so.decode() if isinstance(so, bytes) else so
    except Exception:
        return None
    try:
        for line in reversed(stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except Exception:
        pass
    return None


def _stash(obj, path):
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(obj, f, indent=1)
    except Exception:
        pass


def _cached_cpu(rec):
    try:
        with open(CPU_CACHE) as f:
            r = json.load(f)
        if r.get("recursions") == rec and r.get("value", 0) > 0:
            return r
    except Exception:
        pass
    return None


def main():
    # accelerator first — the headline number.  Reserve ~90 s of the
    # deadline for a (possible) live CPU run + emit.  A cold XLA
    # persistent cache costs ~500 s of tunneled compiles at REC=8, so
    # a killed first attempt is RETRIED at the same size: every compile
    # the first attempt finished is already in /tmp/jax_ccache, and the
    # in-run budget guard skips optional stages on the short retry.
    accel = _run_at("default", REC, min(_remaining() - 90, 850))
    rec_used = REC
    if accel is None and _remaining() > 150:
        accel = _run_at("default", REC, _remaining() - 70)
    if accel is None:
        rec_used = REC - 1
        accel = _run_at("default", rec_used, min(_remaining() - 60, 600))
    if accel is not None:
        _stash(accel, LAST_OUT)

    if accel is not None and accel.get("backend") == "cpu":
        cpu = accel  # no accelerator present; accel run == cpu run
        accel = None
    else:
        cpu = _cached_cpu(rec_used)
        if cpu is None and _remaining() > 120:
            cpu = _run_at("cpu", rec_used, _remaining() - 20)
            if cpu is not None:
                cpu["recursions"] = rec_used
                _stash(cpu, CPU_CACHE)

    if accel is not None:
        value = accel["value"]
        vs = value / cpu["value"] if cpu else 1.0
        backend = accel["backend"]
    elif cpu is not None:
        value = cpu["value"]
        vs = 1.0
        backend = "cpu"
    else:
        print(
            json.dumps(
                {
                    "metric": "laplace_bem_fmm_matvec_interactions_per_s",
                    "value": 0.0,
                    "unit": "pairs/s",
                    "vs_baseline": 0.0,
                    "error": "all benchmark runs failed",
                }
            )
        )
        return

    # Full record (with per-phase detail) goes to results/; stdout gets
    # ONLY a compact summary as the FINAL line.  Rounds 1-3 printed the
    # whole detail object on one ~3 KB line and the driver's tail
    # capture truncated it front-first — rc=0 but parsed: null.  The
    # compact line is a few hundred bytes and always survives.
    result = {
        "metric": "laplace_bem_fmm_matvec_interactions_per_s",
        "value": value,
        "unit": "pairs/s",
        "vs_baseline": vs,
        "backend": backend,
        "detail": {"accel": accel, "cpu": cpu},
    }
    _stash(result, LAST_OUT)
    src = accel if accel is not None else cpu
    compact = {
        "metric": "laplace_bem_fmm_matvec_interactions_per_s",
        "value": value,
        "unit": "pairs/s",
        "vs_baseline": round(vs, 3),
        "backend": backend,
        "n_panels": src.get("n_panels"),
        "matvec_s": src.get("matvec_s"),
        "solve_s": src.get("solve_s"),
        "detail_file": "results/bench_last.json",
    }
    line = json.dumps(compact)
    if len(line) > 900:  # belt and braces: never exceed tail capture
        line = json.dumps({k: compact[k] for k in
                           ("metric", "value", "unit", "vs_baseline")})
    print(line)


if __name__ == "__main__":
    main()
