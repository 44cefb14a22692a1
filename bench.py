#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: effective interactions/s of the Laplace-BEM-sphere FMM matvec
(the BASELINE.md north star).  Each backend attempt runs in a
subprocess with a timeout so a wedged accelerator tunnel degrades to a
CPU measurement instead of hanging the driver.  vs_baseline is the
accelerator-vs-host-CPU throughput ratio on the identical workload
(the reference publishes no absolute numbers to compare against —
BASELINE.json "published": {}).
"""

import json
import os
import subprocess
import sys

REC = int(os.environ.get("FMM_BENCH_RECURSIONS", "8"))
TIMEOUT = int(os.environ.get("FMM_BENCH_TIMEOUT", "1400"))


def _run_at(backend, rec):
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
            timeout=TIMEOUT,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except Exception:
        pass
    return None


def _run(backend):
    # shrink the problem if the full size exceeds the per-run timeout
    for rec in (REC, REC - 1):
        r = _run_at(backend, rec)
        if r is not None:
            return r
    return None


def main():
    accel = _run("default")
    if accel is not None and accel.get("backend") == "cpu":
        # no accelerator present; accel run == cpu run
        cpu = accel
        accel = None
    else:
        cpu = _run("cpu")

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

    print(
        json.dumps(
            {
                "metric": "laplace_bem_fmm_matvec_interactions_per_s",
                "value": value,
                "unit": "pairs/s",
                "vs_baseline": vs,
                "backend": backend,
                "detail": {"accel": accel, "cpu": cpu},
            }
        )
    )


if __name__ == "__main__":
    main()
