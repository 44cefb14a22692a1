"""Run utils/roofline.phase_breakdown on the attached backend and print
the per-phase table (production slot-space layout when available).

Usage: python perf/run_phases.py [recursions] [p]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import FMMConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel
from fmm_bem_tpu.utils.roofline import phase_breakdown

REC = int(sys.argv[1]) if len(sys.argv) > 1 else 7
P = int(sys.argv[2]) if len(sys.argv) > 2 else 5

tris = unit_sphere(REC)
fields = make_panels(tris, K=3)
t0 = time.time()
plan = FmmPlan(
    LaplaceBEMKernel(K=3), fields,
    FMMConfig(ncrit=64, dtype="float32", max_p=max(P, 10)),
)
print(
    f"panels={len(tris)} p={P} backend={jax.devices()[0].platform} "
    f"build={time.time()-t0:.1f}s",
    flush=True,
)
out = phase_breakdown(plan, P, chain=24, iters=3)
print(json.dumps(out, indent=1))
