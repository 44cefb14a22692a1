"""
[timing note: the chain step consumes the FULL output sum —
a sliced consumer lets XLA dead-code most of the work]
Replicate the EXACT in-situ m2l bucket_sum indices in isolation to
find why the in-situ reduction runs ~4x slower than the synthetic
microbenchmark (1.5 ns/row vs 5-7 ns/row).

Usage: python perf/probe_bucket_exact.py [recursions]
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

CHAIN = 200
ITERS = 3
_BASE = None


def timed(name, fn, data, x0, bytes_=0):
    global _BASE

    @jax.jit
    def run(data, x):
        def step(c, _):
            xm = x * (1.0 + 1e-12 * c)
            out = fn(data, xm)
            return out.astype(jnp.float32).sum() * 1e-20, None

        o, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=CHAIN)
        return o

    @jax.jit
    def ident(x):
        return x.reshape(-1)[:8].sum() * 1.0000001

    if _BASE is None:
        np.asarray(ident(x0))
        t0 = time.time()
        for _ in range(ITERS):
            np.asarray(ident(x0))
        _BASE = (time.time() - t0) / ITERS

    np.asarray(run(data, x0))
    t0 = time.time()
    for _ in range(ITERS):
        np.asarray(run(data, x0))
    dt = max((time.time() - t0) / ITERS - _BASE, 1e-9) / CHAIN
    line = f"{name:46s} {dt*1e3:8.3f} ms"
    if bytes_:
        line += f"  {bytes_/dt/1e9:7.1f} GB/s"
    print(line, flush=True)
    return dt


def main():
    from fmm_bem_tpu.bem.panels import make_panels
    from fmm_bem_tpu.bem.triangulation import unit_sphere
    from fmm_bem_tpu.config import FMMConfig
    from fmm_bem_tpu.executor.plan import FmmPlan
    from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel

    REC = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tris = unit_sphere(REC)
    plan = FmmPlan(
        LaplaceBEMKernel(K=3), make_panels(tris, K=3),
        FMMConfig(ncrit=64, dtype="float32", max_p=10),
    )
    bs = plan.m2l_bsum
    idxs = tuple(jnp.asarray(i) for i in bs.idx)
    P = bs.nin
    cW = 60
    nrows = sum(int(np.prod(i.shape)) for i in bs.idx)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((P + 1, cW)).astype(np.float32))
    print(f"P={P} nrows={nrows} buckets={[i.shape for i in bs.idx]}",
          flush=True)

    timed("REAL idx: fused x[idx].sum(1) per bucket",
          lambda d, x_: jnp.concatenate(
              [(x_ * 1.0)[i].sum(1) for i in d]),
          idxs, x, bytes_=nrows * cW * 4)

    # randomised same-shape indices
    ridxs = tuple(
        jnp.asarray(rng.integers(0, P, i.shape).astype(np.int32))
        for i in bs.idx
    )
    timed("RAND idx: fused x[idx].sum(1) per bucket",
          lambda d, x_: jnp.concatenate(
              [(x_ * 1.0)[i].sum(1) for i in d]),
          ridxs, x, bytes_=nrows * cW * 4)

    # real indices WITHOUT the dummy-row trick (clamp instead)
    cidxs = tuple(jnp.minimum(i, P - 1) for i in idxs)
    timed("REAL idx clamped (no dummy row)",
          lambda d, x_: jnp.concatenate(
              [(x_ * 1.0)[i].sum(1) for i in d]),
          cidxs, x, bytes_=nrows * cW * 4)

    # one-hot padded-lane variant: gather rows as [*,64] slices?
    # try gathering from a 128-lane padded table
    x128 = jnp.pad(x, ((0, 0), (0, 68)))
    timed("REAL idx from 128-lane table",
          lambda d, x_: jnp.concatenate(
              [(x_ * 1.0)[i].sum(1)[:, :cW] for i in d]),
          idxs, x128, bytes_=nrows * 128 * 4)

    # the production form: clamped idx + mask multiply + barrier input
    masks = tuple(
        jnp.asarray((np.asarray(i) < P).astype(np.float32))
        for i in bs.idx
    )

    def prod_form(d, x_):
        import jax as _jax

        xb = _jax.lax.optimization_barrier(x_ * 1.0)
        parts = [
            (xb[i] * m[..., None]).sum(1)
            for i, m in zip(d[0], d[1])
        ]
        return jnp.concatenate(parts)

    timed("clamped idx + mask + barrier (production)",
          prod_form, (cidxs, masks), x, bytes_=nrows * cW * 4)

    def nomask_barrier(d, x_):
        import jax as _jax

        xb = _jax.lax.optimization_barrier(x_ * 1.0)
        return jnp.concatenate([xb[i].sum(1) for i in d])

    timed("clamped idx + barrier, no mask", nomask_barrier, cidxs, x,
          bytes_=nrows * cW * 4)


if __name__ == "__main__":
    main()
