"""
[timing note: the chain step consumes the FULL output sum —
a sliced consumer lets XLA dead-code most of the work]
Does padding gather rows to 128 lanes (512B) fix the large-table
gather rate?  The M2L bucket reduction gathers ~200k rows of 240B from
a ~50MB table at ~55 GB/s; the microbench shows 512B rows from an 8MB
table run at ~800 GB/s.  This isolates table size vs row width.

Usage: python perf/probe_bucket_width.py
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
        line += f"  {bytes_/dt/1e9:7.1f} GB/s ({100*bytes_/dt/819e9:5.1f}%)"
    print(line, flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    P = 196608  # ~m2l padded pairs at TS=32
    # bucket structure mimicking the 131k workload
    i24 = jnp.asarray(rng.integers(0, P, (2100, 24)), jnp.int32)
    i40 = jnp.asarray(rng.integers(0, P, (2400, 40)), jnp.int32)
    i64 = jnp.asarray(rng.integers(0, P, (700, 64)), jnp.int32)
    idxs = (i24, i40, i64)
    nrows = sum(int(np.prod(i.shape)) for i in idxs)

    for w in (60, 128):
        x = jnp.asarray(
            rng.standard_normal((P + 1, w)).astype(np.float32))
        gbytes = nrows * w * 4

        def gsum(d, x_):
            return jnp.concatenate([(x_ * 1.0)[i].sum(1) for i in d])

        timed(f"gather+sum w={w} table={4*(P+1)*w/1e6:.0f}MB",
              gsum, idxs, x, bytes_=gbytes)

        def bare(d, x_):
            return jnp.concatenate(
                [(x_ * 1.0)[i.reshape(-1)] for i in d])

        timed(f"bare gather w={w}", bare, idxs, x, bytes_=2 * gbytes)

    # fused pad-write + wide gather-sum: einsum writes [P,128], bucket
    # sums from it
    x60 = jnp.asarray(rng.standard_normal((P, 60)).astype(np.float32))

    def pad_then_gsum(d, x_):
        xp = jnp.pad(x_ * 1.0, ((0, 1), (0, 68)))
        return jnp.concatenate([xp[i].sum(1) for i in d])

    timed("pad60->128 write + gather+sum", pad_then_gsum, idxs, x60,
          bytes_=nrows * 128 * 4 + P * 128 * 4)


if __name__ == "__main__":
    main()
