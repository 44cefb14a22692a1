"""Synthetic TPU gather microbench: row-gather speed vs row width."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CHAIN = 30
ITERS = 3
rng = np.random.default_rng(0)


def timed(label, fn, *args, nbytes=0):
    def run_(*a):
        def step(c, _):
            out = fn(c, *a[1:])
            s = out
            while s.ndim > 0:
                s = s.sum(axis=-1) if s.ndim > 1 else s.sum()
            return c * (1.0 + 1e-30 * s), None
        y, _ = jax.lax.scan(step, a[0], None, length=CHAIN)
        return y
    run = jax.jit(run_)
    np.asarray(run(*args))
    t0 = time.time()
    for _ in range(ITERS):
        np.asarray(run(*args))
    ms = max((time.time() - t0) / ITERS - t_base, 0.0) / CHAIN * 1e3
    gbs = nbytes / (ms * 1e-3) / 1e9 if ms > 0 else 0
    print(f"{label:44s} {ms:8.3f} ms  {gbs:7.1f} GB/s", flush=True)


x0 = jnp.asarray(rng.standard_normal(131072), jnp.float32)


@jax.jit
def ident(x):
    return x * 1.0000001


np.asarray(ident(x0))
t0 = time.time()
for _ in range(ITERS):
    np.asarray(ident(x0))
t_base = (time.time() - t0) / ITERS
print(f"baseline {t_base*1e3:.1f} ms", flush=True)

# 1-D scalar gather (user perm)
perm = jnp.asarray(rng.permutation(131072).astype(np.int32))
timed("1-D scalar gather 131k", lambda c, p: c[p], x0, perm,
      nbytes=131072 * 8)

# wide-row gathers: 100k rows from a 4200-row table, widths 63/64/128/256
idx = jnp.asarray(rng.integers(0, 4200, size=100_000).astype(np.int32))
for w in (63, 64, 128, 256, 512):
    tab = jnp.asarray(rng.standard_normal((4200, w)), jnp.float32)
    timed(f"row gather 100k x {w} (table 4200)",
          lambda c, t, i: t[i] * c[0], x0, tab, idx,
          nbytes=100_000 * w * 4)

# 150k x 60/64 from 21k table (M2L expansion gather shape)
idx2 = jnp.asarray(rng.integers(0, 21000, size=150_000).astype(np.int32))
for w in (60, 64):
    tab = jnp.asarray(rng.standard_normal((21000, w)), jnp.float32)
    timed(f"row gather 150k x {w} (table 21k)",
          lambda c, t, i: t[i] * c[0], x0, tab, idx2,
          nbytes=150_000 * w * 4)

# 2-D index gather: [4200, 63] tile indices into 131k vector
idx3 = jnp.asarray(rng.integers(0, 131072, size=(4200, 63)).astype(np.int32))
timed("scalar gather [4200,63] from 131k vec",
      lambda c, i: c[i], x0, idx3, nbytes=4200 * 63 * 8)

# one-hot matmul alternative for the near-field charge gather:
# xb = onehot(pidx) @ xq  -- bf16 one-hot
oh_idx = jnp.asarray(rng.integers(0, 4200, size=(100_000,)).astype(np.int32))
xq = jnp.asarray(rng.standard_normal((4200, 64)), jnp.float32)


def onehot_gather(c, i, t):
    oh = jax.nn.one_hot(i, 4200, dtype=jnp.bfloat16)
    return (oh @ t.astype(jnp.bfloat16)).astype(jnp.float32) * c[0]


timed("one-hot bf16 matmul gather 100k x 64", onehot_gather, x0, oh_idx, xq,
      nbytes=100_000 * 64 * 4)

# take_along_axis form
timed("jnp.take 100k x 64", lambda c, t, i: jnp.take(t, i, axis=0) * c[0],
      x0, xq, oh_idx, nbytes=100_000 * 64 * 4)
