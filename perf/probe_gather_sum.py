"""
[timing note: the chain step consumes the FULL output sum —
a sliced consumer lets XLA dead-code most of the work]
Micro-probe: why does gather+sum run at 55 GB/s when the bare
gather runs at 262 GB/s?  Tests whether materialising the gather with
an optimization_barrier before the dense reduction restores the gather
rate, and times the de-kron'd M2L einsum shapes.

Usage: python perf/probe_gather_sum.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CHAIN = 300
ITERS = 3
_BASE = None


def timed(name, fn, data, x0, bytes_=0, flops=0):
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
    line = f"{name:44s} {dt*1e3:8.3f} ms"
    if bytes_:
        line += f"  {bytes_/dt/1e9:7.1f} GB/s ({100*bytes_/dt/819e9:5.1f}%)"
    if flops:
        line += f"  {flops/dt/1e12:6.2f} TF/s"
    print(line, flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    # mimic the 131k-panel M2L bucket_sum: 262144 input rows of cW=60,
    # ~5200 output rows, fan-in buckets (3557,32) and (1604,64)
    P, cW = 262144, 60
    x = jnp.asarray(rng.standard_normal((P + 1, cW)), jnp.float32)
    i32 = jnp.asarray(rng.integers(0, P, (3557, 32)), jnp.int32)
    i64 = jnp.asarray(rng.integers(0, P, (1604, 64)), jnp.int32)
    nrows = 3557 * 32 + 1604 * 64
    gbytes = nrows * cW * 4

    timed("fused: x[idx].sum(1)  (current)",
          lambda d, x_: jnp.concatenate(
              [x_[d[0]].sum(1), x_[d[1]].sum(1)]),
          (i32, i64), x, bytes_=gbytes)

    def barrier_sum(d, x_):
        outs = []
        for idx in d:
            g = jax.lax.optimization_barrier(x_[idx.reshape(-1)])
            outs.append(g.reshape(idx.shape + (cW,)).sum(1))
        return jnp.concatenate(outs)

    timed("barrier: materialise gather, then sum", barrier_sum,
          (i32, i64), x, bytes_=2 * gbytes)

    # padded-row variant: flat perm, rows padded so each segment is
    # contiguous; single gather + reshape-sum per bucket
    p32 = jnp.asarray(rng.integers(0, P, 3557 * 32), jnp.int32)
    p64 = jnp.asarray(rng.integers(0, P, 1604 * 64), jnp.int32)

    def flat_barrier(d, x_):
        g1 = jax.lax.optimization_barrier(x_[d[0]])
        g2 = jax.lax.optimization_barrier(x_[d[1]])
        return jnp.concatenate([
            g1.reshape(3557, 32, cW).sum(1),
            g2.reshape(1604, 64, cW).sum(1),
        ])

    timed("flat perm + barrier + reshape-sum", flat_barrier,
          (p32, p64), x, bytes_=2 * gbytes)

    # ---- M2L einsum shapes: kron'd vs de-kron'd, p=5 and p=10
    for (W, ncomp, label) in ((30, 2, "p=5"), (110, 2, "p=10")):
        ntile, TS = 2048, 128
        cw = ncomp * W
        Mg = jnp.asarray(
            rng.standard_normal((ntile, TS, cw)), jnp.float32)
        kron = jnp.asarray(
            rng.standard_normal((ntile, cw, cw)), jnp.float32)
        dek = jnp.asarray(
            rng.standard_normal((ntile, W, W)), jnp.float32)

        timed(f"einsum kron {label} [{TS},{cw}]x[{cw},{cw}]",
              lambda d, x_: jnp.einsum(
                  "tpw,tvw->tpv", x_ * 1.0, d,
                  preferred_element_type=jnp.float32),
              kron, Mg, flops=2.0 * ntile * TS * cw * cw)

        def dekron(d, x_):
            xr = x_.reshape(ntile, TS * ncomp, W)
            o = jnp.einsum("tpw,tvw->tpv", xr, d,
                           preferred_element_type=jnp.float32)
            return o.reshape(ntile, TS, cw)

        timed(f"einsum dekron {label} [{TS*ncomp},{W}]x[{W},{W}]",
              dekron, dek, Mg, flops=2.0 * ntile * TS * ncomp * W * W)

    # gather of 240B rows then reshape (Mg gather baseline)
    src = jnp.asarray(rng.integers(0, 5200, P), jnp.int32)
    M = jnp.asarray(rng.standard_normal((5201, cW)), jnp.float32)
    timed("Mg gather [262144 rows of 240B]",
          lambda d, x_: (x_ * 1.0)[d], src, M,
          bytes_=2 * P * cW * 4)


if __name__ == "__main__":
    main()
