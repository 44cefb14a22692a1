"""Per-phase device timing + roofline accounting for the FMM matvec.

The reference prints a per-matvec P2P/M2L wall-clock split
(EvalInteractionLazy.hpp:137-152).  The TPU equivalent must answer a
stronger question — *how close is each phase to the chip's limits?* —
so this module measures each pipeline phase on device and scores it
against an analytic FLOP/byte model:

- matmul phases (M2M/M2L/L2L) against the MXU peak at the precision in
  use (f32-via-6-pass-bf16 since the framework forces
  jax_default_matmul_precision=highest, fmm_bem_tpu/__init__.py);
- streaming phases (P2M/L2P tables, near-field panels) against HBM
  bandwidth — they touch their operand bytes exactly once.

Timing method: phases are chained inside ONE jitted lax.scan per
pipeline *prefix* (P2M; P2M+M2M; ...) and per-phase time is the
difference of consecutive prefixes.  This survives the tunneled-TPU
environment where block_until_ready does not block and a single
dispatch is dominated by host/tunnel latency (see
.claude/skills/verify/SKILL.md): each scan step feeds a tiny function
of its output back into the charge vector, so XLA cannot dead-code or
overlap across steps, and one device->host transfer amortises over the
whole chain.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

#: per-chip peaks: (f32-effective matmul FLOP/s via 6-pass bf16,
#: bf16 matmul FLOP/s, HBM bytes/s).  Sources: public TPU spec sheets.
CHIP_PEAKS = {
    "TPU v5 lite": (197e12 / 6, 197e12, 819e9),   # v5e
    "TPU v5e": (197e12 / 6, 197e12, 819e9),
    "TPU v5p": (459e12 / 6, 459e12, 2765e9),
    "TPU v4": (275e12 / 6, 275e12, 1228e9),
    "TPU v6 lite": (918e12 / 6, 918e12, 1640e9),  # v6e/Trillium
}


def chip_peaks():
    try:
        kind = jax.devices()[0].device_kind
    except Exception:  # pragma: no cover
        return None
    for k, v in CHIP_PEAKS.items():
        if kind.startswith(k):
            return v
    return None


def _flop_byte_model(plan, p):
    """Analytic per-phase FLOPs and HBM bytes for one matvec."""
    kern = plan.kernel
    W = kern.width(p)
    cW = kern.ncomp * W
    it = jnp.dtype(plan.config.dtype).itemsize
    n = plan.src.tree.num_bodies
    nbox = plan.src.tree.num_boxes
    nl = len(plan.src.leaf_ids)
    K = plan.src.leaf_pad
    rdim = getattr(kern, "result_dim", 1)
    cdim = getattr(kern, "charge_dim", 1)

    model = {}
    # P2M table: slot-ordered cdim x cW contribution + tile reduce
    model["p2m"] = (
        2.0 * nl * K * cW * cdim,
        (2 * nl * K * cW * cdim + nbox * cW) * it,
    )
    nch = nbox - 1
    # translation matmuls are de-kron'd: [rows*ncomp, W] x [W, W]
    model["m2m"] = (
        2.0 * nch * cW * W,
        (2 * nch * cW + len(plan.src.m2m_mats) * W * W) * it,
    )
    npairs = len(plan.m2l_tile_src)
    ntile = npairs // max(plan.m2l_tile_size, 1) if npairs else 0
    model["m2l"] = (
        2.0 * npairs * cW * W,
        # gathered expansions in+out, one W x W matrix per TILE, and
        # the bucket-sum re-read
        (3 * npairs * cW + ntile * W * W) * it,
    )
    model["l2l"] = model["m2m"]
    model["l2p"] = (
        2.0 * nl * K * cW * rdim,
        (nl * K * cW * rdim + nl * cW + nl * K * rdim) * it,
    )
    panels, meta = plan.near_panels()
    if panels is not None:
        pb = sum(int(np.prod(A.shape)) * it for A in panels["A"])
        model["near"] = (2.0 * pb / it, pb)
    return model


def phase_breakdown(plan, p, q=None, chain=20, iters=3):
    """Measure the matvec phases on the current backend.

    Returns {phase: {"ms", "gflops", "gbs", "pct_mxu", "pct_hbm"}} plus
    a "total" entry.  Phases: p2m, m2m, m2l, l2l, l2p, near.
    """
    dt = jnp.dtype(plan.config.dtype)
    n = plan.src.tree.num_bodies
    if q is None:
        q = np.ones(n, dtype=dt)
    sf = plan.device_fields()
    qm0 = jnp.asarray(q, dt)

    # measure the PRODUCTION layout: slot-space when the plan supports
    # it (the solver path), else the body-order phases
    slot_ops = plan.solver_ops_slots()
    cdim = getattr(plan.kernel, "charge_dim", 1)
    nl = len(plan.src.leaf_ids)
    K = plan.src.leaf_pad
    st = plan.src.tree
    cW = plan.kernel.ncomp * plan.kernel.width(p)
    if slot_ops is not None:
        aux = plan.variant_aux_slots(p)
        qm0 = slot_ops[2](qm0)  # to_slots
    else:
        aux = plan.variant_aux(p)
    d = plan.device_data(p)

    def mix(x, out):
        # feed a scalar function of the phase output back into the
        # charges: forces sequential execution, costs ~nothing
        s = out
        while s.ndim > 0:
            s = s.sum(axis=-1)[...] if s.ndim > 1 else s.sum()
        return x * (1.0 + 1e-30 * s)

    def _p2m_slots(d_, aux_, q_t):
        if "p2m_tab_t" in aux_:
            tab = aux_["p2m_tab_t"]
            if cdim == 1:
                contrib = q_t[:, None] * tab
            else:
                contrib = jnp.einsum(
                    "nc,cnw->nw", q_t.reshape(nl * K, cdim), tab
                )
        else:
            contrib = plan.kernel.p2m(
                aux_["s_fields_t"], q_t, aux_["s_dn_t"],
                aux_["s_isig_t"], p,
            ).reshape(-1, cW)
            contrib = jnp.where(d_["s_slot_mask"][:, None], contrib, 0.0)
        return (
            jnp.zeros((st.num_boxes, cW), dt)
            .at[d_["s_leaf_ids"]]
            .set(contrib.reshape(nl, K, cW).sum(axis=1))
        )

    def prefix_fn(k):
        # plan data flows through ARGUMENTS: closure capture would
        # embed it as compile-time constants, which the tunneled
        # remote-compile path rejects (HTTP 413) and AOT caching hates
        def run_(d_, aux_, sf_, x):
            def step(x, _):
                if slot_ops is not None:
                    M = _p2m_slots(d_, aux_, x)
                else:
                    qm = x[d_["s_perm"]]
                    M = plan._phase_p2m(d_, aux_, sf_, qm, p)
                out = M
                if k >= 1:
                    M = plan._phase_m2m(d_, M)
                    out = M
                if k >= 2:
                    L = plan._phase_m2l(d_, M, p)
                    out = L
                if k >= 3:
                    L = plan._phase_l2l(d_, L)
                    out = L
                if k >= 4:
                    out = (
                        plan._l2p_slots(d_, aux_, L, p)
                        if slot_ops is not None
                        else plan._phase_l2p(d_, aux_, sf_, L, p)
                    )
                if k >= 5 and "panels" in aux_:
                    out = out + (
                        plan._near_pass_slots(aux_["panels"], x)
                        if slot_ops is not None
                        else plan._near_pass(d_, aux_["panels"], sf_, qm)
                    )
                return mix(x, out), None

            y, _ = jax.lax.scan(step, x, None, length=chain)
            return y

        run = jax.jit(run_)
        return lambda x: run(d, aux, sf, x)

    @jax.jit
    def ident(x):
        return x * 1.0000001

    np.asarray(ident(qm0))
    t0 = time.time()
    for _ in range(iters):
        np.asarray(ident(qm0))
    t_base = (time.time() - t0) / iters

    nph = 6 if "panels" in aux else 5
    times = []
    for k in range(nph):
        f = prefix_fn(k)
        np.asarray(f(qm0))  # compile
        t0 = time.time()
        for _ in range(iters):
            np.asarray(f(qm0))
        times.append(
            max((time.time() - t0) / iters - t_base, 1e-9) / chain
        )

    names = ["p2m", "m2m", "m2l", "l2l", "l2p", "near"][:nph]
    model = _flop_byte_model(plan, p)
    peaks = chip_peaks()
    # prefix-difference timings are noisy for sub-resolution phases: a
    # later prefix can even measure *faster* than a shorter one.  Flag
    # anything below the timer floor instead of reporting absurd rates.
    floor = 50e-6  # 50 us per chained step
    out = {}
    prev = 0.0
    for k, name in enumerate(names):
        dt_k = times[k] - prev
        prev = times[k]
        flops, bytes_ = model.get(name, (0.0, 0.0))
        if dt_k < floor:
            # prefix-difference noise can drive dt_k negative; clamp so
            # downstream consumers never see an absurd timing
            out[name] = {
                "ms": round(max(dt_k, 0.0) * 1e3, 4),
                "below_timer_floor": True,
            }
            continue
        r = {
            "ms": dt_k * 1e3,
            "gflops": flops / dt_k / 1e9,
            "gbs": bytes_ / dt_k / 1e9,
        }
        if peaks:
            f32_peak, _, hbm = peaks
            r["pct_mxu"] = 100.0 * (flops / dt_k) / f32_peak
            r["pct_hbm"] = 100.0 * (bytes_ / dt_k) / hbm
        out[name] = r
    out["total"] = {"ms": times[-1] * 1e3}
    return out
