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

    # ---- DIRECT per-phase timing: each phase runs in its own chained
    # scan on a realistic materialised input (no prefix differencing —
    # that attribution was noisy to the point of negative timings and
    # cross-prefix compilation artifacts).  Phase inputs M and L are
    # built once by small jits; every chain step consumes the FULL
    # phase output through ``mix`` so XLA cannot dead-code the work.
    def _p2m_full(d_, aux_, sf_, x):
        if slot_ops is not None:
            return _p2m_slots(d_, aux_, x)
        return plan._phase_p2m(d_, aux_, sf_, x[d_["s_perm"]], p)

    def _l2p_full(d_, aux_, sf_, L):
        if slot_ops is not None:
            return plan._l2p_slots(d_, aux_, L, p)
        return plan._phase_l2p(d_, aux_, sf_, L, p)

    def _near_full(d_, aux_, sf_, x):
        if slot_ops is not None:
            return plan._near_pass_slots(aux_["panels"], x)
        return plan._near_pass(d_, aux_["panels"], sf_, x[d_["s_perm"]])

    mkM0 = jax.jit(_p2m_full)
    M0 = mkM0(d, aux, sf, qm0)
    mkM = jax.jit(lambda d_, M_: plan._phase_m2m(d_, M_))
    M = mkM(d, M0)
    mkLr = jax.jit(lambda d_, M_: plan._phase_m2l(d_, M_, p))
    Lr = mkLr(d, M)
    phases = [
        ("p2m", _p2m_full, qm0),
        ("m2m", lambda d_, aux_, sf_, M_: plan._phase_m2m(d_, M_), M0),
        ("m2l", lambda d_, aux_, sf_, M_: plan._phase_m2l(d_, M_, p), M),
        ("l2l", lambda d_, aux_, sf_, L_: plan._phase_l2l(d_, L_), Lr),
        ("l2p", _l2p_full, Lr),
    ]
    if "panels" in aux:
        phases.append(("near", _near_full, qm0))

    def timed_phase(fn, x0):
        def run_(d_, aux_, sf_, x):
            def step(x, _):
                return mix(x, fn(d_, aux_, sf_, x)), None

            y, _ = jax.lax.scan(step, x, None, length=chain)
            return y

        run = jax.jit(run_)
        np.asarray(run(d, aux, sf, x0))  # compile
        t0 = time.time()
        for _ in range(iters):
            np.asarray(run(d, aux, sf, x0))
        return max((time.time() - t0) / iters - t_base, 1e-9) / chain

    @jax.jit
    def ident(x):
        return x * 1.0000001

    np.asarray(ident(qm0))
    t0 = time.time()
    for _ in range(iters):
        np.asarray(ident(qm0))
    t_base = (time.time() - t0) / iters

    model = _flop_byte_model(plan, p)
    peaks = chip_peaks()
    floor = 20e-6  # per chained step: below this the number is noise
    out = {}
    total = 0.0
    for name, fn, x0 in phases:
        dt_k = timed_phase(fn, x0)
        total += dt_k
        flops, bytes_ = model.get(name, (0.0, 0.0))
        if dt_k < floor:
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
    out["total"] = {"ms": total * 1e3, "sum_of_phases": True}
    return out
