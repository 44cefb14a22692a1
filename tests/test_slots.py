"""Slot-space (tile-resident) matvec and solver path.

The production solve keeps Krylov vectors in the padded leaf-tile
layout (FmmPlan.solver_ops_slots / _matvec_slots) so the per-iteration
matvec performs no body-order gathers.  These tests pin the slot path
to the body-order matvec (``apply``) bit-for-bit semantics:

1. round-trip: from_slots(to_slots(x)) == x
2. slot matvec == apply() for Laplace BEM (both BC variants),
   Stokes BEM (vector charges, L2P fallback path), and the point
   Laplace kernel (direct P2P path, no near panels)
3. device GMRES run in slot space reproduces the user-space solve
"""

import numpy as np
import pytest

from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import FMMConfig, SolverConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.laplace import LaplaceKernel
from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel


def _rel(a, b):
    return float(
        np.linalg.norm(np.asarray(a) - np.asarray(b))
        / max(np.linalg.norm(np.asarray(b)), 1e-300)
    )


@pytest.fixture(scope="module")
def bem_plan():
    tris = unit_sphere(3)
    fields = make_panels(tris, K=3)
    return FmmPlan(
        LaplaceBEMKernel(K=3),
        fields,
        FMMConfig(ncrit=32, dtype="float64", max_p=8),
    ), len(tris)


def test_slots_round_trip(bem_plan):
    plan, n = bem_plan
    ops = plan.solver_ops_slots()
    assert ops is not None
    mv, op4p, to_slots, from_slots, nslots = ops
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)
    assert _rel(from_slots(to_slots(x)), x) < 1e-14


@pytest.mark.parametrize("flipped", [False, True])
def test_slot_matvec_matches_apply_bem(bem_plan, flipped):
    plan, n = bem_plan
    ops = plan.solver_ops_slots(flipped=flipped)
    mv, op4p, to_slots, from_slots, _ = ops
    rng = np.random.default_rng(1)
    x = rng.standard_normal(n)
    for p in (3, 6):
        operand = op4p(p)
        got = from_slots(mv(operand, to_slots(x), p))
        want = (
            plan.apply_flipped_bc(x, p=p)
            if flipped
            else plan.apply(x, p=p)
        )[:, 0]
        assert _rel(got, want) < 1e-12


def test_slot_matvec_matches_apply_stokes():
    from fmm_bem_tpu.kernels.stokes_bem import StokesBEMKernel

    tris = unit_sphere(2)
    fields = make_panels(tris, K=4)
    plan = FmmPlan(
        StokesBEMKernel(K=4, fine_K=19),
        fields,
        FMMConfig(ncrit=24, dtype="float64", max_p=6),
    )
    ops = plan.solver_ops_slots()
    assert ops is not None
    mv, op4p, to_slots, from_slots, _ = ops
    rng = np.random.default_rng(2)
    n = len(tris)
    x = rng.standard_normal(n * 3)
    p = 4
    got = from_slots(mv(op4p(p), to_slots(x), p))
    want = np.asarray(plan.apply(x.reshape(n, 3), p=p)).reshape(-1)
    assert _rel(got, want) < 1e-12


def test_slot_matvec_matches_apply_points():
    # UnitKernel: square (cdim == rdim == 1), no near panels -> the
    # direct P2P slots path + kernel-op P2M/L2P fallbacks (no linear
    # tables), against the exact body-order matvec
    from fmm_bem_tpu.kernels.unit import UnitKernel

    rng = np.random.default_rng(3)
    n = 1500
    pts = rng.uniform(-1, 1, (n, 3))
    plan = FmmPlan(
        UnitKernel(),
        {"xyz": pts},
        FMMConfig(ncrit=32, dtype="float64", max_p=6),
    )
    ops = plan.solver_ops_slots()
    assert ops is not None
    mv, op4p, to_slots, from_slots, _ = ops
    x = rng.standard_normal(n)
    p = 3
    got = from_slots(mv(op4p(p), to_slots(x), p))
    want = np.asarray(plan.apply(x, p=p)).reshape(-1)
    assert _rel(got, want) < 1e-12


def test_slot_gmres_matches_user_space(bem_plan):
    from fmm_bem_tpu.solver.gmres import gmres_device

    plan, n = bem_plan
    # second-kind style solve: system = flipped operator, RHS from the
    # default operator at unit density
    b_user = np.asarray(plan.apply(np.ones(n), p=6)[:, 0])
    cfg = SolverConfig(residual=1e-8, max_p=6, max_iters=40, restart=40)

    mv_u, op_u = plan.solver_ops(flipped=True)
    x_u, info_u = gmres_device(
        mv_u, b_user, operand_for_p=op_u, config=cfg, p_fixed=6
    )

    ops = plan.solver_ops_slots(flipped=True)
    mv_s, op_s, to_slots, from_slots, _ = ops
    x_s, info_s = gmres_device(
        mv_s, to_slots(b_user), operand_for_p=op_s, config=cfg, p_fixed=6
    )
    x_s = from_slots(x_s)
    assert info_s.converged
    assert info_u.iterations == info_s.iterations
    assert _rel(x_s, x_u) < 1e-8
