"""Preconditioner, checkpoint, and metrics subsystem tests."""

import os

import numpy as np
import pytest

from fmm_bem_tpu.bem.panels import make_panels
from fmm_bem_tpu.bem.triangulation import unit_sphere
from fmm_bem_tpu.config import FMMConfig, SolverConfig
from fmm_bem_tpu.executor.plan import FmmPlan
from fmm_bem_tpu.kernels.laplace import LaplaceKernel
from fmm_bem_tpu.kernels.laplace_bem import LaplaceBEMKernel
from fmm_bem_tpu.solver import preconditioners as pc
from fmm_bem_tpu.solver.gmres import fgmres, gmres
from fmm_bem_tpu.utils import checkpoint as ckpt
from fmm_bem_tpu.utils.metrics import Logger


def test_block_diagonal_preconditioner_accelerates():
    """Block-diagonal PC (exact leaf-block solves, the batched
    equivalent of ref BlockDiagonalPC.hpp) must cut GMRES iterations on
    a shifted Laplace system."""
    rng = np.random.default_rng(0)
    n = 600
    pts = rng.uniform(0, 1, (n, 3))
    K = LaplaceKernel()
    plan = FmmPlan(K, {"xyz": pts}, FMMConfig(ncrit=24, dtype="float64", max_p=8))
    shift = 30.0

    def matvec(x, p):
        return plan.apply(x, p=p)[:, 0] + shift * x

    def assemble(tf, sf):
        import jax.numpy as jnp

        return K.p2p_matrix(tf, sf) + shift * jnp.eye(tf["xyz"].shape[0])

    M = pc.block_diagonal_from_plan(plan, p=6, assemble_block=assemble)
    b = rng.standard_normal(n)
    cfg = SolverConfig(residual=1e-8, max_p=8)
    _, info_id = gmres(matvec, b, config=cfg, p_fixed=8)
    x, info_pc = fgmres(matvec, b, config=cfg, M=M, p_fixed=8)
    assert info_pc.converged
    assert info_pc.iterations < info_id.iterations, (
        info_pc.iterations,
        info_id.iterations,
    )


def test_local_inner_preconditioner_runs():
    rng = np.random.default_rng(1)
    n = 300
    pts = rng.uniform(0, 1, (n, 3))
    K = LaplaceKernel()
    plan = FmmPlan(K, {"xyz": pts}, FMMConfig(ncrit=32, dtype="float64", max_p=6))
    shift = 30.0

    def op(x):
        return np.asarray(plan.apply(x, p=3)[:, 0]) + shift * x

    M = pc.local_inner(op, iters=2, p=3)
    z = M(rng.standard_normal(n))
    assert np.isfinite(z).all()


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "state.npz")
    ckpt.save_checkpoint(path, x=np.arange(5.0), it=3)
    data = ckpt.load_checkpoint(path)
    assert np.allclose(data["x"], np.arange(5.0))
    assert int(data["it"]) == 3
    assert ckpt.load_checkpoint(str(tmp_path / "missing.npz")) is None


def test_near_field_checkpoint(tmp_path):
    tris = unit_sphere(2)
    fields = make_panels(tris, K=3)
    kern = LaplaceBEMKernel(K=3)
    cfg = FMMConfig(ncrit=16, dtype="float64", max_p=6)
    plan = FmmPlan(kern, fields, cfg)
    path = str(tmp_path / "near.npz")
    ckpt.save_near_field(path, plan)

    plan2 = FmmPlan(kern, fields, cfg)
    vals_before = plan2.near_vals.copy()
    plan2.near_vals = np.zeros_like(plan2.near_vals)
    assert ckpt.load_near_field(path, plan2)
    assert np.allclose(plan2.near_vals, vals_before)


def test_metrics_logger():
    log = Logger()
    with log.phase("matvec", work=100.0):
        pass
    with log.phase("matvec", work=100.0):
        pass
    rep = log.report()
    assert rep["matvec"]["hits"] == 2
    assert rep["matvec"]["work"] == 200.0
    assert "rate_per_s" in rep["matvec"]


def test_local_evaluation_mode():
    """Near-field-only plan (ref EvalLocalSparse) equals the dense
    near-field operator; block-diagonal plan keeps only leaf self
    blocks (ref EvalDiagonalSparse)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    n = 800
    pts = rng.uniform(0, 1, (n, 3))
    q = rng.standard_normal(n)
    K = LaplaceKernel()
    full = FmmPlan(K, {"xyz": pts}, FMMConfig(ncrit=32, dtype="float64", max_p=6))
    loc = FmmPlan(
        K, {"xyz": pts},
        FMMConfig(ncrit=32, dtype="float64", max_p=6, local_evaluation=True),
    )
    blk = FmmPlan(
        K, {"xyz": pts},
        FMMConfig(ncrit=32, dtype="float64", max_p=6, block_diagonal=True),
    )
    r_full = np.asarray(full.apply(q, p=6)[:, 0])
    r_loc = np.asarray(loc.apply(q, p=6)[:, 0])
    r_blk = np.asarray(blk.apply(q, p=6)[:, 0])
    # local = full minus far field; both nonzero and different
    assert not np.allclose(r_loc, r_full)
    assert np.abs(r_loc).max() > 0
    # block-diagonal result only involves same-leaf sources
    t = blk.tree
    # oracle: direct sum within each leaf
    oracle = np.zeros(n)
    qm = q[t.perm]
    for b in t.leaves:
        s0, c = t.box_body_start[b], t.box_body_count[b]
        xs = t.points[s0 : s0 + c]
        diff = xs[None] - xs[:, None]
        r = np.sqrt((diff**2).sum(-1))
        np.fill_diagonal(r, np.inf)
        oracle_m = (1.0 / r) @ qm[s0 : s0 + c]
        oracle[t.perm[s0 : s0 + c]] = oracle_m
    assert np.allclose(r_blk, oracle, atol=1e-10)
