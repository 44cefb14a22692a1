"""fmm_bem_tpu — a TPU-native fast-multipole boundary-element framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
barbagroup/fmm-bem-relaxed (inexact-Krylov FMM-BEM, arXiv:1506.05957):

- Morton-ordered adaptive octrees over points or triangular BEM panels
  (host-side build, structure-of-arrays; ref: include/tree/Octree.hpp)
- dual-tree-traversal FMM/treecode matvec compiled to batched XLA ops
  (P2M/M2M/M2L/L2L/L2P/M2P/P2P; ref: include/executor/*)
- analytic kernels: Laplace / Yukawa / Stokes, point and BEM-panel variants
  (ref: kernel/*.hpp)
- GMRES / FGMRES with per-iteration relaxation of the multipole order p
  (ref: examples/BEM/GMRES.hpp, SolverOptions.hpp)
- multi-chip spatial decomposition over jax.sharding meshes.

Unlike the reference (header-only C++/OpenMP), everything on the compute
path here is static-shape array code: trees and interaction lists are
built once on the host, and the matvec replays them as batched
matmuls/segment-sums on the TPU.
"""

import jax as _jax

# TPU matrix-matrix products default to single-pass bf16 inputs
# (~2e-3 relative error) — catastrophic for an FMM whose M2M/M2L/L2L
# translation chain and Krylov orthogonalisation are matmuls: measured
# 6.6e-4 far-field error and a 38-vs-2 GMRES iteration gap vs the CPU
# backend at 131k panels.  "highest" restores true-f32 (6-pass bf16,
# 7e-8) at no measurable cost: every matmul on the matvec path is
# bandwidth-bound at FMM expansion widths.  Matrix-vector products ride
# the VPU at full f32 regardless, which is why this only shows on TPU.
_jax.config.update("jax_default_matmul_precision", "highest")

from fmm_bem_tpu.config import FMMConfig, SolverConfig
from fmm_bem_tpu.tree.octree import Tree, build_tree
from fmm_bem_tpu.traversal.lists import InteractionLists, build_interaction_lists
from fmm_bem_tpu.executor.plan import FmmPlan

__version__ = "0.1.0"

__all__ = [
    "FMMConfig",
    "SolverConfig",
    "Tree",
    "build_tree",
    "InteractionLists",
    "build_interaction_lists",
    "FmmPlan",
]
