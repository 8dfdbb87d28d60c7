"""Factor-graph inspection utilities.

Analog of `factor_graph_tools::*` (`backend/FactorGraphTools.hpp:44-260`,
`src/backend/FactorGraphTools.cc`):

  * chi-squared outlier factor detection (`determineFactorOutliers`,
    `FactorGraphTools.hpp:69-99`: a factor is an outlier when its
    Gaussian-whitened squared error exceeds the chi2 quantile of its
    dimension at 0.99 confidence),
  * graph composition statistics (`DebugInfo`,
    `backend/BackendDefinitions.hpp:175-224`: per-family factor/variable
    counts),
  * normal-equation sparsity statistics (`SparsityStats` :257) computed
    from the masked factor grids without materializing the Hessian.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .formulation import WindowMasks
from .solver import RobustSpec


# chi2 quantiles at 0.99 confidence by residual dimension
_CHI2_99 = {1: 6.634897, 2: 9.210340, 3: 11.344867, 6: 16.811894}


def factor_outliers(
    residuals: Sequence[jax.Array], specs: Sequence[RobustSpec]
) -> List[jax.Array]:
    """Per-family boolean outlier masks (`determineFactorOutliers`,
    `FactorGraphTools.hpp:69-99`): outlier iff the Gaussian-whitened
    (robust kernel stripped) squared error exceeds chi2(dim, 0.99) —
    0.5 |r|^2 > 0.5 * chi2_quantile in gtsam's error convention.  Only
    robust families are tested, matching the reference's template filter."""
    out = []
    for r, s in zip(residuals, specs):
        if s.kind == "none":
            out.append(jnp.zeros(r.shape[:-1], bool))
        else:
            gate = _CHI2_99.get(r.shape[-1], 11.344867)
            # only count factors that are actually active (nonzero residual
            # rows — masked rows are exactly zero)
            active = jnp.any(r != 0.0, axis=-1)
            out.append(active & (jnp.sum(r * r, axis=-1) > gate))
    return out


@dataclasses.dataclass
class DebugInfo:
    """Graph composition counts (the reference logs these per update)."""

    num_poses: int
    num_motions: int
    num_static_points: int
    num_dynamic_points: int
    num_static_factors: int
    num_dynamic_factors: int
    num_motion_factors: int
    num_smoothing_factors: int
    num_odometry_factors: int

    @staticmethod
    def from_masks(masks: WindowMasks) -> "DebugInfo":
        m = jax.tree.map(np.asarray, masks)
        return DebugInfo(
            num_poses=int(m.frame.sum()),
            num_motions=int(m.motion_active.sum()),
            num_static_points=int((m.static_obs.sum(0) > 0).sum()),
            num_dynamic_points=int(m.dyn_obs.sum()),
            num_static_factors=int(m.static_obs.sum()),
            num_dynamic_factors=int(m.dyn_obs.sum()),
            num_motion_factors=int(m.ternary.sum()),
            num_smoothing_factors=int(m.smoothing.sum()),
            num_odometry_factors=int(m.odometry.sum()),
        )


@dataclasses.dataclass
class SparsityStats:
    """Normal-equation block sparsity, computed from masks analytically."""

    total_variable_dims: int
    total_residual_dims: int
    nnz_offdiag_blocks: int
    total_offdiag_blocks: int

    @property
    def fill_ratio(self) -> float:
        if self.total_offdiag_blocks == 0:
            return 0.0
        return self.nnz_offdiag_blocks / self.total_offdiag_blocks


def sparsity_stats(masks: WindowMasks) -> SparsityStats:
    m = jax.tree.map(np.asarray, masks)
    W = m.frame.shape[0]
    NS = m.static_obs.shape[1]
    ND = m.dyn_obs.shape[1]
    O = m.motion_active.shape[1]

    n_vars = (
        6 * int(m.frame.sum())
        + 6 * int(m.motion_active.sum())
        + 3 * int((m.static_obs.sum(0) > 0).sum())
        + 3 * int(m.dyn_obs.sum())
    )
    n_res = (
        6  # anchor
        + 6 * int(m.odometry.sum())
        + 3 * int(m.static_obs.sum())
        + 3 * int(m.dyn_obs.sum())
        + 3 * int(m.ternary.sum())
        + 6 * int(m.smoothing.sum())
    )
    # off-diagonal variable-pair blocks coupled by at least one factor
    nnz = (
        int(m.odometry.sum())                  # X_{k-1} ~ X_k
        + int(m.static_obs.sum())              # X_k ~ sp_i
        + int(m.dyn_obs.sum())                 # X_k ~ dp_{k,i}
        + 3 * int(m.ternary.sum())             # dp_{k-1}~dp_k, dp~H x2
        + int(m.smoothing.sum())               # H_{k-1} ~ H_k
    )
    n_var_blocks = (
        int(m.frame.sum())
        + int(m.motion_active.sum())
        + int((m.static_obs.sum(0) > 0).sum())
        + int(m.dyn_obs.sum())
    )
    total_pairs = n_var_blocks * (n_var_blocks - 1) // 2
    return SparsityStats(
        total_variable_dims=n_vars,
        total_residual_dims=n_res,
        nnz_offdiag_blocks=nnz,
        total_offdiag_blocks=total_pairs,
    )
