"""Frontend nonlinear refinement stages.

TPU-native versions of the reference's two small per-frame optimizers, both
expressed on the shared LM engine (`backend/solver.py`) instead of gtsam:

  * **Joint optical-flow + pose** (`OpticalFlowAndPoseOptimizer`,
    `frontend/vision/MotionSolver-inl.hpp:89-274`): per-tracklet flow
    variables + one pose; `Pose3FlowProjectionFactor` residual
    (kp_{k-1}+flow) - pi(X^-1 P_w) with a flow prior; Huber(k=0.001);
    sigmas flow=10.0, prior=3.33 (`MotionSolver.hpp:130-132`).
  * **Motion-only 3D refinement** (`MotionOnlyRefinementOptimizer`,
    `MotionSolver-inl.hpp:276-491`): per-object landmark pairs + motion H;
    projection factors (sigma 2.0) + LandmarkMotionTernary (sigma 0.001),
    Huber(k=1e-4) (`MotionSolver.hpp:217-219`).

The reference runs 4 rounds of optimize-then-remove-outlier-factors; here
outlier suppression is a final robust-weight threshold (`weight < 0.5` on
the Huber reweighting — the same criterion `factor_graph_tools::
determineFactorOutliers` uses, `FactorGraphTools.hpp:69-99`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..backend.solver import LMConfig, RobustSpec, lm_optimize
from ..core.camera import CameraParams
from ..core.lie import SE3, se3_apply, se3_inverse
from ..ops import factors


class FlowPoseResult(NamedTuple):
    pose: SE3            # refined ^wX_k
    flow: jax.Array      # (N, 2) refined flow
    inliers: jax.Array   # (N,) bool (robust weight >= 0.5 at optimum)
    error: jax.Array


def optimize_flow_and_pose(
    cam: CameraParams,
    X_init: SE3,
    X_prev: SE3,
    kp_prev: jax.Array,      # (N, 2)
    depth_prev: jax.Array,   # (N,)
    flow_init: jax.Array,    # (N, 2) measured flow (also the prior mean)
    valid: jax.Array,        # (N,)
    flow_sigma: float = 10.0,
    flow_prior_sigma: float = 3.33,
    k_huber: float = 0.001,
    max_iterations: int = 10,
) -> FlowPoseResult:
    """Jointly refine the dense-flow measurements and a pose estimate."""
    vmask = valid[:, None]

    def resid(values):
        flow, X = values["flow"], values["X"]
        r_proj, z = factors.flow_projection_residual(
            flow, X, kp_prev, depth_prev, X_prev, cam
        )
        r_proj = jnp.where(vmask & (z > 0.01)[:, None], r_proj / flow_sigma, 0.0)
        r_prior = jnp.where(vmask, (flow - flow_init) / flow_prior_sigma, 0.0)
        return [r_proj, r_prior]

    specs = [RobustSpec("huber", k_huber), RobustSpec()]
    init = {"flow": flow_init, "X": X_init}
    cfg = LMConfig(max_iterations=max_iterations, cg_max_iterations=60)
    res = lm_optimize(resid, specs, init, cfg)

    r_final = resid(res.values)[0]
    norm = jnp.linalg.norm(r_final, axis=-1)
    weight = jnp.where(norm <= k_huber, 1.0, k_huber / jnp.maximum(norm, 1e-30))
    inliers = valid & (weight >= 0.5)
    return FlowPoseResult(
        pose=res.values["X"],
        flow=res.values["flow"],
        inliers=inliers,
        error=res.error,
    )


class MotionRefineResult(NamedTuple):
    motion: SE3          # refined ^w H_k
    inliers: jax.Array   # (N,)
    error: jax.Array


def optimize_motion_only(
    cam: CameraParams,
    H_init: SE3,
    X_prev: SE3,
    X_cur: SE3,
    m_prev_world: jax.Array,  # (N, 3) landmark at k-1 in world
    uv_prev: jax.Array,       # (N, 2)
    uv_cur: jax.Array,        # (N, 2)
    valid: jax.Array,
    landmark_motion_sigma: float = 0.001,
    projection_sigma: float = 2.0,
    k_huber: float = 0.0001,
    max_iterations: int = 10,
) -> MotionRefineResult:
    """Refine an object motion with fixed camera poses.

    Variables: landmark pair (m_{k-1}, m_k) per track + H.  The current
    landmark is initialized by motion-propagating the previous one.
    """
    vmask = valid[:, None]
    m_cur_init = se3_apply(H_init, m_prev_world)

    def resid(values):
        mp, mc, H = values["mp"], values["mc"], values["H"]
        rp_prev, zp = factors.reprojection_residual(X_prev, mp, uv_prev, cam)
        rp_cur, zc = factors.reprojection_residual(X_cur, mc, uv_cur, cam)
        rp_prev = jnp.where(vmask & (zp > 0.01)[:, None], rp_prev / projection_sigma, 0.0)
        rp_cur = jnp.where(vmask & (zc > 0.01)[:, None], rp_cur / projection_sigma, 0.0)
        r_tern = factors.landmark_motion_ternary_residual(mp, mc, H)
        r_tern = jnp.where(vmask, r_tern / landmark_motion_sigma, 0.0)
        return [rp_prev, rp_cur, r_tern]

    specs = [
        RobustSpec("huber", k_huber),
        RobustSpec("huber", k_huber),
        RobustSpec("huber", k_huber),
    ]
    init = {"mp": m_prev_world, "mc": m_cur_init, "H": H_init}
    cfg = LMConfig(max_iterations=max_iterations, cg_max_iterations=60)
    res = lm_optimize(resid, specs, init, cfg)

    r_final = resid(res.values)[2]
    norm = jnp.linalg.norm(r_final, axis=-1)
    weight = jnp.where(norm <= k_huber, 1.0, k_huber / jnp.maximum(norm, 1e-30))
    inliers = valid & (weight >= 0.5)
    return MotionRefineResult(
        motion=res.values["H"], inliers=inliers, error=res.error
    )
