"""Vectorized factor residual kernels.

Each function is the batched residual of one factor type from the reference
(`dynosam/factors/` + gtsam built-ins), expressed on SE3 batches so that a
whole factor *family* (all static observations of a window, all motion
factors of an object, ...) evaluates as one fused XLA computation.
Jacobians come from `jax.jacfwd`/linearization — verified in tests against
finite differences the same way the reference checks its analytic Jacobians
with `gtsam::numericalDerivative` (`test/test_factors.cc`).

Residual conventions (reference file:line for the ground-truth formula):
  * pose_to_point:        e = X^-1 p_w - z_local          (gtsam PoseToPointFactor)
  * between:              e = Log(Z^-1 (a^-1 b))          (gtsam BetweenFactor)
  * landmark_motion_ternary: e = m_{k-1} - H^-1 m_k
        (`src/factors/LandmarkMotionTernaryFactor.cc:37-75`)
  * landmark_motion_pose: e = m_k - L_k L_{k-1}^-1 m_{k-1}
        (`src/factors/LandmarkMotionPoseFactor.cc:84-90`)
  * landmark_pose_smoothing: e = Log( (L_{k-1} L_{k-2}^-1)^-1 (L_k L_{k-1}^-1) )
        (`src/factors/LandmarkPoseSmoothingFactor.cc:75-85`)
  * object_kinematic:     e = Log( L_k^-1 (H L_{k-1}) )
        (`src/factors/ObjectKinematicFactor.cc:37-42`)
  * flow_projection:      e = (kp_{k-1} + flow) - pi(X_k^-1 P_w)
        (`factors/Pose3FlowProjectionFactor.h:71-100`)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import CameraParams, backproject, project_local
from ..core.lie import (
    SE3,
    se3_apply,
    se3_between,
    se3_compose,
    se3_inverse,
    se3_local,
    se3_log,
)

# --------------------------------------------------------------------------
# Point factors (3-dim residuals)
# --------------------------------------------------------------------------


def pose_to_point_residual(X: SE3, p_world: jax.Array, measured_local: jax.Array):
    """e = X^-1 p_w - z.  Batched over any leading dims."""
    return se3_apply(se3_inverse(X), p_world) - measured_local


def landmark_motion_ternary_residual(
    m_prev: jax.Array, m_cur: jax.Array, H: SE3
) -> jax.Array:
    """e = m_{k-1} - H^-1 m_k  (world-centric motion factor)."""
    return m_prev - se3_apply(se3_inverse(H), m_cur)


def landmark_motion_pose_residual(
    m_prev: jax.Array, m_cur: jax.Array, L_prev: SE3, L_cur: SE3
) -> jax.Array:
    """e = m_k - L_k L_{k-1}^-1 m_{k-1}."""
    rel = se3_compose(L_cur, se3_inverse(L_prev))
    return m_cur - se3_apply(rel, m_prev)


# --------------------------------------------------------------------------
# Pose factors (6-dim residuals, [omega, v] ordering)
# --------------------------------------------------------------------------


def between_residual(a: SE3, b: SE3, measured: SE3) -> jax.Array:
    """e = Log(Z^-1 a^-1 b)."""
    return se3_local(measured, se3_between(a, b))


def prior_residual(x: SE3, prior: SE3) -> jax.Array:
    """e = Log(prior^-1 x)."""
    return se3_local(prior, x)


def landmark_pose_smoothing_residual(
    L_km2: SE3, L_km1: SE3, L_k: SE3
) -> jax.Array:
    """Constant-motion smoothing over an object pose triplet."""
    H_a = se3_compose(L_km1, se3_inverse(L_km2))  # k-2 -> k-1
    H_b = se3_compose(L_k, se3_inverse(L_km1))    # k-1 -> k
    return se3_log(se3_between(H_a, H_b))


def object_kinematic_residual(H: SE3, L_prev: SE3, L_cur: SE3) -> jax.Array:
    """e = Log(L_k^-1 H L_{k-1}): motion/pose consistency."""
    return se3_log(se3_compose(se3_inverse(L_cur), se3_compose(H, L_prev)))


def motion_smoothing_residual(H_prev: SE3, H_cur: SE3) -> jax.Array:
    """Constant-motion BetweenFactor(H_{k-1}, H_k, I) used by the
    WorldMotion formulation (`src/backend/rgbd/WorldMotionEstimator.cc`)."""
    return se3_log(se3_between(H_prev, H_cur))


# --------------------------------------------------------------------------
# Reprojection / flow factors (2-dim residuals)
# --------------------------------------------------------------------------


def flow_projection_residual(
    flow: jax.Array,
    X_cur: SE3,
    kp_prev: jax.Array,
    depth_prev: jax.Array,
    X_prev: SE3,
    cam: CameraParams,
):
    """Joint flow+pose refinement residual.

    e = (kp_{k-1} + flow) - pi(X_k^-1 * X_{k-1} * backproject(kp_{k-1}, d)).
    Returns (residual (..., 2), depth_in_cur (...,)) — callers mask on
    depth > 0 (cheirality).
    """
    p_world = se3_apply(X_prev, backproject(cam, kp_prev, depth_prev))
    p_cur = se3_apply(se3_inverse(X_cur), p_world)
    predicted, z = project_local(cam, p_cur)
    return (kp_prev + flow) - predicted, z


def reprojection_residual(
    X: SE3, p_world: jax.Array, uv: jax.Array, cam: CameraParams
):
    """Standard reprojection: e = pi(X^-1 p_w) - uv.  Returns (e, depth)."""
    p_cam = se3_apply(se3_inverse(X), p_world)
    predicted, z = project_local(cam, p_cam)
    return predicted - uv, z
