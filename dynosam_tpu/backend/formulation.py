"""Graph construction for the RGB-D dynamic-SLAM backend.

TPU-native re-design of the reference's `Formulation<MAP>` template-method
machinery (`backend/Formulation.hpp:149-458`, `Formulation-impl.hpp:40-667`)
and its two concrete formulations:

  * **WorldMotion** ("MotionInWorld", updater 0,
    `src/backend/rgbd/WorldMotionEstimator.cc`): values {X_k, H_k^j,
    m^w_{i,k}}; factors PoseToPoint per dynamic/static observation +
    LandmarkMotionTernary(m_{k-1}, m_k, H_k) + Between(H_{k-1}, H_k, I)
    smoothing.
  * **WorldPose** ("LLWorld", updater 1,
    `src/backend/rgbd/WorldPoseEstimator.cc`): values {X_k, L_k^j,
    m^w_{i,k}}; factors PoseToPoint + LandmarkMotionPose + pose smoothing.

Instead of per-factor graph insertion with bookkeeping loops
(`updateStaticObservations` / `updateDynamicObservations`), the graph *is*
the masked (frame x slot) grid: each factor family evaluates as one dense
batched residual with a validity mask, and "adding a factor" is flipping a
mask bit.  Min-observation gating (min 2 static / 3 dynamic obs with
backtracking, `FormulationParams`, `Formulation.hpp:117-121`) becomes a
per-tracklet count + broadcast compare.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.lie import (
    SE3,
    se3_apply,
    se3_compose,
    se3_identity,
    se3_inverse,
)
from ..ops import factors
from ..utils.config import BackendConfig
from .map import WindowData
from .solver import RobustSpec


class WindowMasks(NamedTuple):
    """Static factor-activation masks derived from a WindowData."""

    static_obs: jax.Array      # (W, NS) pose-to-point factors on static points
    dyn_obs: jax.Array         # (W, ND) pose-to-point factors on dynamic points
    ternary: jax.Array         # (W, ND) motion factor rows (k-1,k); row 0 False
    smoothing: jax.Array       # (W, O)  motion smoothing rows (k-1,k); row 0 False
    motion_active: jax.Array   # (W, O)  H_k^j participates in any factor
    odometry: jax.Array        # (W,)    odom factor between k-1,k; row 0 False
    frame: jax.Array           # (W,)    frame has data


def build_masks(w: WindowData, cfg: BackendConfig) -> WindowMasks:
    fvalid = w.frame_valid
    # ---- static: obs valid & tracklet seen >= min_static times in window
    s_valid = w.static_valid & fvalid[:, None]
    s_count = jnp.sum(s_valid, axis=0)                     # (NS,)
    static_obs = s_valid & (s_count >= cfg.min_static_observations)[None, :]

    # ---- dynamic: tracklet must keep the same object slot; count >= min_dyn
    d_valid = w.dyn_valid & fvalid[:, None] & (w.dyn_obj >= 0)
    d_count = jnp.sum(d_valid, axis=0)                     # (ND,)
    gated = d_valid & (d_count >= cfg.min_dynamic_observations)[None, :]

    # ternary motion factor between (k-1, k): both obs valid, same object
    prev_valid = jnp.concatenate([jnp.zeros_like(gated[:1]), gated[:-1]], axis=0)
    same_obj = jnp.concatenate(
        [jnp.zeros_like(gated[:1]), w.dyn_obj[1:] == w.dyn_obj[:-1]], axis=0
    )
    ternary = gated & prev_valid & same_obj

    # dynamic point observation factor: the reference adds a PoseToPoint for
    # every observation of a gated tracklet (`Formulation-impl.hpp:307-584`)
    dyn_obs = gated

    # ---- per-(frame, object) motion variable activity
    no = w.motion_valid.shape[1]
    obj_onehot = jax.nn.one_hot(
        jnp.where(ternary, w.dyn_obj, -1), no, dtype=jnp.float32
    )                                                      # (W, ND, O)
    motion_active = jnp.einsum("wno->wo", obj_onehot) > 0  # (W, O)

    # smoothing factor between H_{k-1}, H_k when both are active
    prev_active = jnp.concatenate(
        [jnp.zeros_like(motion_active[:1]), motion_active[:-1]], axis=0
    )
    smoothing = (
        motion_active & prev_active
        if cfg.use_smoothing_factor
        else jnp.zeros_like(motion_active)
    )

    odometry = fvalid & jnp.concatenate([jnp.zeros_like(fvalid[:1]), fvalid[:-1]])
    if not cfg.use_vo_factor:
        odometry = jnp.zeros_like(odometry)

    return WindowMasks(
        static_obs=static_obs,
        dyn_obs=dyn_obs,
        ternary=ternary,
        smoothing=smoothing,
        motion_active=motion_active,
        odometry=odometry,
        frame=fvalid,
    )


# --------------------------------------------------------------------------
# Initial values
# --------------------------------------------------------------------------


def _first_valid_world_point(xyz, valid, X: SE3):
    """(W,N,3),(W,N),(W,) poses -> (N,3) world point from first valid obs.

    Replaces the reference's "initialize landmark from the first observation
    transformed by the frontend pose" (`Formulation-impl.hpp:203-305`).
    """
    world = jax.vmap(se3_apply)(X, xyz)                    # (W, N, 3)
    # index of first valid frame per tracklet
    big = jnp.where(valid, jnp.arange(valid.shape[0])[:, None], valid.shape[0])
    first = jnp.min(big, axis=0)                           # (N,)
    first_c = jnp.clip(first, 0, valid.shape[0] - 1)
    pts = jnp.take_along_axis(world, first_c[None, :, None], axis=0)[0]
    return jnp.where((first < valid.shape[0])[:, None], pts, 0.0)


def init_values(
    w: WindowData,
    masks: WindowMasks,
    cfg: BackendConfig,
    prev: dict | None = None,
    prev_mask: dict | None = None,
) -> dict:
    """Linearization point for a window.

    X from frontend odometry; H identity (`--init_H_with_identity`) or
    frontend motion; points back-projected through the frontend poses.  If
    `prev` estimates are provided (sliding-window overlap / re-optimization),
    they override wherever `prev_mask` is set.
    """
    W, NS = masks.static_obs.shape
    ND = masks.dyn_obs.shape[1]
    X = w.X_init
    if cfg.init_H_with_identity:
        H = se3_identity(w.motion_init.batch_shape, w.motion_init.dtype)
    else:
        H = w.motion_init
    sp = _first_valid_world_point(w.static_xyz, masks.static_obs, X)
    dp = jax.vmap(se3_apply)(X, w.dyn_xyz)                 # (W, ND, 3) per-frame
    dp = jnp.where(masks.dyn_obs[..., None], dp, 0.0)

    vals = {"X": X, "H": H, "sp": sp, "dp": dp}
    if prev is not None:
        def merge(new, old, m):
            if isinstance(new, SE3):
                return SE3(
                    jnp.where(m[..., None, None], old.R, new.R),
                    jnp.where(m[..., None], old.t, new.t),
                )
            return jnp.where(m[..., None], old, new)

        vals = {
            k: merge(vals[k], prev[k], prev_mask[k]) for k in vals
        }
    return vals


# --------------------------------------------------------------------------
# Residual families — WorldMotion formulation
# --------------------------------------------------------------------------


class FamilySpec(NamedTuple):
    names: tuple
    robust: tuple


def world_motion_families(cfg: BackendConfig) -> FamilySpec:
    k = cfg.huber_k_static
    return FamilySpec(
        names=(
            "anchor",
            "odometry",
            "static_obs",
            "dyn_obs",
            "ternary",
            "smoothing",
        ),
        robust=(
            RobustSpec(),
            RobustSpec(),
            RobustSpec("huber", k),
            RobustSpec("huber", cfg.huber_k_dynamic),
            RobustSpec("huber", cfg.huber_k_dynamic),
            RobustSpec(),
        ),
    )


def world_motion_residuals(
    values: dict,
    w: WindowData,
    masks: WindowMasks,
    cfg: BackendConfig,
    anchor: SE3 | None = None,
    anchor_prior_L=None,
):
    """All residual families of the WorldMotion formulation, whitened+masked.

    Mirrors the factor set of `WorldMotionFormulation::dynamicPointUpdate
    Callback` (`src/backend/rgbd/WorldMotionEstimator.cc:155-238`) and
    `objectUpdateContext` (:240-316).
    """
    X: SE3 = values["X"]
    H: SE3 = values["H"]
    sp = values["sp"]
    dp = values["dp"]
    dtype = sp.dtype

    pose_sigma = jnp.asarray(
        [cfg.odometry_rotation_sigma] * 3 + [cfg.odometry_translation_sigma] * 3,
        dtype,
    )
    smooth_sigma = jnp.asarray(
        [cfg.constant_object_motion_rotation_sigma] * 3
        + [cfg.constant_object_motion_translation_sigma] * 3,
        dtype,
    )

    # -- anchor prior on the first valid frame pose (gauge fixing, analog of
    # the initial pose prior in `Formulation::addOdometry` bootstrap)
    anchor_pose = anchor if anchor is not None else w.X_init[0]
    r_anchor = factors.prior_residual(X[0], anchor_pose)
    if anchor_prior_L is None:
        r_anchor = r_anchor[None, :] / cfg.initial_pose_prior_sigma
    else:
        # fixed-lag boundary marginal (backend/fixed_lag.py): whitened by
        # the marginal information's Cholesky factor
        r_anchor = (anchor_prior_L.T @ r_anchor)[None, :]

    # -- odometry between consecutive poses, measured by frontend VO
    odo_meas = jax.vmap(lambda a, b: se3_compose(se3_inverse(a), b))(
        w.X_init[:-1], w.X_init[1:]
    )
    r_odo = factors.between_residual(X[:-1], X[1:], odo_meas) / pose_sigma
    r_odo = jnp.where(masks.odometry[1:, None], r_odo, 0.0)

    # -- static pose-to-point (W, NS, 3)
    r_static = jax.vmap(
        lambda Xk, zk: factors.pose_to_point_residual(Xk, sp, zk)
    )(X, w.static_xyz)
    r_static = r_static / cfg.static_point_noise_sigma
    r_static = jnp.where(masks.static_obs[..., None], r_static, 0.0)

    # -- dynamic pose-to-point (W, ND, 3)
    r_dyn = jax.vmap(
        lambda Xk, mk, zk: factors.pose_to_point_residual(Xk, mk, zk)
    )(X, dp, w.dyn_xyz)
    r_dyn = r_dyn / cfg.dynamic_point_noise_sigma
    r_dyn = jnp.where(masks.dyn_obs[..., None], r_dyn, 0.0)

    # -- landmark motion ternary (W-1 rows laid out at k>=1): select H_k^j
    # via one-hot einsum rather than take_along_axis — the gather's VJP
    # lowers to serialized TPU scatter-adds and dominated the solve; the
    # einsum keeps both directions dense (MXU).
    no_ = H.batch_shape[1]
    onehot_obj = jax.nn.one_hot(
        jnp.where(masks.ternary | masks.dyn_obs, w.dyn_obj, -1), no_,
        dtype=H.t.dtype,
    )                                                       # (W, ND, O)
    Hk = SE3(
        jnp.einsum("wno,woij->wnij", onehot_obj, H.R, precision="highest"),
        jnp.einsum("wno,woj->wnj", onehot_obj, H.t, precision="highest"),
    )                                                       # (W, ND) SE3
    # masked slots got all-zero rows; make them valid identities
    eye = jnp.eye(3, dtype=H.t.dtype)
    sel = jnp.any(onehot_obj > 0, axis=-1)[..., None, None]
    Hk = SE3(jnp.where(sel, Hk.R, eye), Hk.t)
    m_prev = dp[:-1]
    m_cur = dp[1:]
    Hk_cur = SE3(Hk.R[1:], Hk.t[1:])
    r_ternary = factors.landmark_motion_ternary_residual(m_prev, m_cur, Hk_cur)
    r_ternary = r_ternary / cfg.motion_ternary_factor_noise_sigma
    r_ternary = jnp.where(masks.ternary[1:, ..., None], r_ternary, 0.0)

    # -- motion smoothing Between(H_{k-1}, H_k, I) (W-1, O, 6)
    r_smooth = factors.motion_smoothing_residual(
        SE3(H.R[:-1], H.t[:-1]), SE3(H.R[1:], H.t[1:])
    ) / smooth_sigma
    r_smooth = jnp.where(masks.smoothing[1:, ..., None], r_smooth, 0.0)

    return [r_anchor, r_odo, r_static, r_dyn, r_ternary, r_smooth]


# --------------------------------------------------------------------------
# Residual families — WorldPose formulation (LLWorld, updater 1)
# --------------------------------------------------------------------------


def world_pose_families(cfg: BackendConfig) -> FamilySpec:
    k = cfg.huber_k_static
    names = [
        "anchor",
        "odometry",
        "static_obs",
        "dyn_obs",
        "motion_pose",
        "pose_smoothing",
    ]
    robust = [
        RobustSpec(),
        RobustSpec(),
        RobustSpec("huber", k),
        RobustSpec("huber", cfg.huber_k_dynamic),
        RobustSpec("huber", cfg.huber_k_dynamic),
        RobustSpec(),
    ]
    if cfg.use_object_kinematic_factor:
        names.append("kinematic")
        robust.append(RobustSpec())
    return FamilySpec(names=tuple(names), robust=tuple(robust))


def world_pose_residuals(
    values: dict,
    w: WindowData,
    masks: WindowMasks,
    cfg: BackendConfig,
    anchor: SE3 | None = None,
    anchor_prior_L=None,
):
    """WorldPose (LLWorld) formulation: object poses L_k^j as variables.

    Mirrors `WorldPoseFormulation::dynamicPointUpdateCallback`
    (`src/backend/rgbd/WorldPoseEstimator.cc:84-166`) and
    `objectUpdateContext` (:169-286): LandmarkMotionPoseFactor on point
    pairs + LandmarkPoseSmoothingFactor on L triplets.
    """
    X: SE3 = values["X"]
    L: SE3 = values["L"]
    sp = values["sp"]
    dp = values["dp"]
    dtype = sp.dtype

    pose_sigma = jnp.asarray(
        [cfg.odometry_rotation_sigma] * 3 + [cfg.odometry_translation_sigma] * 3,
        dtype,
    )
    smooth_sigma = jnp.asarray(
        [cfg.constant_object_motion_rotation_sigma] * 3
        + [cfg.constant_object_motion_translation_sigma] * 3,
        dtype,
    )

    anchor_pose = anchor if anchor is not None else w.X_init[0]
    r_anchor = factors.prior_residual(X[0], anchor_pose)
    if anchor_prior_L is None:
        r_anchor = r_anchor[None, :] / cfg.initial_pose_prior_sigma
    else:
        # fixed-lag boundary marginal (backend/fixed_lag.py): whitened by
        # the marginal information's Cholesky factor
        r_anchor = (anchor_prior_L.T @ r_anchor)[None, :]

    odo_meas = jax.vmap(lambda a, b: se3_compose(se3_inverse(a), b))(
        w.X_init[:-1], w.X_init[1:]
    )
    r_odo = factors.between_residual(X[:-1], X[1:], odo_meas) / pose_sigma
    r_odo = jnp.where(masks.odometry[1:, None], r_odo, 0.0)

    r_static = jax.vmap(
        lambda Xk, zk: factors.pose_to_point_residual(Xk, sp, zk)
    )(X, w.static_xyz)
    r_static = r_static / cfg.static_point_noise_sigma
    r_static = jnp.where(masks.static_obs[..., None], r_static, 0.0)

    r_dyn = jax.vmap(
        lambda Xk, mk, zk: factors.pose_to_point_residual(Xk, mk, zk)
    )(X, dp, w.dyn_xyz)
    r_dyn = r_dyn / cfg.dynamic_point_noise_sigma
    r_dyn = jnp.where(masks.dyn_obs[..., None], r_dyn, 0.0)

    # LandmarkMotionPose on (m_{k-1}, m_k, L_{k-1}, L_k); one-hot einsum
    # selection (see WorldMotion note: gather VJP = slow TPU scatter)
    no_ = L.batch_shape[1]
    onehot_obj = jax.nn.one_hot(
        jnp.where(masks.ternary | masks.dyn_obs, w.dyn_obj, -1), no_,
        dtype=L.t.dtype,
    )
    Lk = SE3(
        jnp.einsum("wno,woij->wnij", onehot_obj, L.R, precision="highest"),
        jnp.einsum("wno,woj->wnj", onehot_obj, L.t, precision="highest"),
    )
    eye = jnp.eye(3, dtype=L.t.dtype)
    sel = jnp.any(onehot_obj > 0, axis=-1)[..., None, None]
    Lk = SE3(jnp.where(sel, Lk.R, eye), Lk.t)
    r_mp = factors.landmark_motion_pose_residual(
        dp[:-1], dp[1:], SE3(Lk.R[:-1], Lk.t[:-1]), SE3(Lk.R[1:], Lk.t[1:])
    )
    r_mp = r_mp / cfg.motion_ternary_factor_noise_sigma
    r_mp = jnp.where(masks.ternary[1:, ..., None], r_mp, 0.0)

    # LandmarkPoseSmoothing on (L_{k-2}, L_{k-1}, L_k): need three
    # consecutive active frames for the object
    r_ps = factors.landmark_pose_smoothing_residual(
        SE3(L.R[:-2], L.t[:-2]), SE3(L.R[1:-1], L.t[1:-1]), SE3(L.R[2:], L.t[2:])
    ) / smooth_sigma
    triple = masks.smoothing[1:-1] & masks.smoothing[2:]
    r_ps = jnp.where(triple[..., None], r_ps, 0.0)

    out = [r_anchor, r_odo, r_static, r_dyn, r_mp, r_ps]

    if cfg.use_object_kinematic_factor:
        # ObjectKinematicFactor e = Log(L_k^-1 H L_{k-1}) with H the
        # frontend's measured motion (a motion prior on the pose chain)
        r_kin = factors.object_kinematic_residual(
            SE3(w.motion_init.R[1:], w.motion_init.t[1:]),
            SE3(L.R[:-1], L.t[:-1]),
            SE3(L.R[1:], L.t[1:]),
        ) / cfg.object_kinematic_sigma
        kin_mask = masks.smoothing[1:] & w.motion_valid[1:]
        out.append(jnp.where(kin_mask[..., None], r_kin, 0.0))
    return out


def init_values_world_pose(
    w: WindowData,
    masks: WindowMasks,
    cfg: BackendConfig,
    prev: dict | None = None,
    prev_mask: dict | None = None,
) -> dict:
    """Initial L from frontend-propagated object poses; X/points as usual.

    `prev`/`prev_mask` warm-start overlap frames from previously optimized
    estimates (keys X, L, sp, dp) — the updater-1 analog of the reference
    Formulation's persistent `theta_` carry-over
    (`src/backend/rgbd/WorldPoseEstimator.cc:84-286`).
    """
    vals = init_values(w, masks, cfg)
    vals = {
        "X": vals["X"], "L": w.obj_pose_init,
        "sp": vals["sp"], "dp": vals["dp"],
    }
    if prev is not None:
        def merge(new, old, m):
            if isinstance(new, SE3):
                return SE3(
                    jnp.where(m[..., None, None], old.R, new.R),
                    jnp.where(m[..., None], old.t, new.t),
                )
            return jnp.where(m[..., None], old, new)

        vals = {k: merge(vals[k], prev[k], prev_mask[k]) for k in vals}
    return vals


# --------------------------------------------------------------------------
# Analytic Gauss-Newton diagonals (damping + Jacobi preconditioner)
# --------------------------------------------------------------------------


def _skew_sq_diag(y: jax.Array) -> jax.Array:
    """diag(hat(y)^T hat(y)) = (y_y^2+y_z^2, y_x^2+y_z^2, y_x^2+y_y^2)."""
    x2 = y[..., 0] ** 2
    y2 = y[..., 1] ** 2
    z2 = y[..., 2] ** 2
    return jnp.stack([y2 + z2, x2 + z2, x2 + y2], axis=-1)


def world_motion_gn_diag(
    values: dict, sqrt_w: list, w: WindowData, masks: WindowMasks,
    cfg: BackendConfig
) -> dict:
    """Exact-to-leading-order diag(J^T W J) for the WorldMotion families.

    Pose-to-point jacobians wrt a pose tangent xi=[omega, v] are
    [hat(y) | -I] with y the point in the pose's frame (approximated by the
    *measured* local point — exact at the optimum); point jacobians are
    orthonormal rotations, so their diagonal contribution is the scalar
    weight.  Between/prior/smoothing pose factors contribute ~1/sigma^2 per
    component.  Family order matches `world_motion_residuals`.
    """
    X: SE3 = values["X"]
    H: SE3 = values["H"]
    dtype = X.t.dtype
    W_, O = masks.smoothing.shape
    NS = masks.static_obs.shape[1]
    ND = masks.dyn_obs.shape[1]

    w_anchor, w_odo, w_static, w_dyn, w_tern, w_smooth = [
        s**2 for s in sqrt_w
    ]

    pose_sig = jnp.asarray(
        [cfg.odometry_rotation_sigma] * 3 + [cfg.odometry_translation_sigma] * 3,
        dtype,
    )
    smooth_sig = jnp.asarray(
        [cfg.constant_object_motion_rotation_sigma] * 3
        + [cfg.constant_object_motion_translation_sigma] * 3,
        dtype,
    )

    # ---- X diag (W, 6)
    dX = jnp.zeros((W_, 6), dtype)
    dX = dX.at[0].add(w_anchor[0] / cfg.initial_pose_prior_sigma**2)
    odo_w = (w_odo * masks.odometry[1:].astype(dtype))[:, None] / pose_sig**2
    dX = dX.at[:-1].add(odo_w)
    dX = dX.at[1:].add(odo_w)
    # static obs: y ~ measured local point
    ws = w_static * masks.static_obs.astype(dtype) / cfg.static_point_noise_sigma**2
    rot_part = jnp.einsum("kn,knd->kd", ws, _skew_sq_diag(w.static_xyz))
    trans_part = jnp.einsum("kn->k", ws)[:, None] * jnp.ones((1, 3), dtype)
    dX = dX + jnp.concatenate([rot_part, trans_part], axis=-1)
    wd = w_dyn * masks.dyn_obs.astype(dtype) / cfg.dynamic_point_noise_sigma**2
    rot_d = jnp.einsum("kn,knd->kd", wd, _skew_sq_diag(w.dyn_xyz))
    trans_d = jnp.einsum("kn->k", wd)[:, None] * jnp.ones((1, 3), dtype)
    dX = dX + jnp.concatenate([rot_d, trans_d], axis=-1)

    # ---- sp diag (NS, 3): rotation columns are orthonormal -> weight
    dsp = jnp.einsum("kn->n", ws)[:, None] * jnp.ones((1, 3), dtype)

    # ---- dp diag (W, ND, 3)
    ddp = wd[..., None] * jnp.ones((1, 1, 3), dtype)
    wt = (
        w_tern
        * masks.ternary[1:].astype(dtype)
        / cfg.motion_ternary_factor_noise_sigma**2
    )                                           # (W-1, ND)
    ddp = ddp.at[:-1].add(wt[..., None])        # m_{k-1} slot (identity J)
    ddp = ddp.at[1:].add(wt[..., None])         # m_k slot (rotation J)

    # ---- H diag (W, O, 6): ternary J_H = -[hat(y) | -I], y = H^-1 m_k ~
    # m_{k-1} in world
    m_prev = values["dp"][:-1]                  # (W-1, ND, 3)
    obj_onehot = jax.nn.one_hot(
        jnp.where(masks.ternary[1:], w.dyn_obj[1:], -1), O, dtype=dtype
    )                                           # (W-1, ND, O)
    rot_H = jnp.einsum(
        "kn,kno,knd->kod", wt, obj_onehot, _skew_sq_diag(m_prev)
    )
    trans_H = jnp.einsum("kn,kno->ko", wt, obj_onehot)[..., None] * jnp.ones(
        (1, 1, 3), dtype
    )
    dH = jnp.zeros((W_, O, 6), dtype)
    dH = dH.at[1:].add(jnp.concatenate([rot_H, trans_H], axis=-1))
    sm_w = (w_smooth * masks.smoothing[1:].astype(dtype))[..., None] / smooth_sig**2
    dH = dH.at[:-1].add(sm_w)
    dH = dH.at[1:].add(sm_w)

    return {"X": dX, "H": dH, "sp": dsp, "dp": ddp}


def world_pose_gn_diag(
    values: dict, sqrt_w: list, w: WindowData, masks: WindowMasks,
    cfg: BackendConfig
) -> dict:
    """Analytic diag(J^T W J) for the WorldPose (LLWorld) families.

    The motion-pose factor e = m_k - L_k L_{k-1}^-1 m_{k-1} has pose-tangent
    Jacobians [R hat(z) | -R] with z = L_{k-1}^-1 m_{k-1} (the point in the
    object frame), contributing skew-sq-diag(z) / 1 per component to BOTH
    L_{k-1} and L_k; point Jacobians are orthonormal.  Family order matches
    `world_pose_residuals`.
    """
    X: SE3 = values["X"]
    L: SE3 = values["L"]
    dp = values["dp"]
    dtype = X.t.dtype
    W_, O = masks.smoothing.shape
    w_anchor, w_odo, w_static, w_dyn, w_mp, w_ps, *w_rest = [
        s**2 for s in sqrt_w
    ]

    pose_sig = jnp.asarray(
        [cfg.odometry_rotation_sigma] * 3 + [cfg.odometry_translation_sigma] * 3,
        dtype,
    )
    smooth_sig = jnp.asarray(
        [cfg.constant_object_motion_rotation_sigma] * 3
        + [cfg.constant_object_motion_translation_sigma] * 3,
        dtype,
    )

    dX = jnp.zeros((W_, 6), dtype)
    dX = dX.at[0].add(w_anchor[0] / cfg.initial_pose_prior_sigma**2)
    odo_w = (w_odo * masks.odometry[1:].astype(dtype))[:, None] / pose_sig**2
    dX = dX.at[:-1].add(odo_w)
    dX = dX.at[1:].add(odo_w)
    ws = w_static * masks.static_obs.astype(dtype) / cfg.static_point_noise_sigma**2
    rot_part = jnp.einsum("kn,knd->kd", ws, _skew_sq_diag(w.static_xyz))
    trans_part = jnp.einsum("kn->k", ws)[:, None] * jnp.ones((1, 3), dtype)
    dX = dX + jnp.concatenate([rot_part, trans_part], axis=-1)
    wd = w_dyn * masks.dyn_obs.astype(dtype) / cfg.dynamic_point_noise_sigma**2
    rot_d = jnp.einsum("kn,knd->kd", wd, _skew_sq_diag(w.dyn_xyz))
    trans_d = jnp.einsum("kn->k", wd)[:, None] * jnp.ones((1, 3), dtype)
    dX = dX + jnp.concatenate([rot_d, trans_d], axis=-1)

    dsp = jnp.einsum("kn->n", ws)[:, None] * jnp.ones((1, 3), dtype)

    ddp = wd[..., None] * jnp.ones((1, 1, 3), dtype)
    wm = (
        w_mp * masks.ternary[1:].astype(dtype)
        / cfg.motion_ternary_factor_noise_sigma**2
    )                                            # (W-1, ND)
    ddp = ddp.at[:-1].add(wm[..., None])
    ddp = ddp.at[1:].add(wm[..., None])

    # L diag: z ~ object-frame point; approximate with the world point
    # relative to the object pose translation (cheap, exact to first order
    # for modest rotations)
    onehot = jax.nn.one_hot(
        jnp.where(masks.ternary[1:], w.dyn_obj[1:], -1), O, dtype=dtype
    )                                            # (W-1, ND, O)
    L_t_prev = L.t[:-1]                          # (W-1, O, 3)
    # select each tracklet's object translation first to avoid an
    # (W, ND, O, 3) intermediate at full capacities
    Lt_sel = jnp.einsum("kno,kod->knd", onehot, L_t_prev)  # (W-1, ND, 3)
    z = dp[:-1] - Lt_sel
    zd = _skew_sq_diag(z)                                   # (W-1, ND, 3)
    rot_L = jnp.einsum("kn,kno,knd->kod", wm, onehot, zd)
    trans_L = jnp.einsum("kn,kno->ko", wm, onehot)[..., None] * jnp.ones(
        (1, 1, 3), dtype
    )
    dL = jnp.zeros((W_, O, 6), dtype)
    contrib = jnp.concatenate([rot_L, trans_L], axis=-1)
    dL = dL.at[:-1].add(contrib)                 # L_{k-1} slot
    dL = dL.at[1:].add(contrib)                  # L_k slot (same magnitudes)
    triple = masks.smoothing[1:-1] & masks.smoothing[2:]
    ps_w = (w_ps * triple.astype(dtype))[..., None] / smooth_sig**2
    dL = dL.at[:-2].add(ps_w)
    dL = dL.at[1:-1].add(ps_w)
    dL = dL.at[2:].add(ps_w)

    if cfg.use_object_kinematic_factor and w_rest:
        # kinematic factor: Log-type pose Jacobians ~ identity scale
        kin_mask = masks.smoothing[1:] & w.motion_valid[1:]
        kin_w = (w_rest[0] * kin_mask.astype(dtype))[..., None] / (
            cfg.object_kinematic_sigma**2
        )
        dL = dL.at[:-1].add(kin_w)
        dL = dL.at[1:].add(kin_w)

    return {"X": dX, "L": dL, "sp": dsp, "dp": ddp}
