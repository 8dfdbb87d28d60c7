"""Frontend nonlinear refinement stages.

TPU-native versions of the reference's two small per-frame optimizers, both
solved by the direct block-eliminated LM engine
(`backend/small_schur.py` — exact per-track elimination like gtsam's sparse
direct solve, not PCG) instead of gtsam:

  * **Joint optical-flow + pose** (`OpticalFlowAndPoseOptimizer`,
    `frontend/vision/MotionSolver-inl.hpp:89-274`): per-tracklet flow
    variables + one pose; `Pose3FlowProjectionFactor` residual
    (kp_{k-1}+flow) - pi(X^-1 P_w) with a flow prior; Huber(k=0.001);
    sigmas flow=10.0, prior=3.33 (`MotionSolver.hpp:130-132`).
  * **Motion-only 3D refinement** (`MotionOnlyRefinementOptimizer`,
    `MotionSolver-inl.hpp:276-491`): per-object landmark pairs + motion H;
    projection factors (sigma 2.0) + LandmarkMotionTernary (sigma 0.001),
    Huber(k=1e-4) (`MotionSolver.hpp:217-219`).

Both stages run the reference's optimize -> determine-outlier-factors ->
remove -> re-optimize cycle (up to 4 extra rounds, early-exiting when no new
outliers appear; `MotionSolver-inl.hpp:194-232` and :406): a
`lax.while_loop` over rounds whose body re-masks the factor grid and resets
the pose to its initial value (the reference's
`optimised_values.update(pose_key, initial_pose)`) while carrying the
refined flows/landmarks forward.  Outlier detection is the robust-weight
threshold (`weight < 0.5` on the Huber reweighting — the criterion
`factor_graph_tools::determineFactorOutliers` uses,
`FactorGraphTools.hpp:69-99`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..backend.small_schur import lm_optimize_eliminated
from ..backend.solver import LMConfig, LMResult, RobustSpec
from ..core.camera import (
    CameraParams,
    backproject,
    project_jacobian_point,
    project_jacobian_pose,
    project_local,
)
from ..core.lie import SE3, se3_apply, se3_inverse, so3_hat
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
    outlier_rounds: int = 4,
) -> FlowPoseResult:
    """Jointly refine the dense-flow measurements and a pose estimate."""

    def resid_with(active):
        amask = active[:, None]

        def resid(values):
            flow, X = values["flow"], values["X"]
            r_proj, z = factors.flow_projection_residual(
                flow, X, kp_prev, depth_prev, X_prev, cam
            )
            r_proj = jnp.where(
                amask & (z > 0.01)[:, None], r_proj / flow_sigma, 0.0
            )
            r_prior = jnp.where(amask, (flow - flow_init) / flow_prior_sigma, 0.0)
            return [r_proj, r_prior]

        return resid

    p_world = se3_apply(X_prev, backproject(cam, kp_prev, depth_prev))

    def jac_with(active):
        # closed-form Jacobians of resid_with's outputs (same masks/sigmas).
        # r_proj = m * ((kp+flow) - pi(Exp(-xi) X^-1 p_w)) / sigma:
        #   d/dflow = m I_2 / sigma,  d/dxi = -m Jpose(p_cam) / sigma
        # (right retraction X Exp(xi) => the camera-frame point perturbs as
        # Exp(-xi) p_cam, which is exactly `project_jacobian_pose`'s form).
        # Masked rows are zeroed exactly like the residuals (the probing
        # path's JVP-through-where does the same), and p_cam is sanitized
        # before the 1/z so masked rows never produce inf*0.
        def jac(values):
            X = values["X"]
            n = kp_prev.shape[0]
            dt = kp_prev.dtype
            p_cam = se3_apply(se3_inverse(X), p_world)
            z = p_cam[..., 2]
            gate = (active & (z > 0.01))[:, None, None]
            z_safe = jnp.where(z > 0.01, z, 1.0)
            p_safe = jnp.concatenate(
                [p_cam[..., :2], z_safe[..., None]], axis=-1
            )
            Jpose = project_jacobian_pose(cam, p_safe)      # (N, 2, 6)
            I2 = jnp.broadcast_to(jnp.eye(2, dtype=dt), (n, 2, 2))
            B_proj = jnp.where(gate, I2 / flow_sigma, 0.0)
            G_proj = jnp.where(gate, -Jpose / flow_sigma, 0.0)
            B_prior = jnp.where(
                active[:, None, None], I2 / flow_prior_sigma, 0.0
            )
            G_prior = jnp.zeros((n, 2, 6), dt)
            return [B_proj, B_prior], [G_proj, G_prior]

        return jac

    specs = [RobustSpec("huber", k_huber), RobustSpec()]
    cfg = LMConfig(max_iterations=max_iterations)

    # chi-squared(dim=2, 0.99) gate on the Gaussian-whitened flow-projection
    # error (`determineFactorOutliers`, FactorGraphTools.hpp:69-99: outlier
    # iff 0.5 |r|^2 > 0.5 chi2_quantile(dim, confidence))
    chi2_gate = 9.210340

    def solve(active, flow_start):
        resid = resid_with(active)
        # each residual couples one track's flow with the single pose: solved
        # exactly per LM iteration by per-track elimination (60 sequential
        # CG steps -> 1 batched solve; `backend/small_schur.py`)
        res = lm_optimize_eliminated(
            resid, specs, {"flow": flow_start, "X": X_init}, cfg,
            block_keys=("flow",), glob_keys=("X",),
            jacobian_fn=jac_with(active),
        )
        r_final = resid(res.values)[0]
        outliers = active & (jnp.sum(r_final * r_final, axis=-1) > chi2_gate)
        return res, outliers

    # one `lm_optimize` trace total: iteration 0 is the initial solve, later
    # iterations re-run with outliers re-masked (early exit when none)
    def cond(carry):
        _, _, _, n_new, it = carry
        return (it == 0) | ((n_new > 0) & (it <= outlier_rounds))

    def body(carry):
        active, flow_c, _, _, it = carry
        res, outliers = solve(active, flow_c)
        return (
            active & ~outliers, res.values["flow"], res,
            jnp.sum(outliers), it + 1,
        )

    dummy = LMResult(
        values={"flow": flow_init, "X": X_init},
        error=jnp.asarray(0.0, flow_init.dtype),
        initial_error=jnp.asarray(0.0, flow_init.dtype),
        iterations=jnp.asarray(0, jnp.int32),
        lam=jnp.asarray(0.0, jnp.float32),
        converged=jnp.asarray(False),
    )
    active, flow_out, res, _, _ = jax.lax.while_loop(
        cond, body,
        (valid, flow_init, dummy, jnp.asarray(0, jnp.int32),
         jnp.asarray(0, jnp.int32)),
    )
    return FlowPoseResult(
        pose=res.values["X"],
        flow=flow_out,
        inliers=active,
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
    outlier_rounds: int = 4,
) -> MotionRefineResult:
    """Refine an object motion with fixed camera poses.

    Variables: landmark pair (m_{k-1}, m_k) per track + H.  The current
    landmark is initialized by motion-propagating the previous one.
    """
    m_cur_init = se3_apply(H_init, m_prev_world)

    # both reprojection terms (X_prev->mp, X_cur->mc) evaluate as ONE
    # stacked computation — the refiner loop is per-op latency-bound, so
    # halving the op count matters more than the (tiny) extra width.
    # Singleton point axis so SE3 batch dims broadcast against N.
    Xs = SE3(
        jnp.stack([X_prev.R, X_cur.R])[:, None],
        jnp.stack([X_prev.t, X_cur.t])[:, None],
    )
    uvs = jnp.stack([uv_prev, uv_cur])

    def resid_with(active):
        amask = active[:, None]

        def resid(values):
            mp, mc, H = values["mp"], values["mc"], values["H"]
            rp, zz = factors.reprojection_residual(
                Xs, jnp.stack([mp, mc]), uvs, cam
            )
            rp = jnp.where(
                amask[None] & (zz > 0.01)[..., None],
                rp / projection_sigma, 0.0,
            )
            r_tern = factors.landmark_motion_ternary_residual(mp, mc, H)
            r_tern = jnp.where(amask, r_tern / landmark_motion_sigma, 0.0)
            return [rp[0], rp[1], r_tern]

        return resid

    def jac_with(active):
        # closed-form Jacobians (block tangent = [d mp (3) | d mc (3)],
        # global tangent = H's right-retraction xi):
        #   rp_prev: d/dmp = Jpt(p_prev_cam) R_prev^T / sigma  (others 0)
        #   rp_cur:  d/dmc = Jpt(p_cur_cam)  R_cur^T  / sigma
        #   r_tern = m (mp - Exp(-xi) H^-1 mc) / sigma:
        #     d/dmp = m I / sigma, d/dmc = -m H.R^T / sigma,
        #     d/dxi = m [-hat(q) | I] / sigma with q = H^-1 mc
        def jac(values):
            mp, mc, H = values["mp"], values["mc"], values["H"]
            n = mp.shape[0]
            dt = mp.dtype

            # stacked projection blocks (see the resid note): one pass for
            # (X_prev, mp) and (X_cur, mc)
            p_cam = se3_apply(se3_inverse(Xs), jnp.stack([mp, mc]))
            z = p_cam[..., 2]
            gate = (active[None] & (z > 0.01))[..., None, None]
            z_safe = jnp.where(z > 0.01, z, 1.0)
            p_safe = jnp.concatenate(
                [p_cam[..., :2], z_safe[..., None]], axis=-1
            )
            Jp = project_jacobian_point(cam, p_safe)        # (2, N, 2, 3)
            # Jp @ R^T as broadcast mul+reduce (K=3 — VPU, exact f32;
            # see core/lie.py header note)
            JR = jnp.sum(
                Jp[..., :, None, :] * Xs.R[..., None, :, :], axis=-1
            )
            PB = jnp.where(gate, JR / projection_sigma, 0.0)

            Zp23 = jnp.zeros((n, 2, 3), dt)
            B_prev = jnp.concatenate([PB[0], Zp23], axis=-1)
            B_cur = jnp.concatenate([Zp23, PB[1]], axis=-1)
            G_26 = jnp.zeros((n, 2, 6), dt)

            amask = active[:, None, None]
            I3 = jnp.broadcast_to(jnp.eye(3, dtype=dt), (n, 3, 3))
            Rt = jnp.broadcast_to(jnp.swapaxes(H.R, -1, -2), (n, 3, 3))
            B_tern = jnp.where(
                amask,
                jnp.concatenate(
                    [I3, -Rt], axis=-1
                ) / landmark_motion_sigma,
                0.0,
            )
            q = se3_apply(se3_inverse(H), mc)
            G_tern = jnp.where(
                amask,
                jnp.concatenate(
                    [-so3_hat(q), I3], axis=-1
                ) / landmark_motion_sigma,
                0.0,
            )
            return [B_prev, B_cur, B_tern], [G_26, G_26, G_tern]

        return jac

    specs = [
        RobustSpec("huber", k_huber),
        RobustSpec("huber", k_huber),
        RobustSpec("huber", k_huber),
    ]
    cfg = LMConfig(max_iterations=max_iterations)

    # chi-squared(dim=3, 0.99) gate on the whitened LandmarkMotionTernary
    # error (`determineFactorOutliers<LandmarkMotionTernaryFactor>`,
    # MotionSolver-inl.hpp:401)
    chi2_gate = 11.344867

    def solve(active, mp_start, mc_start):
        resid = resid_with(active)
        # landmark pairs (mp, mc) form independent 6-dim blocks coupled only
        # through the single motion H -> exact per-track elimination
        res = lm_optimize_eliminated(
            resid, specs, {"mp": mp_start, "mc": mc_start, "H": H_init}, cfg,
            block_keys=("mp", "mc"), glob_keys=("H",),
            jacobian_fn=jac_with(active),
        )
        r_final = resid(res.values)[2]
        outliers = active & (jnp.sum(r_final * r_final, axis=-1) > chi2_gate)
        return res, outliers

    # single `lm_optimize` trace (see optimize_flow_and_pose)
    def cond(carry):
        _, _, n_new, it = carry
        return (it == 0) | ((n_new > 0) & (it <= outlier_rounds))

    def body(carry):
        active, res_prev, _, it = carry
        res, outliers = solve(
            active, res_prev.values["mp"], res_prev.values["mc"]
        )
        return (active & ~outliers, res, jnp.sum(outliers), it + 1)

    dummy = LMResult(
        values={"mp": m_prev_world, "mc": m_cur_init, "H": H_init},
        error=jnp.asarray(0.0, m_prev_world.dtype),
        initial_error=jnp.asarray(0.0, m_prev_world.dtype),
        iterations=jnp.asarray(0, jnp.int32),
        lam=jnp.asarray(0.0, jnp.float32),
        converged=jnp.asarray(False),
    )
    active, res, _, _ = jax.lax.while_loop(
        cond, body, (valid, dummy, jnp.asarray(0, jnp.int32),
                     jnp.asarray(0, jnp.int32))
    )
    return MotionRefineResult(
        motion=res.values["H"], inliers=active, error=res.error
    )
