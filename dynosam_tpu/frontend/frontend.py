"""RGB-D instance frontend: the per-frame vision pipeline.

TPU-native redesign of `RGBDInstanceFrontendModule`
(`src/frontend/RGBDInstanceFrontendModule.cc:56-481`).  One frame step runs
(see the reference call stack, SURVEY §3.2):

  track -> depth association -> ego-motion PnP-RANSAC (+ joint optical-flow
  refinement) -> scene-flow dynamicity -> per-object motion RANSAC (+ joint
  flow + motion-only refinement) -> object pose propagation -> output packet

Everything after image ingestion is one jitted computation; per-object
motion solving is a `vmap` over object slots (replacing the reference's TBB
`parallel_for_each`, `RGBDInstanceFrontendModule.cc:297-315`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.camera import CameraParams, backproject
from ..core.lie import (
    SE3,
    se3_apply,
    se3_compose,
    se3_identity,
    se3_inverse,
)
from ..core.types import INVALID_ID, DynamicObs, FrontendOutput, ObjectObs, StaticObs
from ..ops.klt import bilinear_sample
from ..ops.ransac import STATUS_VALID, RansacResult, ransac_pose_3d2d
from ..utils.config import FrontendConfig
from . import refine
from .tracker import TrackerState, track_frame

# per-object correspondence capacity for the motion solvers
DPO = 512


class FrameImages(NamedTuple):
    gray: jax.Array    # (H, W) float
    depth: jax.Array   # (H, W) float metric depth (0/neg = invalid)
    flow: jax.Array    # (H, W, 2) dense flow mapping frame k -> k+1
    mask: jax.Array    # (H, W) int32 instance labels (0 = background)


class FrontendState(NamedTuple):
    tracker: TrackerState
    X_world: SE3            # ^wX_{k-1}
    s_lmk: jax.Array        # (NS, 3) static landmarks in world (at k-1)
    s_lmk_valid: jax.Array
    d_lmk: jax.Array        # (ND, 3) dynamic landmarks in world (at k-1)
    d_lmk_valid: jax.Array
    obj_pose: SE3           # (O,) propagated ^wL_{k-1}
    obj_pose_valid: jax.Array
    obj_H_prev: SE3         # (O,) last frame's object motions (const-vel model)
    obj_H_prev_valid: jax.Array
    obj_static: jax.Array   # (O,) object classified static by scene flow at k-1
    obj_gap: jax.Array      # (O,) frames since L was last updated
    rel_prev: SE3           # X_{k-2}^-1 X_{k-1} (const-velocity rot prior)
    rel_prev_valid: jax.Array
    frame_idx: jax.Array

    @staticmethod
    def create(ns: int, nd: int, no: int, dtype=jnp.float32) -> "FrontendState":
        return FrontendState(
            tracker=TrackerState.create(ns, nd, no, dtype),
            X_world=se3_identity((), dtype),
            s_lmk=jnp.zeros((ns, 3), dtype),
            s_lmk_valid=jnp.zeros((ns,), bool),
            d_lmk=jnp.zeros((nd, 3), dtype),
            d_lmk_valid=jnp.zeros((nd,), bool),
            obj_pose=se3_identity((no,), dtype),
            obj_pose_valid=jnp.zeros((no,), bool),
            obj_H_prev=se3_identity((no,), dtype),
            obj_H_prev_valid=jnp.zeros((no,), bool),
            obj_static=jnp.zeros((no,), bool),
            obj_gap=jnp.full((no,), 10000, jnp.int32),
            rel_prev=se3_identity((), dtype),
            rel_prev_valid=jnp.asarray(False),
            frame_idx=jnp.asarray(0, jnp.int32),
        )


def _depth_at(depth: jax.Array, uv: jax.Array, max_depth: float, valid=None):
    d = bilinear_sample(depth, uv, valid)
    return d, (d > 0.0) & (d < max_depth)


def _mask_label_at(mask: jax.Array, uv: jax.Array) -> jax.Array:
    """Nearest-neighbour instance label under (possibly fractional) uv
    (routes through the Pallas point kernel on TPU, see ops/klt)."""
    from ..ops.klt import nearest_at

    return nearest_at(mask, uv)


def _project_world(cam: CameraParams, X: SE3, p_w: jax.Array):
    from ..core.camera import project

    return project(cam, X, p_w)


@functools.partial(
    jax.jit, static_argnames=("cfg", "use_klt", "first_frame")
)
def frontend_step(
    state: FrontendState,
    prev_images: FrameImages,
    images: FrameImages,
    cam: CameraParams,
    cfg: FrontendConfig,
    key: jax.Array,
    use_klt: bool = True,
    first_frame: bool = False,
):
    """Process one frame: (state at k-1, images) -> (state at k, packet)."""
    tcfg = cfg.tracker
    prev_uv_s = state.tracker.s_uv
    prev_uv_d = state.tracker.d_uv

    key_t, key = jax.random.split(key)
    trk, report = track_frame(
        state.tracker,
        prev_images.gray,
        images.gray,
        prev_images.flow,
        images.mask,
        tcfg,
        use_klt=use_klt,
        first_frame=first_frame,
        key=key_t,
        mask_prev=prev_images.mask,
    )

    # ---------------- depth association (`Frame::updateDepths`)
    # ONE merged point-sample for both pools (each Pallas point call pays a
    # fixed image-fetch cost on TPU — BENCH_NOTES session 5); the per-pool
    # max-depth gates apply after the split
    ns_slots = trk.s_uv.shape[0]
    depth_both = bilinear_sample(
        images.depth,
        jnp.concatenate([trk.s_uv, trk.d_uv], axis=0),
        jnp.concatenate([trk.s_active, trk.d_active], axis=0),
    )
    s_depth = depth_both[:ns_slots]
    d_depth = depth_both[ns_slots:]
    s_dok = (s_depth > 0.0) & (s_depth < cfg.max_background_depth)
    d_dok = (d_depth > 0.0) & (d_depth < cfg.max_object_depth)
    s_xyz = backproject(cam, trk.s_uv, s_depth)
    d_xyz = backproject(cam, trk.d_uv, d_depth)
    s_obs_ok = trk.s_active & s_dok
    d_obs_ok = trk.d_active & d_dok

    # ---------------- ego motion (`solveCameraMotion`)
    key_e, key_o = jax.random.split(key)
    ego_corr = s_obs_ok & (trk.s_age > 0) & state.s_lmk_valid
    ns_pool = ego_corr.shape[0]
    no = trk.obj_labels.shape[0]
    # points of objects that scene flow classified STATIC at k-1 join the
    # ego solve (the reference demotes such "dynamic" features to the static
    # set, `vision_tools::trackDynamic` / VisionTools.cc demotion rule)
    if cfg.use_static_object_points_for_ego and not first_frame:
        d_obj_c = jnp.clip(trk.d_obj, 0, no - 1)
        demoted = (
            (trk.d_obj >= 0)
            & state.obj_static[d_obj_c]
            & d_obs_ok
            & (trk.d_age > 0)
            & state.d_lmk_valid
        )
        ego_lmk = jnp.concatenate([state.s_lmk, state.d_lmk], axis=0)
        ego_uv = jnp.concatenate([trk.s_uv, trk.d_uv], axis=0)
        ego_xyz = jnp.concatenate([s_xyz, d_xyz], axis=0)
        ego_valid = jnp.concatenate([ego_corr, demoted], axis=0)
    else:
        ego_lmk, ego_uv, ego_xyz, ego_valid = (
            state.s_lmk, trk.s_uv, s_xyz, ego_corr
        )
    ego_mode = cfg.ego_motion_solver if cfg.use_ego_motion_pnp else "3d3d"
    if ego_mode == "3d2d":
        # 3d-2d PnP (Kneip path, the RGB-D default,
        # `geometricOutlierRejection3d2d`)
        ego = ransac_pose_3d2d(
            key_e,
            ego_lmk,
            ego_uv,
            ego_xyz,
            ego_valid,
            cam,
            iters=cfg.camera_solver.ransac_iterations,
            threshold_px=cfg.camera_solver.ransac_threshold_px,
            min_inliers=cfg.camera_solver.min_inliers,
            score_cap=cfg.camera_solver.ransac_score_cap or None,
        )
    elif ego_mode == "3d3d":
        # 3d-3d Arun (`geometricOutlierRejection3d3d`): p_world = X(y_cam)
        from ..ops.ransac import ransac_rigid

        ego = ransac_rigid(
            key_e,
            src=ego_xyz,
            dst=ego_lmk,
            valid=ego_valid,
            iters=cfg.camera_solver.ransac_iterations,
            threshold=cfg.camera_solver.ransac_threshold_stereo_m,
            min_inliers=5,
            score_cap=cfg.camera_solver.ransac_score_cap or None,
        )
    elif ego_mode == "2d2d":
        # 2d-2d epipolar (`geometricOutlierRejection2d2d`): needs no depth
        # or landmarks — correspondences are (kp_{k-1}, kp_k) pairs.  Metric
        # scale comes from the previous frame's depth where available
        # (RGB-D); a pure-mono caller gets the scale-free |t|=1 pose.
        from ..ops.epipolar import (
            normalize_points,
            ransac_essential,
            ransac_translation_given_rot,
            scale_from_depth,
        )

        corr2d = trk.s_active & (trk.s_age > 0)
        if cfg.camera_solver.ransac_use_2point_mono:
            # 2-pt translation-only with the constant-velocity rotation
            # prior R(T_{k,k-1}) = rel_prev.R^T (MotionSolver.cc:161-177
            # takes it from IMU; we use the motion model)
            R_prior = jnp.swapaxes(state.rel_prev.R, -1, -2)
            ep2 = ransac_translation_given_rot(
                key_e, prev_uv_s, trk.s_uv, corr2d, cam, R_prior,
                iters=cfg.camera_solver.ransac_iterations_2d2d,
                threshold=cfg.camera_solver.ransac_threshold_mono,
            )
            ep5 = ransac_essential(
                key_e, prev_uv_s, trk.s_uv, corr2d, cam,
                iters=cfg.camera_solver.ransac_iterations_2d2d,
                threshold=cfg.camera_solver.ransac_threshold_mono,
            )
            use2 = state.rel_prev_valid
            ep_rel = SE3(
                jnp.where(use2, ep2.rel_pose.R, ep5.rel_pose.R),
                jnp.where(use2, ep2.rel_pose.t, ep5.rel_pose.t),
            )
            ep_inl = jnp.where(use2, ep2.inliers, ep5.inliers)
            ep_n = jnp.where(use2, ep2.n_inliers, ep5.n_inliers)
        else:
            ep = ransac_essential(
                key_e, prev_uv_s, trk.s_uv, corr2d, cam,
                iters=cfg.camera_solver.ransac_iterations_2d2d,
                threshold=cfg.camera_solver.ransac_threshold_mono,
            )
            ep_rel, ep_inl, ep_n = ep.rel_pose, ep.inliers, ep.n_inliers
        prev_d2, prev_d2ok = _depth_at(
            prev_images.depth, prev_uv_s, cfg.max_background_depth, corr2d
        )
        scale, _ = scale_from_depth(
            ep_rel,
            normalize_points(cam, prev_uv_s),
            normalize_points(cam, trk.s_uv),
            jnp.where(prev_d2ok, prev_d2, 0.0),
            ep_inl,
        )
        # x_k ~ R x_{k-1} + t  =>  T_{k,k-1}; X_k = X_{k-1} T_{k,k-1}^-1
        T_rel = SE3(ep_rel.R, ep_rel.t * scale)
        X_2d2d = se3_compose(state.X_world, se3_inverse(T_rel))
        ego = RansacResult(
            pose=X_2d2d,
            inliers=ep_inl,
            n_inliers=ep_n,
            status=jnp.where(
                ep_n >= cfg.camera_solver.min_inliers,
                STATUS_VALID,
                2,  # STATUS_INVALID
            ),
        )
    else:
        raise ValueError(f"unknown ego_motion_solver {cfg.ego_motion_solver}")
    ego_ok = ego.status == STATUS_VALID
    # fallback: propagate with identity relative motion (the reference sets
    # X = X_{k-1} on failure, `RGBDInstanceFrontendModule.cc:239-241`)
    accept_ego = ego_ok & (not first_frame)
    X_k = SE3(
        jnp.where(accept_ego, ego.pose.R, state.X_world.R),
        jnp.where(accept_ego, ego.pose.t, state.X_world.t),
    )

    # ---------------- scene-flow dynamicity (`vision_tools::trackDynamic`)
    # world scene flow of dynamic tracks seen at k-1 and k.  Runs BEFORE
    # the joint-OF pose refinement (deviation from the reference's order:
    # the classification/gating thresholds are meters/pixels-scale while
    # the refinement moves X by sub-centimeter, and classifying first lets
    # the ego and per-object flow+pose refiners run as ONE batched LM
    # problem — see the fused-refine block below).
    prop = d_obs_ok & (trk.d_age > 0) & state.d_lmk_valid
    m_cur_w = se3_apply(X_k, d_xyz)
    sf = jnp.linalg.norm(m_cur_w - state.d_lmk, axis=-1)
    is_static_pt = sf < cfg.scene_flow_mag_threshold
    obj_of = jnp.where(prop, trk.d_obj, -1)
    onehot = jax.nn.one_hot(obj_of, no, dtype=s_xyz.dtype)     # (ND, O)
    n_per_obj = jnp.einsum("no->o", onehot)
    n_static = jnp.einsum("no,n->o", onehot, is_static_pt.astype(s_xyz.dtype))
    frac_static = n_static / jnp.maximum(n_per_obj, 1.0)
    obj_is_dynamic = (
        trk.obj_active
        & (n_per_obj >= cfg.min_dynamic_features_per_object)
        & (frac_static <= cfg.scene_flow_percentage)
    )
    # positively-classified STATIC objects (enough observations, mostly
    # static scene flow) feed next frame's ego solve; re-promotes to
    # dynamic automatically as soon as the flow says otherwise
    obj_static_new = (
        trk.obj_active
        & (n_per_obj >= cfg.min_dynamic_features_per_object)
        & (frac_static > cfg.scene_flow_percentage)
        & (not first_frame)
    )

    # ---------------- object motions (`solveObjectMotions`), vmapped
    # compact each object's correspondences into (O, DPO)
    dpo = min(DPO, prop.shape[0])

    def gather_obj(j):
        score = jnp.where(prop & (trk.d_obj == j), 1.0, -jnp.inf) - (
            jnp.arange(prop.shape[0]) * 1e-9
        )
        _, idx = jax.lax.top_k(score, dpo)
        ok = prop[idx] & (trk.d_obj[idx] == j)
        return idx, ok

    obj_ids = jnp.arange(no)
    # prev-frame depth for object refinement AND (when the ego refiner runs)
    # the ego refiner's static keypoints — ONE merged point call
    run_ego_ref = cfg.refine_camera_pose_with_joint_of and not first_frame
    if run_ego_ref:
        pd_both = bilinear_sample(
            prev_images.depth,
            jnp.concatenate([prev_uv_d, prev_uv_s], axis=0),
            jnp.concatenate([prop, ego.inliers[:ns_pool]], axis=0),
        )
        d_depth_prev = pd_both[: prev_uv_d.shape[0]]
        prev_d = pd_both[prev_uv_d.shape[0]:]
        prev_dok = (prev_d > 0.0) & (prev_d < cfg.max_background_depth)
    else:
        d_depth_prev = bilinear_sample(prev_images.depth, prev_uv_d, prop)

    def ransac_obj(j, idx, ok, k_obj):
        p_prev_w = state.d_lmk[idx]
        uv_cur = trk.d_uv[idx]
        xyz_cur = d_xyz[idx]
        if cfg.use_motion_model_gating:
            # constant-velocity gating (`motionModelOutlierRejection3d2d`,
            # MotionSolver.cc:564-633): predict with last frame's motion and
            # drop correspondences whose reprojection disagrees wildly.
            # Projects through the pre-refinement X_k (px-scale threshold;
            # see the fused-refine note above).
            Hj_prev = SE3(state.obj_H_prev.R[j], state.obj_H_prev.t[j])
            pred_w = se3_apply(Hj_prev, p_prev_w)
            pred_uv, zpred = _project_world(cam, X_k, pred_w)
            mm_err = jnp.linalg.norm(pred_uv - uv_cur, axis=-1)
            gate = (mm_err < cfg.motion_model_threshold_px) | (zpred <= 0.05)
            ok = ok & jnp.where(state.obj_H_prev_valid[j], gate, True)
        res = ransac_pose_3d2d(
            k_obj, p_prev_w, uv_cur, xyz_cur, ok, cam,
            iters=cfg.object_solver.ransac_iterations,
            threshold_px=cfg.object_solver.ransac_threshold_px,
            min_inliers=cfg.object_solver.min_inliers,
        )
        return res.pose, res.inliers, res.status == STATUS_VALID

    # Only the top-`max_active_objects` slots by point support actually run
    # the (expensive: RANSAC + two refinements) solve — the analog of the
    # reference solving only OBSERVED objects
    # (`RGBDInstanceFrontendModule.cc:297-315` iterates the frame's
    # object-observation map, not an id range).  Non-selected slots fall
    # through to the existing hold/reinit pose logic.
    k_act = min(cfg.max_active_objects, no)
    if k_act < no:
        score = jnp.where(
            trk.obj_active & obj_is_dynamic, n_per_obj, -1
        )
        _, act = jax.lax.top_k(score, k_act)               # distinct slots
    else:
        act = obj_ids
    idxs, oks = jax.vmap(gather_obj)(act)
    keys_o = jax.random.split(key_o, k_act)
    G_act, inl_act, solved_act = jax.vmap(ransac_obj)(act, idxs, oks, keys_o)

    # ---------------- fused joint flow+pose refinement (ego + objects).
    # The reference refines the camera pose and each object's "virtual
    # camera" G with the SAME optimizer (`OpticalFlowAndPoseOptimizer`,
    # MotionSolver.cc:289-362 / :493-509) one problem at a time.  The
    # refiner while-loops are iteration-LATENCY bound on TPU, not
    # FLOP-bound, so all (1 + k_act) problems run as ONE vmapped LM batch
    # (track axes padded to a common width) at the latency of one.
    run_obj_ref = cfg.refine_motion_with_joint_of and not first_frame
    part_obj = inl_act & (d_depth_prev[idxs] > 0.0)
    if run_ego_ref or run_obj_ref:
        width = max(ns_pool if run_ego_ref else 0, dpo if run_obj_ref else 0)

        def _padw(a, fill):
            pad = [(0, 0), (0, width - a.shape[1])]
            pad += [(0, 0)] * (a.ndim - 2)
            return jnp.pad(a, pad, constant_values=fill)

        Rs, ts, kps, dps, fls, vas = [], [], [], [], [], []
        if run_ego_ref:
            # prev_d / prev_dok come from the merged prev-depth sample above
            participated = ego.inliers[:ns_pool] & prev_dok
            Rs.append(X_k.R[None])
            ts.append(X_k.t[None])
            kps.append(_padw(prev_uv_s[None], 0.0))
            dps.append(_padw(prev_d[None], 0.0))
            fls.append(_padw((trk.s_uv - prev_uv_s)[None], 0.0))
            vas.append(_padw(participated[None], False))
        if run_obj_ref:
            uv_prev_o = prev_uv_d[idxs]                    # (k_act, dpo, 2)
            Rs.append(G_act.R)
            ts.append(G_act.t)
            kps.append(_padw(uv_prev_o, 0.0))
            dps.append(_padw(d_depth_prev[idxs], 0.0))
            fls.append(_padw(trk.d_uv[idxs] - uv_prev_o, 0.0))
            vas.append(_padw(part_obj, False))

        def _one(Xi_R, Xi_t, kp, dp, fl, va):
            return refine.optimize_flow_and_pose(
                cam, SE3(Xi_R, Xi_t), state.X_world, kp, dp, fl, va,
                max_iterations=cfg.refinement_max_lm_iterations,
                outlier_rounds=(
                    cfg.refinement_outlier_rounds
                    if cfg.joint_of_outlier_reject else 0
                ),
            )

        fp_all = jax.vmap(_one)(
            jnp.concatenate(Rs), jnp.concatenate(ts),
            jnp.concatenate(kps), jnp.concatenate(dps),
            jnp.concatenate(fls), jnp.concatenate(vas),
        )
    o0 = 1 if run_ego_ref else 0

    if run_ego_ref:
        fp_pose = SE3(fp_all.pose.R[0], fp_all.pose.t[0])
        fp_flow = fp_all.flow[0, :ns_pool]
        fp_inl = fp_all.inliers[0, :ns_pool]
        X_k = SE3(
            jnp.where(ego_ok, fp_pose.R, X_k.R),
            jnp.where(ego_ok, fp_pose.t, X_k.t),
        )
        # ---- write the refined flow back into the frame/tracker state
        # (`OpticalFlowAndPoseOptimizer::updateFrameOutliersWithResult`,
        # MotionSolver.cc:289-362): inlier keypoints move to
        # kp_{k-1} + refined_flow if they stay in-bounds and on the
        # background mask; rejected tracks are marked outliers so the
        # tracker replaces them.  Unlike the reference (which leaves the
        # old depth attached to the moved keypoint) we re-sample depth at
        # the refined keypoint — xyz and uv stay consistent.
        refined_uv = prev_uv_s + fp_flow
        hgt, wid = images.gray.shape
        inb = (
            (refined_uv[:, 0] >= 0.0) & (refined_uv[:, 0] <= wid - 1.0)
            & (refined_uv[:, 1] >= 0.0) & (refined_uv[:, 1] <= hgt - 1.0)
        )
        # one shared-position sample for (depth, label) at the refined
        # keypoints; non-written rows keep the depth already sampled at
        # their (unchanged) position — no full-pool resample
        from ..ops.klt import sample_channels

        d_ref, lab = sample_channels(
            (images.depth, images.mask), ("bilinear", "nearest"), refined_uv,
            valid=participated & fp_inl & ego_ok,
        )
        wb = participated & fp_inl & inb & (lab == 0) & ego_ok
        new_outlier = participated & ~wb & ego_ok
        s_uv_new = jnp.where(wb[:, None], refined_uv, trk.s_uv)
        trk = trk._replace(
            s_uv=s_uv_new, s_active=trk.s_active & ~new_outlier
        )
        s_depth = jnp.where(wb, d_ref, s_depth)
        s_dok = (s_depth > 0.0) & (s_depth < cfg.max_background_depth)
        s_xyz = backproject(cam, trk.s_uv, s_depth)
        s_obs_ok = trk.s_active & s_dok

    if run_obj_ref:
        fpo_R = fp_all.pose.R[o0:]
        fpo_t = fp_all.pose.t[o0:]
        fpo_flow = fp_all.flow[o0:, :dpo]
        fpo_inl = fp_all.inliers[o0:, :dpo]
    else:
        fpo_R = jnp.broadcast_to(
            jnp.eye(3, dtype=X_k.R.dtype), (k_act, 3, 3)
        )
        fpo_t = jnp.zeros((k_act, 3), X_k.t.dtype)
        fpo_flow = jnp.zeros((k_act, dpo, 2), trk.d_uv.dtype)
        fpo_inl = jnp.zeros((k_act, dpo), bool)

    def post_obj(j, idx, ok, G, inl, ok_solved, part, fR, ft, fflow, finl):
        p_prev_w = state.d_lmk[idx]
        uv_cur = trk.d_uv[idx]
        uv_prev = prev_uv_d[idx]
        ref_uv = uv_cur
        wb = jnp.zeros_like(ok)
        d_ref = jnp.zeros((idx.shape[0],), d_xyz.dtype)
        if run_obj_ref:
            G = SE3(
                jnp.where(ok_solved, fR, G.R),
                jnp.where(ok_solved, ft, G.t),
            )
            if cfg.joint_of_outlier_reject:
                inl = jnp.where(ok_solved, finl, inl)
            # refined-keypoint write-back candidates (bounds + same-object
            # mask label checked like `updateFrameOutliersWithResult`);
            # depth is sampled in the SAME point-kernel call as the label
            from ..ops.klt import sample_channels

            ref_uv = uv_prev + fflow
            hgt, wid = images.gray.shape
            inb = (
                (ref_uv[:, 0] >= 0.0) & (ref_uv[:, 0] <= wid - 1.0)
                & (ref_uv[:, 1] >= 0.0) & (ref_uv[:, 1] <= hgt - 1.0)
            )
            d_ref, lab_o = sample_channels(
                (images.depth, images.mask), ("bilinear", "nearest"), ref_uv,
                valid=part & finl & ok_solved,
            )
            lab_ok = lab_o == trk.obj_labels[j]
            wb = part & finl & inb & lab_ok & ok_solved
            ref_uv = jnp.where(wb[:, None], ref_uv, uv_cur)
        # H_w = X_k ∘ G^-1 (ref: `ObjectMotionSovler`, MotionSolver.cc:492-511)
        H = se3_compose(X_k, se3_inverse(G))
        if cfg.refine_motion_with_3d:
            mr = refine.optimize_motion_only(
                cam, H, state.X_world, X_k, p_prev_w, uv_prev, uv_cur,
                inl,
                max_iterations=cfg.refinement_max_lm_iterations,
                outlier_rounds=(
                    cfg.refinement_outlier_rounds
                    if cfg.refinement_3d_outlier_reject else 0
                ),
            )
            H = SE3(
                jnp.where(ok_solved, mr.motion.R, H.R),
                jnp.where(ok_solved, mr.motion.t, H.t),
            )
            if cfg.refinement_3d_outlier_reject:
                inl = jnp.where(ok_solved, mr.inliers, inl)
        return H, inl, ref_uv, wb, d_ref

    H_act, obj_inl, ref_uvs, wbs, d_refs = jax.vmap(post_obj)(
        act, idxs, oks, G_act, inl_act, solved_act, part_obj,
        fpo_R, fpo_t, fpo_flow, fpo_inl,
    )
    if k_act < no:
        # expand to the full slot axis (top_k indices are distinct, so
        # .at[].set never collides); unsolved slots get identity H and
        # solved=False, exactly the failed-solve hold path
        eye = jnp.broadcast_to(jnp.eye(3, dtype=H_act.R.dtype), (no, 3, 3))
        H_all = SE3(
            eye.at[act].set(H_act.R),
            jnp.zeros((no, 3), H_act.t.dtype).at[act].set(H_act.t),
        )
        solved = jnp.zeros((no,), bool).at[act].set(solved_act)
    else:
        H_all, solved = H_act, solved_act
    motion_valid = solved & obj_is_dynamic & (not first_frame)

    # scatter per-object inliers back to the (ND,) dynamic pool; fresh
    # samples (age 0, not in any solve) stay eligible so new tracks can
    # start their chains
    d_inlier = jnp.zeros(prop.shape, bool)
    d_inlier = d_inlier.at[idxs.reshape(-1)].max(
        (obj_inl & oks).reshape(-1)
    )
    d_inlier = d_inlier | ~prop

    # ---- refined-flow write-back for dynamic tracks (the per-object
    # `optimizeAndUpdate` of the reference).  Scatter-add of masked deltas:
    # a slot receives a nonzero delta from at most one object (tracks
    # belong to one object), duplicate gather paddings add zero.
    wb_flat = (wbs & oks).reshape(-1)
    idx_flat = idxs.reshape(-1)
    delta_uv = jnp.where(
        wb_flat[:, None],
        ref_uvs.reshape(-1, 2) - trk.d_uv[idx_flat],
        0.0,
    )
    d_uv_new = trk.d_uv.at[idx_flat].add(delta_uv)
    trk = trk._replace(d_uv=d_uv_new)
    # only written slots moved, and their depth was sampled alongside the
    # label inside solve_obj — scatter it instead of resampling the pool
    delta_d = jnp.where(
        wb_flat, d_refs.reshape(-1) - d_depth[idx_flat], 0.0
    )
    d_depth = d_depth.at[idx_flat].add(delta_d)
    d_dok = (d_depth > 0.0) & (d_depth < cfg.max_object_depth)
    d_xyz = backproject(cam, trk.d_uv, d_depth)
    d_obs_ok = trk.d_active & d_dok
    m_cur_w = se3_apply(X_k, d_xyz)

    # ---------------- object pose propagation (`propogateObjectPoses`,
    # `src/common/DynamicObjects.cc:48-191`).
    # L_k = H_k L_{k-1} while the motion chain is unbroken; a motion that
    # RESUMES after a gap < 3 frames restarts from (last rotation, current
    # centroid) — the causal endpoint of the reference's slerp interpolation
    # (the interior fill happens offline in the backend accessor); longer
    # gaps re-initialise from the previous-frame centroid before applying H.
    centroid = jnp.einsum("no,nd->od", onehot, m_cur_w) / jnp.maximum(
        n_per_obj[:, None], 1.0
    )
    cen_prev = jnp.einsum("no,nd->od", onehot, state.d_lmk) / jnp.maximum(
        n_per_obj[:, None], 1.0
    )
    gap = state.obj_gap
    fresh = gap == 0
    prop_ok = motion_valid & state.obj_pose_valid & fresh
    resume_ok = (
        motion_valid & state.obj_pose_valid & (gap >= 1) & (gap < 3)
    )
    reinit_m = motion_valid & ~(prop_ok | resume_ok)
    hold = state.obj_pose_valid & ~motion_valid
    first_init = (
        ~state.obj_pose_valid & ~motion_valid
        & trk.obj_active & (n_per_obj > 0)
    )

    prop_pose = se3_compose(H_all, state.obj_pose)
    # reinit: pose_{k-1} = (I, centroid_{k-1}), pose_k = H * pose_{k-1}
    reinit_pose = SE3(
        H_all.R,
        jnp.einsum("oij,oj->oi", H_all.R, cen_prev) + H_all.t,
    )
    eye_R = jnp.broadcast_to(
        jnp.eye(3, dtype=centroid.dtype), prop_pose.R.shape
    )
    L_R = jnp.where(
        prop_ok[:, None, None], prop_pose.R,
        jnp.where(
            resume_ok[:, None, None], state.obj_pose.R,
            jnp.where(
                reinit_m[:, None, None], reinit_pose.R,
                jnp.where(hold[:, None, None], state.obj_pose.R, eye_R),
            ),
        ),
    )
    L_t = jnp.where(
        prop_ok[:, None], prop_pose.t,
        jnp.where(
            resume_ok[:, None], centroid,
            jnp.where(
                reinit_m[:, None], reinit_pose.t,
                jnp.where(hold[:, None], state.obj_pose.t, centroid),
            ),
        ),
    )
    L_k = SE3(L_R, L_t)
    updated = prop_ok | resume_ok | reinit_m | first_init
    pose_valid = updated | hold
    obj_gap_new = jnp.where(
        updated, 0, jnp.minimum(gap + 1, 10000)
    )

    # ---------------- output packet
    static_out = StaticObs(uv=trk.s_uv, xyz=s_xyz, valid=s_obs_ok)
    dyn_valid_out = (
        d_obs_ok
        & d_inlier
        & jnp.where(
            trk.d_obj >= 0, motion_valid[jnp.clip(trk.d_obj, 0, no - 1)], False
        )
    )
    dynamic_out = DynamicObs(
        uv=trk.d_uv,
        xyz=d_xyz,
        obj=jnp.where(dyn_valid_out, trk.d_obj, INVALID_ID),
        valid=dyn_valid_out,
    )
    objects_out = ObjectObs(
        motion=H_all,
        motion_valid=motion_valid,
        pose=L_k,
        pose_valid=pose_valid,
        label=trk.obj_labels,
    )
    packet = FrontendOutput(
        frame_id=state.frame_idx,
        timestamp=state.frame_idx.astype(images.gray.dtype),
        X_world=X_k,
        static_obs=static_out,
        dynamic_obs=dynamic_out,
        objects=objects_out,
    )

    # ---------------- state update
    new_state = FrontendState(
        tracker=trk,
        X_world=X_k,
        s_lmk=se3_apply(X_k, s_xyz),
        s_lmk_valid=s_obs_ok,
        d_lmk=m_cur_w,
        d_lmk_valid=d_obs_ok,
        obj_pose=L_k,
        obj_pose_valid=pose_valid,
        obj_H_prev=H_all,
        obj_H_prev_valid=motion_valid,
        obj_static=obj_static_new,
        obj_gap=obj_gap_new,
        rel_prev=se3_compose(se3_inverse(state.X_world), X_k),
        rel_prev_valid=jnp.asarray(not first_frame) & ego_ok,
        frame_idx=state.frame_idx + 1,
    )
    return new_state, packet, report, ego
