"""RGB-D backend module: map update + windowed/full-batch optimization.

TPU-native analog of `RGBDBackendModule`
(`src/backend/RGBDBackendModule.cc:78-440`): per frame it
  1. inserts the frontend packet into the measurement map (`updateMap`,
     :264),
  2. checks the sliding-window trigger (`SlidingWindow::check`,
     `backend/RGBDBackendModule.hpp:87-145`: window size W, overlap V ->
     optimize [start, start+W) when frame start+W-1 arrives, then
     start += W - V), or defers everything to one full-batch solve
     (`--use_full_batch_opt`),
  3. builds the window graph functionally (our `formulation.py`; the
     reference likewise *reconstructs* each window graph from the map,
     `constructGraph` :280-341) and runs LM,
  4. writes the optimized values back into the global estimate store (the
     analog of `Formulation::updateTheta` + accessor caches).

The optimization step itself is a single jitted computation; only the
trigger logic runs in Python (it is pure frame-count arithmetic, matching
the reference's host-side check).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.lie import (
    SE3,
    se3_compose,
    se3_exp,
    se3_identity,
    se3_inverse,
    se3_log,
)
from ..core.types import FrontendOutput
from ..utils.config import BackendConfig, CapacityConfig
from . import formulation as fm
from .map import (
    MeasurementMap,
    WindowData,
    compact_window,
    slice_window,
    update_map,
)
from .solver import LMConfig, LMResult, lm_optimize

_update_map_jit = jax.jit(update_map)


@dataclasses.dataclass
class EstimateStore:
    """Global state estimates over all frames (device arrays)."""

    X: SE3            # (F,) camera poses
    H: SE3            # (F, O) object motions
    L: SE3            # (F, O) object poses (propagated, see accessor)
    static_points: jax.Array   # (NS, 3)
    static_valid: jax.Array    # (NS,)
    dyn_points: jax.Array      # (F, ND, 3)
    dyn_valid: jax.Array       # (F, ND)
    X_valid: jax.Array         # (F,)
    motion_valid: jax.Array    # (F, O)

    @staticmethod
    def create(f: int, ns: int, nd: int, no: int, dtype=jnp.float32):
        return EstimateStore(
            X=se3_identity((f,), dtype),
            H=se3_identity((f, no), dtype),
            L=se3_identity((f, no), dtype),
            static_points=jnp.zeros((ns, 3), dtype),
            static_valid=jnp.zeros((ns,), bool),
            dyn_points=jnp.zeros((f, nd, 3), dtype),
            dyn_valid=jnp.zeros((f, nd), bool),
            X_valid=jnp.zeros((f,), bool),
            motion_valid=jnp.zeros((f, no), bool),
        )


class SlidingWindowTrigger:
    """Frame-count arithmetic of `SlidingWindow::check`
    (`backend/RGBDBackendModule.hpp:120-144`)."""

    def __init__(self, size: int, overlap: int, first_frame: int = 0):
        assert 0 <= overlap < size
        self.size = size
        self.overlap = overlap
        self.start = first_frame

    def check(self, frame_idx: int):
        """Returns window start if [start, start+size) is complete at this
        frame, else None."""
        if frame_idx >= self.start + self.size - 1:
            s = self.start
            self.start = s + (self.size - self.overlap)
            return s
        return None


def optimize_window(
    m: MeasurementMap,
    start,
    window: int,
    cfg: BackendConfig,
    lm_cfg: LMConfig,
    anchor: SE3,
    use_anchor,
    updater: int = 0,
    prev: dict | None = None,
    prev_mask: dict | None = None,
    anchor_prior_L=None,
):
    """Slice a window from the map, build + solve its graph.  One XLA program.

    `anchor_prior_L`: optional (6, 6) Cholesky factor of a full-covariance
    prior on the first window pose — the fixed-lag boundary marginal
    (`backend/fixed_lag.py`); replaces the isotropic gauge anchor in the
    direct-Schur path.

    `anchor` pins the first window pose (gauge); `use_anchor` selects between
    the provided anchor (overlap with previous window) and the frontend pose.
    `prev`/`prev_mask` warm-start overlap frames from the estimate store —
    the analog of the reference Formulation's persistent `theta_` values.
    """
    w = slice_window(m, start, window)
    F, NS, ND, O = m.capacity
    pose_key = "H" if updater == 0 else "L"
    # compact oversized pools to the window's most-observed slots (the
    # reference's constructGraph(from,to) likewise rebuilds each window
    # graph from only the in-range nodes); varpro (experimental, default
    # off) stays uncompacted
    ns_win = min(NS, cfg.window_max_static or NS)
    nd_win = min(ND, cfg.window_max_dynamic or ND)
    no_win = min(O, cfg.window_max_objects or O)
    # sliding-window solves only: a full-batch solve over a long sequence
    # legitimately carries more active tracks than the window caps, and
    # top-k compaction would silently drop its thinnest tracks
    compacting = (
        not cfg.use_varpro
        and window <= cfg.schur_max_window
        and (ns_win < NS or nd_win < ND or no_win < O)
    )
    if compacting:
        w, sp_idx, dp_idx, obj_idx = compact_window(w, ns_win, nd_win, no_win)
        if prev is not None:
            take1 = lambda a, idx: jnp.take(a, idx, axis=1)
            take1_se3 = lambda p, idx: SE3(take1(p.R, idx), take1(p.t, idx))
            prev = {
                "X": prev["X"],
                pose_key: take1_se3(prev[pose_key], obj_idx),
                "sp": jnp.take(prev["sp"], sp_idx, axis=0),
                "dp": take1(prev["dp"], dp_idx),
            }
            prev_mask = {
                "X": prev_mask["X"],
                pose_key: take1(prev_mask[pose_key], obj_idx),
                "sp": jnp.take(prev_mask["sp"], sp_idx, axis=0),
                "dp": take1(prev_mask["dp"], dp_idx),
            }
    masks = fm.build_masks(w, cfg)

    def finish(result, masks):
        """Scatter compacted values/masks back to pool coordinates so
        callers (write-back, estimate stores) are compaction-agnostic."""
        if not compacting:
            return result, masks
        dt = w.static_xyz.dtype
        values = dict(result.values)
        sp_f = jnp.zeros((NS, 3), dt).at[sp_idx].set(values["sp"])
        dp_f = jnp.zeros((window, ND, 3), dt).at[:, dp_idx].set(values["dp"])
        P = values[pose_key]
        P_id = se3_identity((window, O), dt)
        P_f = SE3(
            P_id.R.at[:, obj_idx].set(P.R), P_id.t.at[:, obj_idx].set(P.t)
        )
        values.update({"sp": sp_f, "dp": dp_f, pose_key: P_f})
        zb = lambda shape: jnp.zeros(shape, bool)
        masks_f = masks._replace(
            static_obs=zb((window, NS)).at[:, sp_idx].set(masks.static_obs),
            dyn_obs=zb((window, ND)).at[:, dp_idx].set(masks.dyn_obs),
            ternary=zb((window, ND)).at[:, dp_idx].set(masks.ternary),
            smoothing=zb((window, O)).at[:, obj_idx].set(masks.smoothing),
            motion_active=zb((window, O)).at[:, obj_idx].set(
                masks.motion_active
            ),
        )
        return result._replace(values=values), masks_f

    anchor_pose = SE3(
        jnp.where(use_anchor, anchor.R, w.X_init.R[0]),
        jnp.where(use_anchor, anchor.t, w.X_init.t[0]),
    )
    if updater == 0 and cfg.use_varpro:
        # Schur-eliminated (variable projection) reduced problem over
        # {X, H}; landmarks recovered in closed form afterwards
        from . import varpro

        full_init = fm.init_values(w, masks, cfg)
        values = {"X": full_init["X"], "H": full_init["H"]}
        spec = fm.world_motion_families(cfg)
        resid = lambda v: varpro.world_motion_varpro_residuals(
            v, w, masks, cfg, anchor_pose
        )
        # NOTE: the full-problem analytic diag catastrophically over-damps
        # the reduced problem (the eliminated ternary terms dominate it at
        # huber weight 1 while the true reduced sensitivity is tiny);
        # Hutchinson on the reduced operator is unbiased for the Schur
        # complement, so use it here.
        result = lm_optimize(resid, spec.robust, values, lm_cfg, gn_diag_fn=None)
        # recover landmarks for write-back
        X, H = result.values["X"], result.values["H"]
        obj_idx = jnp.clip(w.dyn_obj, 0, H.batch_shape[1] - 1)
        H_all = SE3(
            jnp.take_along_axis(H.R, obj_idx[..., None, None], axis=1),
            jnp.take_along_axis(H.t, obj_idx[..., None], axis=1),
        )
        full_values = {
            "X": X,
            "H": H,
            "sp": varpro.optimal_static_points(X, w, masks),
            "dp": varpro.optimal_dynamic_points(X, H_all, w, masks, cfg),
        }
        result = result._replace(values=full_values)
        return result, masks
    if cfg.use_schur and window <= cfg.schur_max_window:
        # direct reduced solver: exact landmark elimination + dense Cholesky
        # over {X, H|L} each LM iteration (backend/schur.py) — both
        # formulations, matching the reference's treatment of updater 0/1
        # as first-class (`WorldMotionEstimator.cc` / `WorldPoseEstimator.cc`)
        from . import schur

        if updater == 0:
            values = fm.init_values(w, masks, cfg, prev=prev, prev_mask=prev_mask)
        else:
            values = fm.init_values_world_pose(
                w, masks, cfg, prev=prev, prev_mask=prev_mask
            )
        result = schur.lm_optimize_schur(
            values, w, masks, cfg, lm_cfg, anchor_pose, formulation=updater,
            anchor_prior_L=anchor_prior_L,
        )
        return finish(result, masks)
    if updater == 0:
        values = fm.init_values(w, masks, cfg, prev=prev, prev_mask=prev_mask)
        spec = fm.world_motion_families(cfg)
        resid = lambda v: fm.world_motion_residuals(v, w, masks, cfg, anchor_pose)
        gn_diag = lambda v, sw: fm.world_motion_gn_diag(v, sw, w, masks, cfg)
    else:
        values = fm.init_values_world_pose(
            w, masks, cfg, prev=prev, prev_mask=prev_mask
        )
        spec = fm.world_pose_families(cfg)
        resid = lambda v: fm.world_pose_residuals(v, w, masks, cfg, anchor_pose)
        gn_diag = lambda v, sw: fm.world_pose_gn_diag(v, sw, w, masks, cfg)

    result = lm_optimize(resid, spec.robust, values, lm_cfg, gn_diag_fn=gn_diag)
    return finish(result, masks)


# the pure `optimize_window` is traced inside larger programs (the fused
# segment pipeline, `throughput.py`); the jitted wrapper is the standalone
# entry the online backend dispatches per window trigger
optimize_window_jit = jax.jit(
    optimize_window, static_argnames=("window", "cfg", "updater")
)


def _boundary_prior_impl(m, start, n_sub, cfg, est_values, updater, anchor,
                         prev_prior_L):
    from .fixed_lag import boundary_prior

    return boundary_prior(
        m, start, n_sub, cfg, est_values, updater, anchor, prev_prior_L
    )


boundary_prior_jit = jax.jit(
    _boundary_prior_impl, static_argnames=("n_sub", "cfg", "updater")
)


class RGBDBackend:
    """Stateful driver; all heavy lifting happens in jitted callees."""

    def __init__(
        self,
        cfg: BackendConfig,
        cap: CapacityConfig,
        dtype=jnp.float32,
    ):
        self.cfg = cfg
        self.cap = cap
        self.dtype = dtype
        f, ns, nd, no = (
            cap.max_frames,
            cap.max_static_tracks,
            cap.max_dynamic_tracks,
            cap.max_objects,
        )
        self.map = MeasurementMap.create(f, ns, nd, no, dtype)
        self.est = EstimateStore.create(f, ns, nd, no, dtype)
        self.n_frames = 0
        self.trigger = SlidingWindowTrigger(
            cfg.opt_window_size, cfg.opt_window_overlap
        )
        self.lm_cfg = LMConfig(
            max_iterations=cfg.lm_max_iterations,
            initial_lambda=cfg.lm_initial_lambda,
            lambda_factor=cfg.lm_lambda_factor,
            max_lambda=cfg.lm_max_lambda,
            min_lambda=cfg.lm_min_lambda,
            rel_error_tol=cfg.lm_rel_error_tol,
            abs_error_tol=cfg.lm_abs_error_tol,
            cg_max_iterations=cfg.cg_max_iterations,
            cg_tol=cfg.cg_tol,
        )
        self.last_result: Optional[LMResult] = None
        # fixed-lag smoothing state (`use_fixed_lag_prior`): previous
        # window start + the running boundary-marginal Cholesky
        self._last_window_start: Optional[int] = None
        self._prior_L = None

    # ------------------------------------------------------------------
    def spin(self, packet: FrontendOutput):
        """Insert one frontend packet; optimize if a window completed."""
        k = self.n_frames
        # jitted with k traced: ONE dispatch per frame (eager update_map is
        # ~18 scatter dispatches, each paying tunnel latency on the remote
        # TPU) and one program for every frame index
        self.map = _update_map_jit(self.map, packet, jnp.asarray(k, jnp.int32))
        self.n_frames += 1

        if self.cfg.use_full_batch_opt:
            return None
        start = self.trigger.check(k)
        if start is not None:
            self._optimize(start, self.cfg.opt_window_size)
        return self.last_result

    def finish(self):
        """End-of-sequence: full-batch solve or final partial window."""
        if self.cfg.use_full_batch_opt:
            self._optimize(0, self._full_batch_len())
        elif self.n_frames > self.trigger.start + 1:
            self._optimize(
                self.trigger.start, min(self.cfg.opt_window_size, self.cap.max_frames)
            )
        return self.last_result

    def _full_batch_len(self) -> int:
        # static shape: round up to the map capacity or next multiple of 32
        n = self.n_frames
        return min(self.cap.max_frames, max(self.cfg.opt_window_size, n))

    # ------------------------------------------------------------------
    def _optimize(self, start: int, window: int):
        window = min(window, self.cap.max_frames - start)
        if window < 2:
            return
        # anchor: previous estimate of the first window pose if it was
        # already optimized (window overlap), else frontend init.  The gate
        # stays a DEVICE scalar: fetching est.X_valid[start] to the host
        # would block on the PREVIOUS window's still-running solve and
        # serialize the pipeline — async dispatch (pipeline.py: the host
        # keeps feeding frontend frames while a window solves) requires the
        # whole spin path to never synchronize.
        use_anchor = self.est.X_valid[start]
        anchor = self.est.X[start]
        anchor_prior_L = None
        if self.cfg.use_fixed_lag_prior:
            anchor_prior_L = self._slide_prior(start)
        # warm start from the estimate store (theta_ carry-over): overlap
        # frames re-use previously optimized values.  Always pass prev (one
        # compiled program for first and subsequent windows); before any
        # optimization the store's valid masks are all False, so the merge
        # in `init_values` is the identity.
        sl = slice(start, start + window)
        pose_key = "H" if self.cfg.backend_updater_enum == 0 else "L"
        pose_est = self.est.H if pose_key == "H" else self.est.L
        prev = {
            "X": self.est.X[sl],
            pose_key: SE3(pose_est.R[sl], pose_est.t[sl]),
            "sp": self.est.static_points,
            "dp": self.est.dyn_points[sl],
        }
        prev_mask = {
            "X": self.est.X_valid[sl] & use_anchor,
            pose_key: self.est.motion_valid[sl] & use_anchor,
            "sp": self.est.static_valid & use_anchor,
            "dp": self.est.dyn_valid[sl] & use_anchor,
        }
        result, masks = optimize_window_jit(
            self.map,
            start,
            window,
            self.cfg,
            self.lm_cfg,
            anchor,
            jnp.asarray(use_anchor),
            self.cfg.backend_updater_enum,
            prev,
            prev_mask,
            anchor_prior_L,
        )
        self.last_result = result
        self._last_window_start = start
        self._write_back(start, window, result.values, masks)

    def _slide_prior(self, start: int):
        """(6, 6) anchor-prior Cholesky for the window starting at `start`
        (fixed-lag mode).  First window: the isotropic gauge anchor in
        L-form (bit-equivalent whitening).  Later windows: the boundary
        marginal of the frames that left since the previous solve."""
        from .fixed_lag import boundary_prior

        iso = jnp.eye(6, dtype=self.est.X.t.dtype) / (
            self.cfg.initial_pose_prior_sigma
        )
        last = self._last_window_start
        if last is None or start <= last:
            self._prior_L = iso
            return iso
        n_sub = start - last + 1
        sl = slice(last, last + n_sub)
        pose_key = "H" if self.cfg.backend_updater_enum == 0 else "L"
        pose_est = self.est.H if pose_key == "H" else self.est.L
        est_values = {
            "X": self.est.X[sl],
            pose_key: SE3(pose_est.R[sl], pose_est.t[sl]),
            "sp": self.est.static_points,
            "dp": self.est.dyn_points[sl],
        }
        L, _ = boundary_prior_jit(
            self.map, last, n_sub, self.cfg, est_values,
            self.cfg.backend_updater_enum, self.est.X[last],
            self._prior_L if self._prior_L is not None else iso,
        )
        self._prior_L = L
        return L

    def _write_back(self, start: int, window: int, values: dict, masks):
        """Scatter optimized window values into the estimate store.

        Everything stays a lazy device op (no `np.asarray` on solver
        outputs): a host fetch here would block on the window solve and
        defeat the frontend/backend overlap (`pipeline.py` docstring)."""
        est = self.est
        sl = slice(start, start + window)
        X = values["X"]
        est.X = SE3(est.X.R.at[sl].set(X.R), est.X.t.at[sl].set(X.t))
        est.X_valid = est.X_valid.at[sl].set(masks.frame)
        if "H" in values:
            H = values["H"]
            est.H = SE3(est.H.R.at[sl].set(H.R), est.H.t.at[sl].set(H.t))
            est.motion_valid = est.motion_valid.at[sl].set(masks.motion_active)
        if "L" in values:
            L = values["L"]
            est.L = SE3(est.L.R.at[sl].set(L.R), est.L.t.at[sl].set(L.t))
            est.motion_valid = est.motion_valid.at[sl].set(masks.motion_active)
        new_static_valid = jnp.any(masks.static_obs, axis=0)
        est.static_points = jnp.where(
            new_static_valid[:, None], values["sp"], est.static_points
        )
        est.static_valid = est.static_valid | new_static_valid
        est.dyn_points = est.dyn_points.at[sl].set(values["dp"])
        est.dyn_valid = est.dyn_valid.at[sl].set(masks.dyn_obs)

    # ------------------------------------------------------------------
    # Accessor (analog of `Accessor<MAP>`, `backend/Accessor.hpp:51-207`)
    # ------------------------------------------------------------------
    def camera_poses(self):
        """(F,) SE3 + validity of optimized camera trajectory."""
        return self.est.X, self.est.X_valid

    def object_motions(self):
        if self.cfg.backend_updater_enum == 0:
            return self.est.H, self.est.motion_valid
        # LLWorld: H_k = L_k L_{k-1}^-1 (`WorldPoseAccessor::getObjectMotion`)
        L = self.est.L
        H = se3_compose(SE3(L.R[1:], L.t[1:]), se3_inverse(SE3(L.R[:-1], L.t[:-1])))
        pad = se3_identity((1, L.R.shape[1]), L.R.dtype)
        Hfull = SE3(
            jnp.concatenate([pad.R, H.R], axis=0),
            jnp.concatenate([pad.t, H.t], axis=0),
        )
        valid = self.est.motion_valid & jnp.concatenate(
            [jnp.zeros_like(self.est.motion_valid[:1]), self.est.motion_valid[:-1]],
            axis=0,
        )
        return Hfull, valid

    def object_poses(self):
        """Propagate L_k = H_k L_{k-1} from centroid init, the analog of
        `WorldMotionAccessor::postUpdateCallback`
        (`src/backend/rgbd/WorldMotionEstimator.cc:68-152`) +
        `propogateObjectPoses` (`src/common/DynamicObjects.cc:48-160`),
        including the reference's <3-frame slerp interpolation gap-fill."""
        if self.cfg.backend_updater_enum == 1:
            return self.est.L, self.est.motion_valid
        centroids, cvalid = self.object_centroids()
        return propagate_object_poses(
            self.est.H, self.est.motion_valid, centroids, cvalid
        )

    def object_centroids(self):
        """Per (frame, object) centroid of optimized dynamic points
        (`Accessor::computeObjectCentroid`, `Accessor-impl.hpp:118-294`)."""
        dp = self.est.dyn_points
        dv = self.est.dyn_valid
        obj = self.map.dyn_obj
        O = self.cap.max_objects
        onehot = jax.nn.one_hot(jnp.where(dv, obj, -1), O, dtype=dp.dtype)
        counts = jnp.einsum("fno->fo", onehot)
        sums = jnp.einsum("fnd,fno->fod", dp, onehot)
        cent = sums / jnp.maximum(counts[..., None], 1.0)
        return cent, counts > 0


@jax.jit
def propagate_object_poses(H: SE3, hvalid, cen, cvalid, max_gap: int = 3):
    """Batched `propogateObjectPoses` (`src/common/DynamicObjects.cc:48-191`)
    over all (frame, object) slots: two `lax.scan`s replace the reference's
    per-object std::map walk (and round 1's host-side double loop).

    Forward scan: propagate L_k = H_k L_{k-1}; on a motion resuming after a
    gap < `max_gap` frames, restart from (last rotation, current centroid) —
    the slerp endpoint of the reference's interpolation; longer gaps
    re-initialise from the centroid.  Backward scan: slerp-fill the interior
    frames of every short gap between the last recorded pose and the
    resumption pose (`Pose3::slerp`, DynamicObjects.cc:160-178).
    """
    F, O = hvalid.shape
    dtype = H.t.dtype
    eye = jnp.eye(3, dtype=dtype)
    big = jnp.asarray(10 * F, jnp.int32)

    def fwd(carry, inp):
        have, R_p, t_p, age, R_last, t_last, f_last = carry
        R_H, t_H, hv, cenk, cv, k = inp
        prop = have & hv
        resume = (~have) & hv & (age < max_gap) & (f_last >= 0) & cv
        start = (~have) & (~resume) & cv
        valid = prop | resume | start
        R_new = jnp.where(
            prop[:, None, None],
            jnp.einsum("oij,ojk->oik", R_H, R_p, precision="highest"),
            jnp.where(resume[:, None, None], R_last, eye),
        )
        t_prop = (
            jnp.einsum("oij,oj->oi", R_H, t_p, precision="highest") + t_H
        )
        t_new = jnp.where(
            prop[:, None], t_prop,
            jnp.where((resume | start)[:, None], cenk, 0.0),
        )
        out = (R_new, t_new, valid, resume, R_last, t_last, f_last)
        R_lo = jnp.where(valid[:, None, None], R_new, R_last)
        t_lo = jnp.where(valid[:, None], t_new, t_last)
        f_lo = jnp.where(valid, k, f_last)
        age_o = jnp.where(valid, 0, age + 1)
        return (valid, R_new, t_new, age_o, R_lo, t_lo, f_lo), out

    init = (
        jnp.zeros(O, bool),
        jnp.broadcast_to(eye, (O, 3, 3)),
        jnp.zeros((O, 3), dtype),
        jnp.full((O,), big, jnp.int32),
        jnp.broadcast_to(eye, (O, 3, 3)),
        jnp.zeros((O, 3), dtype),
        jnp.full((O,), -1, jnp.int32),
    )
    ks = jnp.arange(F, dtype=jnp.int32)
    _, (L_R, L_t, valid, resume, R_l, t_l, f_l) = jax.lax.scan(
        fwd, init, (H.R, H.t, hvalid, cen, cvalid, ks)
    )

    # ---- backward slerp fill of short-gap interiors
    def bwd(carry, inp):
        active, R0, t0, R1, t1, f0, f1 = carry
        R_k, t_k, vk, rk, R_lk, t_lk, f_lk, k = inp
        # entering a resume frame: remember (last pose, resume pose, frames)
        act_n = jnp.where(rk, True, jnp.where(vk, False, active))
        R0n = jnp.where(rk[:, None, None], R_lk, R0)
        t0n = jnp.where(rk[:, None], t_lk, t0)
        R1n = jnp.where(rk[:, None, None], R_k, R1)
        t1n = jnp.where(rk[:, None], t_k, t1)
        f0n = jnp.where(rk, f_lk, f0)
        f1n = jnp.where(rk, k, f1)
        fill = act_n & (~vk) & (k > f0n) & (k < f1n)
        t = (k - f0n).astype(dtype) / jnp.maximum(
            (f1n - f0n).astype(dtype), 1.0
        )
        X0 = SE3(R0n, t0n)
        xi = se3_compose(se3_inverse(X0), SE3(R1n, t1n))
        Xi = se3_exp(t[:, None] * se3_log(xi))
        Xf = se3_compose(X0, Xi)
        R_out = jnp.where(fill[:, None, None], Xf.R, R_k)
        t_out = jnp.where(fill[:, None], Xf.t, t_k)
        return (act_n, R0n, t0n, R1n, t1n, f0n, f1n), (
            R_out, t_out, vk | fill,
        )

    init_b = (
        jnp.zeros(O, bool),
        jnp.broadcast_to(eye, (O, 3, 3)),
        jnp.zeros((O, 3), dtype),
        jnp.broadcast_to(eye, (O, 3, 3)),
        jnp.zeros((O, 3), dtype),
        jnp.full((O,), -1, jnp.int32),
        jnp.full((O,), -1, jnp.int32),
    )
    _, (R_f, t_f, valid_f) = jax.lax.scan(
        bwd, init_b, (L_R, L_t, valid, resume, R_l, t_l, f_l, ks),
        reverse=True,
    )
    return SE3(R_f, t_f), valid_f


def _backend_state_pytree(backend: "RGBDBackend"):
    return {
        "map": backend.map,
        "est": {
            "X": backend.est.X,
            "H": backend.est.H,
            "L": backend.est.L,
            "static_points": backend.est.static_points,
            "static_valid": backend.est.static_valid,
            "dyn_points": backend.est.dyn_points,
            "dyn_valid": backend.est.dyn_valid,
            "X_valid": backend.est.X_valid,
            "motion_valid": backend.est.motion_valid,
        },
        "n_frames": jnp.asarray(backend.n_frames),
        "window_start": jnp.asarray(backend.trigger.start),
    }


def save_backend_checkpoint(backend: "RGBDBackend", path: str):
    """Orbax checkpoint of the full solver state (map + estimates +
    window cursor) — the optimizer-state checkpointing the reference lacks
    (SURVEY §5.4)."""
    from ..utils.serialization import save_checkpoint

    save_checkpoint(path, _backend_state_pytree(backend))


def load_backend_checkpoint(backend: "RGBDBackend", path: str) -> "RGBDBackend":
    """Restore solver state into a freshly-constructed backend (same
    config/capacities) and resume."""
    from ..utils.serialization import load_checkpoint

    restored = load_checkpoint(path, _backend_state_pytree(backend))
    backend.map = restored["map"]
    e = restored["est"]
    backend.est = EstimateStore(
        X=e["X"], H=e["H"], L=e["L"],
        static_points=e["static_points"], static_valid=e["static_valid"],
        dyn_points=e["dyn_points"], dyn_valid=e["dyn_valid"],
        X_valid=e["X_valid"], motion_valid=e["motion_valid"],
    )
    backend.n_frames = int(restored["n_frames"])
    backend.trigger.start = int(restored["window_start"])
    return backend
