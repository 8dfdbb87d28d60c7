"""Static + dynamic feature tracking over fixed slot pools.

TPU-native redesign of the reference's `FeatureTracker`
(`src/frontend/vision/FeatureTracker.cc:54-342`) and
`KltFeatureTracker`/`ExternalFlowFeatureTracker`
(`src/frontend/vision/StaticFeatureTracker.cc`):

  * **Static tracks** (`trackStatic`): propagate previous inliers by
    pyramidal KLT (`ops/klt.py`) or by sampling the precomputed dense flow
    (the reference's ExternalFlow mode), verify with batched homography
    RANSAC, re-detect Shi-Tomasi corners into free slots up to
    `max_features_per_frame`, recycle tracklets older than
    `max_feature_track_age`.
  * **Dynamic tracks** (`trackDynamic`): propagate object features through
    the dense optical flow, keep only features whose propagated position
    lands on the *same* instance label, densely sample new grid points
    (every `semantic_mask_step_size` px) on uncovered object pixels.
  * **Object table**: instance labels -> dense object slots (allocate-only;
    labels are assumed temporally consistent, as provided by the datasets'
    tracking GT or by ByteTrack).

Everything is a pure function of (state, images) -> (state, outputs) with
static shapes, so one frame step is a single fused XLA program.

Tracklet ids ARE slot indices (see `core/types.py`) — the allocation
primitive `assign_slots` fills free slots with new candidates using only
sorts/cumsums (no host round-trip).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.types import INVALID_ID
from ..ops import homography
from ..ops.klt import bilinear_sample, flow_at, klt_track, nearest_at
from ..utils.config import TrackerConfig
from .detect import (
    border_mask,
    detect_grid_nms,
    grid_subsample_i32,
    occupancy_at_grid,
    occupancy_mask,
    shi_tomasi_response_fast,
)


class TrackerState(NamedTuple):
    # static pool (NS,)
    s_uv: jax.Array
    s_active: jax.Array
    s_age: jax.Array
    s_cooldown: jax.Array  # frames until a freed slot may be reused
    s_desc: jax.Array      # (NS, 256) int8 ±1 ORB descriptor at detection
    #                        (all-zero unless feature_detector_type="orb")
    # dynamic pool (ND,)
    d_uv: jax.Array
    d_active: jax.Array
    d_obj: jax.Array      # object slot per dynamic track
    d_age: jax.Array
    d_cooldown: jax.Array
    # object table (O,)
    obj_labels: jax.Array  # global instance label per slot (-1 = free)
    obj_active: jax.Array  # label seen in current frame

    @staticmethod
    def create(ns: int, nd: int, no: int, dtype=jnp.float32) -> "TrackerState":
        return TrackerState(
            s_uv=jnp.zeros((ns, 2), dtype),
            s_active=jnp.zeros((ns,), bool),
            s_age=jnp.zeros((ns,), jnp.int32),
            s_cooldown=jnp.zeros((ns,), jnp.int32),
            s_desc=jnp.zeros((ns, 256), jnp.int8),
            d_uv=jnp.zeros((nd, 2), dtype),
            d_active=jnp.zeros((nd,), bool),
            d_obj=jnp.full((nd,), INVALID_ID, jnp.int32),
            d_age=jnp.zeros((nd,), jnp.int32),
            d_cooldown=jnp.zeros((nd,), jnp.int32),
            obj_labels=jnp.full((no,), INVALID_ID, jnp.int32),
            obj_active=jnp.zeros((no,), bool),
        )


def assign_slots(free: jax.Array, want: jax.Array):
    """Pair the first n wanted candidates with the first n free slots.

    free: (M,) bool over slots; want: (C,) bool over candidates (already in
    priority order).  Returns (slot_idx (K,), cand_idx (K,), pair_ok (K,))
    with K = min(M, C) static.
    """
    m, c = free.shape[0], want.shape[0]
    k = min(m, c)
    slot_order = jnp.argsort(~free, stable=True)
    cand_order = jnp.argsort(~want, stable=True)
    n = jnp.minimum(jnp.sum(free), jnp.sum(want))
    ok = jnp.arange(k) < n
    return slot_order[:k], cand_order[:k], ok


class PerObjectStatus(NamedTuple):
    """(O,)-shaped per-object-slot tracking counters — the analog of
    `FeatureTrackerInfo::PerObjectStatus`
    (`frontend/vision/Vision-Definitions.hpp:62-94`).  Slot j's counters
    belong to instance label `TrackerState.obj_labels[j]` (-1 = unused)."""

    num_previous_track: jax.Array            # alive at k-1
    num_track: jax.Array                     # propagated into k
    num_sampled: jax.Array                   # newly grid-sampled at k
    num_outside_shrunken_image: jax.Array    # left the shrunken bounds
    num_zero_flow: jax.Array                 # |flow| below threshold
    num_tracked_with_different_label: jax.Array
    num_tracked_with_background_label: jax.Array

    @staticmethod
    def zeros(no: int) -> "PerObjectStatus":
        z = jnp.zeros((no,), jnp.int32)
        return PerObjectStatus(z, z, z, z, z, z, z)


class TrackOutputs(NamedTuple):
    """Per-frame tracking report (analog of `FeatureTrackerInfo`,
    `frontend/vision/Vision-Definitions.hpp:62-94`)."""

    n_static_tracked: jax.Array
    n_static_new: jax.Array
    n_dynamic_tracked: jax.Array
    n_dynamic_new: jax.Array
    homography_inliers: jax.Array
    # tracklets revived by descriptor re-association (orb_reassociate)
    n_reassociated: jax.Array = 0
    per_object: PerObjectStatus | None = None


@functools.partial(jax.jit, static_argnames=("cfg", "use_klt", "first_frame"))
def track_frame(
    state: TrackerState,
    prev_gray: jax.Array,
    cur_gray: jax.Array,
    flow_prev: jax.Array,     # (H, W, 2): maps pixels of frame k-1 into k
    mask_cur: jax.Array,      # (H, W) int32 instance labels of frame k
    cfg: TrackerConfig,
    use_klt: bool = True,
    first_frame: bool = False,
    key: jax.Array | None = None,
    mask_prev: jax.Array | None = None,
):
    """One tracking step: (state at k-1, images) -> (state at k, report).

    The returned state's `s_uv/d_uv` are positions in frame k; `*_age > 0`
    marks tracks that were propagated (exist at both k-1 and k), age == 0
    marks fresh detections.
    """
    h, w = cur_gray.shape
    dtype = cur_gray.dtype

    if cfg.use_propogate_mask and not first_frame and mask_prev is not None:
        from .mask_ops import propagate_mask

        mask_cur = propagate_mask(mask_prev, flow_prev, mask_cur)

    # ------------------------------------------------------------ static
    ns_pool = state.s_uv.shape[0]
    fl_d = None          # dynamic-pool flow, consumed by the dynamic block
    cur_label_d = None   # dynamic-pool mask labels at propagated positions
    if first_frame:
        s_uv, s_ok = state.s_uv, jnp.zeros_like(state.s_active)
        homo_inl = jnp.asarray(0, jnp.int32)
    else:
        # merged dense-flow sample for BOTH pools: each Pallas point call
        # pays a fixed image-fetch cost on TPU (BENCH_NOTES session 5), so
        # the static warm-start and the dynamic propagation share one call
        need_s_flow = cfg.klt_flow_warm_start or not use_klt
        if need_s_flow:
            fl_both = flow_at(
                flow_prev,
                jnp.concatenate([state.s_uv, state.d_uv], axis=0),
                jnp.concatenate([state.s_active, state.d_active], axis=0),
            )
            fl_s, fl_d = fl_both[:ns_pool], fl_both[ns_pool:]
        else:
            fl_s = None
            fl_d = flow_at(flow_prev, state.d_uv, state.d_active)
        if use_klt:
            # dense-flow warm start: LK only polishes sub-pixel error, so
            # the pyramid/iteration budget shrinks (see TrackerConfig)
            if cfg.klt_flow_warm_start:
                g0 = fl_s
                levels, iters = cfg.klt_warm_levels, cfg.klt_warm_iterations
            else:
                g0 = None
                levels, iters = cfg.klt_levels, cfg.klt_iterations
            # Pallas patch kernel on TPU (XLA per-element gathers serialize
            # there: 3.9 s/frame -> ms; see ops/pallas/lk.py); the XLA
            # formulation elsewhere (CPU tests, interpret-less platforms)
            if cfg.use_pallas_klt and jax.default_backend() == "tpu":
                from ..ops.pallas.lk import klt_track_pallas

                res = klt_track_pallas(
                    prev_gray,
                    cur_gray,
                    state.s_uv,
                    state.s_active,
                    win=cfg.klt_window,
                    levels=levels,
                    iters=iters,
                    eps=cfg.klt_eps,
                    g0=g0,
                )
            else:
                res = klt_track(
                    prev_gray,
                    cur_gray,
                    state.s_uv,
                    state.s_active,
                    win=cfg.klt_window,
                    levels=levels,
                    iters=iters,
                    g0=g0,
                )
            s_uv, s_ok = res.uv, res.ok
        else:
            s_uv = state.s_uv + fl_s
            s_ok = state.s_active
        inb = (
            (s_uv[:, 0] >= cfg.shrink_col)
            & (s_uv[:, 0] < w - cfg.shrink_col)
            & (s_uv[:, 1] >= cfg.shrink_row)
            & (s_uv[:, 1] < h - cfg.shrink_row)
        )
        # merged mask-label sample: static pool at tracked positions +
        # dynamic pool at flow-propagated positions, one point call
        labels_both = nearest_at(
            mask_cur,
            jnp.concatenate([s_uv, state.d_uv + fl_d], axis=0),
            jnp.concatenate([state.s_active, state.d_active], axis=0),
        )
        on_bg = labels_both[:ns_pool] == 0
        cur_label_d = labels_both[ns_pool:]
        s_ok = s_ok & inb & on_bg & state.s_active
        # geometric verification (findHomography RANSAC analog)
        hkey = key if key is not None else jax.random.PRNGKey(0)
        hres = homography.ransac_homography(
            hkey, state.s_uv, s_uv, s_ok,
            iters=128, threshold=3.0,
        )
        enough = hres.n_inliers >= 10
        s_ok = jnp.where(enough, s_ok & hres.inliers, s_ok)
        homo_inl = hres.n_inliers

    s_age = jnp.where(s_ok, state.s_age + 1, 0)
    recycle = s_age > cfg.max_feature_track_age
    s_ok = s_ok & ~recycle
    n_tracked = jnp.sum(s_ok)
    # slot-reuse cooldown: a just-died slot keeps its identity blocked for
    # `slot_cooldown_frames` so windowed backend graphs never alias two
    # physical points into one landmark variable
    s_died = state.s_active & ~s_ok
    s_cooldown = jnp.maximum(state.s_cooldown - 1, 0)
    s_cooldown = jnp.where(s_died, cfg.slot_cooldown_frames, s_cooldown)

    # re-detect into free slots (detector input optionally CLAHE-equalized,
    # `FeatureDetector.cc:95-109`; tracking always uses the raw image)
    def _det_inputs():
        if cfg.use_clahe_filter:
            from ..ops.clahe import clahe

            det_gray = clahe(cur_gray, n_bins=cfg.clahe_bins)
        else:
            det_gray = cur_gray
        occupied = occupancy_mask(
            (h, w), s_uv, s_ok,
            int(cfg.min_distance_btw_tracked_and_detected_features),
        )
        forbid = (
            occupied
            | (mask_cur != 0)
            | border_mask(
                (h, w), max(cfg.shrink_row, 4), max(cfg.shrink_col, 4)
            )
        )
        return det_gray, forbid

    s_desc = state.s_desc
    n_reassoc = jnp.asarray(0, jnp.int32)
    cand_desc = None
    if cfg.feature_detector_type == "orb":
        det_gray, forbid = _det_inputs()
        # pyramid FAST + octree-analog distribution (`frontend/orb.py`,
        # reference mode ORB_SLAM_ORB, `FeatureDetector.cc:55-83`); the
        # forbid mask is applied by sampling at the candidate positions
        from .detect import Detections
        from .orb import extract_orb, match_descriptors

        feats = extract_orb(
            det_gray,
            n_features=cfg.max_nr_keypoints_before_anms,
            n_levels=cfg.orb_n_levels,
            scale_factor=cfg.orb_scale_factor,
            init_threshold=float(cfg.orb_init_threshold_fast),
            min_threshold=float(cfg.orb_min_threshold_fast),
        )
        order = jnp.argsort(jnp.where(feats.valid, -feats.response, jnp.inf))
        m_cap = cfg.max_features_per_frame
        cand_uv = feats.uv[order][:m_cap]
        cand_score = feats.response[order][:m_cap]
        cand_valid = feats.valid[order][:m_cap]
        cand_desc = feats.desc[order][:m_cap]

        revive_mask = jnp.zeros_like(cand_valid)
        if cfg.orb_reassociate and not first_frame:
            # revive recently lost tracklets whose stored descriptor
            # mutually best-matches a new detection near the last position
            # (descriptor path of ExternalFlowFeatureTracker, made
            # functional; `StaticFeatureTracker.cc:81-83`).  Matched BEFORE
            # the occupancy/forbid filter: revival re-attaches an existing
            # id, so the keep-away spacing rule for NEW detections does
            # not apply.
            eligible = ~s_ok & (s_cooldown > 0)
            mm = match_descriptors(
                cand_desc, cand_valid, s_desc, eligible,
                max_hamming=cfg.orb_reassoc_max_hamming,
                ratio=0.9, cross_check=True,
            )
            slot = mm.index
            # gate against the STORED last position (the KLT-propagated
            # s_uv is meaningless for slots that were not active)
            d2 = jnp.linalg.norm(cand_uv - state.s_uv[slot], axis=-1)
            revive = mm.ok & (d2 <= cfg.orb_reassoc_radius_px)
            # Scatter per-slot.  NOTE: every candidate carries SOME best
            # slot index (unmatched rows default to an arbitrary argmin),
            # so a plain .at[slot].set would race no-op writes against the
            # real revival (duplicate-index scatter order is undefined).
            # Use OR/add semantics gated on `revive` instead; cross_check
            # guarantees at most one revive=True row per slot, so the adds
            # never mix two candidates.
            ns = s_ok.shape[0]
            rev_slot = jnp.zeros((ns,), bool).at[slot].max(revive)
            uv_new = jnp.zeros_like(s_uv).at[slot].add(
                jnp.where(revive[:, None], cand_uv, 0.0)
            )
            desc_new = jnp.zeros_like(s_desc).at[slot].add(
                jnp.where(revive[:, None], cand_desc, 0).astype(s_desc.dtype)
            )
            s_uv = jnp.where(rev_slot[:, None], uv_new, s_uv)
            s_ok = s_ok | rev_slot
            s_age = jnp.where(rev_slot, state.s_age + 1, s_age)
            s_cooldown = jnp.where(rev_slot, 0, s_cooldown)
            s_desc = jnp.where(rev_slot[:, None], desc_new, s_desc)
            revive_mask = revive
            n_reassoc = jnp.sum(revive)
            n_tracked = n_tracked + n_reassoc

        allowed = nearest_at((~forbid).astype(jnp.int32), cand_uv) > 0
        dets = Detections(
            uv=cand_uv, score=cand_score,
            valid=cand_valid & allowed & ~revive_mask,
        )
        budget = cfg.max_features_per_frame - n_tracked
        want = dets.valid & (jnp.cumsum(dets.valid) <= budget)
        slot_i, cand_i, pair_ok = assign_slots(
            ~s_ok & (s_cooldown == 0), want
        )
        new_uv = dets.uv[cand_i]
        s_uv = s_uv.at[slot_i].set(
            jnp.where(pair_ok[:, None], new_uv, s_uv[slot_i])
        )
        s_active_new = s_ok.at[slot_i].set(s_ok[slot_i] | pair_ok)
        s_age = s_age.at[slot_i].set(jnp.where(pair_ok, 0, s_age[slot_i]))
        n_new_static = jnp.sum(pair_ok)
        s_desc = s_desc.at[slot_i].set(
            jnp.where(pair_ok[:, None], cand_desc[cand_i], s_desc[slot_i])
        )
    else:
        def run_detection(_):
            det_gray, forbid = _det_inputs()
            if cfg.feature_detector_type == "harris":
                from .detect import harris_response

                resp = harris_response(det_gray)
            elif cfg.feature_detector_type == "fast":
                from .detect import fast_response

                resp = fast_response(
                    det_gray, float(cfg.orb_init_threshold_fast)
                )
            else:
                resp = shi_tomasi_response_fast(det_gray)
            dets = detect_grid_nms(
                resp,
                forbid,
                max_corners=cfg.max_features_per_frame,
                cell_size=max(8, cfg.cell_size // 2),
            )
            budget = cfg.max_features_per_frame - n_tracked
            want = dets.valid & (jnp.cumsum(dets.valid) <= budget)
            slot_i, cand_i, pair_ok = assign_slots(
                ~s_ok & (s_cooldown == 0), want
            )
            new_uv = dets.uv[cand_i]
            s_uv_n = s_uv.at[slot_i].set(
                jnp.where(pair_ok[:, None], new_uv, s_uv[slot_i])
            )
            s_act_n = s_ok.at[slot_i].set(s_ok[slot_i] | pair_ok)
            s_age_n = s_age.at[slot_i].set(
                jnp.where(pair_ok, 0, s_age[slot_i])
            )
            return s_uv_n, s_act_n, s_age_n, jnp.sum(pair_ok)

        def skip_detection(_):
            return s_uv, s_ok, s_age, jnp.asarray(0, jnp.int32)

        frac = cfg.redetect_min_free_fraction
        if frac > 0.0 and not first_frame:
            # detection-on-demand: run the whole detect stage only when
            # the pool has drained below (1 - frac) of the target (the
            # reference tops up on ANY deficit; frac bounds the deviation)
            floor_n = int(round((1.0 - frac) * cfg.max_features_per_frame))
            s_uv, s_active_new, s_age, n_new_static = jax.lax.cond(
                n_tracked < floor_n, run_detection, skip_detection, 0
            )
        else:
            s_uv, s_active_new, s_age, n_new_static = run_detection(0)

    # ------------------------------------------------------------ objects
    # label census of the current mask (labels capped to the config limit)
    label_cap = cfg.max_instance_labels
    from .mask_ops import label_counts

    counts = label_counts(mask_cur, label_cap)
    counts = counts.at[0].set(0)  # background
    present = counts >= cfg.min_object_pixels
    # match present labels to existing table
    table = state.obj_labels                              # (O,)
    label_ids = jnp.arange(label_cap, dtype=jnp.int32)
    in_table = jnp.any(table[None, :] == label_ids[:, None], axis=1)
    new_label = present & ~in_table
    slot_free = table == INVALID_ID
    slot_i2, cand_i2, ok2 = assign_slots(slot_free, new_label)
    table = table.at[slot_i2].set(
        jnp.where(ok2, label_ids[cand_i2], table[slot_i2])
    )
    obj_active = jnp.where(
        table >= 0, present[jnp.clip(table, 0, label_cap - 1)], False
    )

    # ------------------------------------------------------------ dynamic
    no_ = state.obj_labels.shape[0]
    # per-object-slot one-hot of each dynamic track (0 where unassigned):
    # the PerObjectStatus counters are one-hot sums, not scatters
    d_oh = (
        jax.nn.one_hot(
            jnp.clip(state.d_obj, 0, no_ - 1), no_, dtype=jnp.int32
        )
        * (state.d_obj >= 0)[:, None]
    )

    def _cnt(cond):
        return jnp.sum(d_oh * cond[:, None].astype(jnp.int32), axis=0)

    if first_frame:
        d_uv, d_ok = state.d_uv, jnp.zeros_like(state.d_active)
        n_outside = n_zero_flow = n_diff_label = n_bg_label = jnp.zeros(
            (no_,), jnp.int32
        )
    else:
        fl = fl_d                   # merged sample (static section above)
        d_uv = state.d_uv + fl
        inb_d = (
            (d_uv[:, 0] >= cfg.shrink_col)
            & (d_uv[:, 0] < w - cfg.shrink_col)
            & (d_uv[:, 1] >= cfg.shrink_row)
            & (d_uv[:, 1] < h - cfg.shrink_row)
        )
        cur_label_at = cur_label_d  # merged sample (static section above)
        my_label = jnp.where(
            state.d_obj >= 0, table[jnp.clip(state.d_obj, 0, table.shape[0] - 1)], -2
        )
        same = cur_label_at == my_label
        d_ok = state.d_active & inb_d & same
        # per-object failure taxonomy (PerObjectStatus,
        # Vision-Definitions.hpp:62-94)
        n_outside = _cnt(state.d_active & ~inb_d)
        n_zero_flow = _cnt(
            state.d_active & (jnp.sum(fl * fl, axis=-1) < 1e-8)
        )
        n_diff_label = _cnt(
            state.d_active & inb_d & (cur_label_at > 0) & ~same
        )
        n_bg_label = _cnt(state.d_active & inb_d & (cur_label_at == 0))
    if not cfg.use_dynamic_track:
        # reference --use_dynamic_track=false: no long dynamic tracklets;
        # keep only the 2-frame flow correspondence then retire the slot
        d_ok = d_ok & (state.d_age < 1)
    d_age = jnp.where(d_ok, state.d_age + 1, 0)
    over_age = d_age > cfg.max_feature_track_age
    d_ok = d_ok & ~over_age
    n_dyn_tracked = jnp.sum(d_ok)
    d_died = state.d_active & ~d_ok
    d_cooldown = jnp.maximum(state.d_cooldown - 1, 0)
    d_cooldown = jnp.where(d_died, cfg.slot_cooldown_frames, d_cooldown)

    # dense grid sampling of uncovered object pixels.  The candidates ARE a
    # regular integer grid, so their mask/occupancy "samples" are static
    # strided slices — never point lookups (a 30k-query point-sample kernel
    # cost ~5 ms/frame on TPU for what is a free re-indexing)
    step = cfg.semantic_mask_step_size
    gy = jnp.arange(step // 2, h, step)
    gx = jnp.arange(step // 2, w, step)
    gyy, gxx = jnp.meshgrid(gy, gx, indexing="ij")
    cand_uv = jnp.stack(
        [gxx.reshape(-1), gyy.reshape(-1)], axis=-1
    ).astype(dtype)                                        # (C, 2)
    # (strided slices of (H, W) images lower to serialized lane-shuffle
    # gathers on TPU — both subsamples run as MXU selection matmuls)
    cand_label = grid_subsample_i32(mask_cur, step, step // 2).reshape(-1)
    cand_free = ~occupancy_at_grid(
        (h, w), d_uv, d_ok, step // 2, step, step // 2
    ).reshape(-1)
    # object slot for each candidate label
    eq = cand_label[:, None] == table[None, :]             # (C, O)
    cand_slot = jnp.argmax(eq, axis=1).astype(jnp.int32)
    cand_has_obj = jnp.any(eq, axis=1) & (cand_label > 0)
    cand_want = cand_has_obj & cand_free
    slot_i3, cand_i3, ok3 = assign_slots(~d_ok & (d_cooldown == 0), cand_want)
    d_uv = d_uv.at[slot_i3].set(
        jnp.where(ok3[:, None], cand_uv[cand_i3], d_uv[slot_i3])
    )
    d_obj = state.d_obj.at[slot_i3].set(
        jnp.where(ok3, cand_slot[cand_i3], state.d_obj[slot_i3])
    )
    d_active_new = d_ok.at[slot_i3].set(d_ok[slot_i3] | ok3)
    d_age = d_age.at[slot_i3].set(jnp.where(ok3, 0, d_age[slot_i3]))
    n_dyn_new = jnp.sum(ok3)

    new_state = TrackerState(
        s_uv=s_uv,
        s_active=s_active_new,
        s_age=s_age,
        s_cooldown=s_cooldown,
        s_desc=s_desc,
        d_uv=d_uv,
        d_active=d_active_new,
        d_obj=d_obj,
        d_age=d_age,
        d_cooldown=d_cooldown,
        obj_labels=table,
        obj_active=obj_active,
    )
    # per-object sampled counts (new grid candidates that got slots)
    n_sampled = jnp.sum(
        jax.nn.one_hot(cand_slot[cand_i3], no_, dtype=jnp.int32)
        * ok3[:, None].astype(jnp.int32),
        axis=0,
    )
    d_oh_new = (
        jax.nn.one_hot(jnp.clip(d_obj, 0, no_ - 1), no_, dtype=jnp.int32)
        * (d_obj >= 0)[:, None]
    )
    per_object = PerObjectStatus(
        num_previous_track=_cnt(state.d_active),
        num_track=jnp.sum(
            d_oh * d_ok[:, None].astype(jnp.int32), axis=0
        ),
        num_sampled=n_sampled,
        num_outside_shrunken_image=n_outside,
        num_zero_flow=n_zero_flow,
        num_tracked_with_different_label=n_diff_label,
        num_tracked_with_background_label=n_bg_label,
    )
    report = TrackOutputs(
        n_static_tracked=n_tracked,
        n_static_new=n_new_static,
        n_dynamic_tracked=n_dyn_tracked,
        n_dynamic_new=n_dyn_new,
        homography_inliers=homo_inl,
        n_reassociated=n_reassoc,
        per_object=per_object,
    )
    return new_state, report


def format_tracker_report(
    report: TrackOutputs, obj_labels=None
) -> str:
    """Human-readable per-frame report (`FeatureTrackerInfo` print analog,
    `RGBDInstanceFrontendModule.cc:119`), including the per-object status
    block when available (pass `TrackerState.obj_labels` for real labels)."""
    import numpy as np

    lines = [
        f"static: tracked {int(np.asarray(report.n_static_tracked))} "
        f"(+{int(np.asarray(report.n_static_new))} new, "
        f"homography inliers {int(np.asarray(report.homography_inliers))}) | "
        f"dynamic: tracked {int(np.asarray(report.n_dynamic_tracked))} "
        f"(+{int(np.asarray(report.n_dynamic_new))} sampled)"
    ]
    po = report.per_object
    if po is not None:
        prev = np.asarray(po.num_previous_track)
        labels = (
            np.asarray(obj_labels)
            if obj_labels is not None
            else np.arange(prev.shape[0])
        )
        for j in range(prev.shape[0]):
            interesting = prev[j] or int(np.asarray(po.num_sampled)[j])
            if labels[j] < 0 or not interesting:
                continue
            lines.append(
                f"  obj {int(labels[j])}: prev "
                f"{int(prev[j])} -> tracked "
                f"{int(np.asarray(po.num_track)[j])} "
                f"(+{int(np.asarray(po.num_sampled)[j])} sampled; "
                f"outside {int(np.asarray(po.num_outside_shrunken_image)[j])}, "
                f"zero-flow {int(np.asarray(po.num_zero_flow)[j])}, "
                f"diff-label "
                f"{int(np.asarray(po.num_tracked_with_different_label)[j])}, "
                f"bg-label "
                f"{int(np.asarray(po.num_tracked_with_background_label)[j])})"
            )
    return "\n".join(lines)
