"""Fused-segment throughput pipeline: frontend + sliding-window backend as
ONE jitted XLA program.

The online `DynoPipeline` (pipeline.py) dispatches one frontend program per
frame plus one window solve per trigger — the right design when frames arrive one
at a time, but every dispatch pays host/tunnel latency.  For offline replay and
for the whole-pipeline benchmark the entire run fuses into a single program:

  warmup:  frame 0 (the `first_frame=True` trace) + a scan over frames
           1..V-1 (V = window overlap), filling the measurement map;
  steady:  an outer `lax.scan` over trigger segments.  Each segment scans
           ``stride = W - V`` frontend steps (scattering every packet into
           the measurement map at its traced frame index) and then solves
           the just-completed window [s*stride, s*stride + W) with the
           direct-Schur LM, writing estimates back into the store with
           dynamic-slice updates — so ONE traced segment body serves every
           trigger in the sequence.

Reference observable being matched: the whole-pipeline spin rate
(`pipeline_spin` timer, `src/pipeline/PipelineManager.cc:162`).  Where the
reference overlaps frontend/backend with thread-backed queues
(`pipeline/ThreadSafeQueue.hpp`), here the segment program IS the pipeline:
XLA schedules the frontend scan and the window solve of each segment, and
the host can dispatch segment s+1 while s still executes (async dispatch).

Window/trigger arithmetic matches `SlidingWindowTrigger`
(`backend/RGBDBackendModule.hpp:120-144`): first trigger when frame W-1
arrives, then every ``stride`` frames.  The sequence length must satisfy
``K = V + S * stride`` for an integer number of segments S (the benchmark
picks K accordingly; arbitrary-length tails belong to the online pipeline).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .backend.backend import optimize_window
from .backend.map import MeasurementMap, update_map
from .core.camera import CameraParams
from .core.lie import SE3, se3_identity
from .frontend.frontend import FrameImages, FrontendState, frontend_step
from .utils.config import DynoConfig


class EstStore(NamedTuple):
    """Pytree twin of `backend.EstimateStore` (dataclass, not a pytree) for
    use inside traced code."""

    X: SE3
    P: SE3                    # H (updater 0) or L (updater 1)
    static_points: jax.Array
    static_valid: jax.Array
    dyn_points: jax.Array
    dyn_valid: jax.Array
    X_valid: jax.Array
    motion_valid: jax.Array

    @staticmethod
    def create(f: int, ns: int, nd: int, no: int, dtype=jnp.float32):
        return EstStore(
            X=se3_identity((f,), dtype),
            P=se3_identity((f, no), dtype),
            static_points=jnp.zeros((ns, 3), dtype),
            static_valid=jnp.zeros((ns,), bool),
            dyn_points=jnp.zeros((f, nd, 3), dtype),
            dyn_valid=jnp.zeros((f, nd), bool),
            X_valid=jnp.zeros((f,), bool),
            motion_valid=jnp.zeros((f, no), bool),
        )


def _dsl(a, start, n):
    return jax.lax.dynamic_slice_in_dim(a, start, n, axis=0)


def _dus(full, win, start):
    return jax.lax.dynamic_update_slice_in_dim(full, win, start, axis=0)


def _window_inputs(est: EstStore, start, window: int, pose_key: str):
    """Warm-start values/masks for the window at `start` (pure reads)."""
    use_anchor = est.X_valid[start]
    anchor = SE3(est.X.R[start], est.X.t[start])
    prev = {
        "X": SE3(_dsl(est.X.R, start, window), _dsl(est.X.t, start, window)),
        pose_key: SE3(
            _dsl(est.P.R, start, window), _dsl(est.P.t, start, window)
        ),
        "sp": est.static_points,
        "dp": _dsl(est.dyn_points, start, window),
    }
    prev_mask = {
        "X": _dsl(est.X_valid, start, window) & use_anchor,
        pose_key: _dsl(est.motion_valid, start, window) & use_anchor,
        "sp": est.static_valid & use_anchor,
        "dp": _dsl(est.dyn_valid, start, window) & use_anchor,
    }
    return anchor, use_anchor, prev, prev_mask


def _writeback(est: EstStore, values, masks, start, pose_key: str):
    """Mirror of `RGBDBackend._write_back` at a dynamic start."""
    X = values["X"]
    P = values[pose_key]
    est = est._replace(
        X=SE3(_dus(est.X.R, X.R, start), _dus(est.X.t, X.t, start)),
        X_valid=_dus(est.X_valid, masks.frame, start),
        P=SE3(_dus(est.P.R, P.R, start), _dus(est.P.t, P.t, start)),
        motion_valid=_dus(est.motion_valid, masks.motion_active, start),
        dyn_points=_dus(est.dyn_points, values["dp"], start),
        dyn_valid=_dus(est.dyn_valid, masks.dyn_obs, start),
    )
    new_static_valid = jnp.any(masks.static_obs, axis=0)
    return est._replace(
        static_points=jnp.where(
            new_static_valid[:, None], values["sp"], est.static_points
        ),
        static_valid=est.static_valid | new_static_valid,
    )


def _solve_window(est: EstStore, m: MeasurementMap, start, window: int,
                  cfg, lm_cfg, pose_key: str, updater: int):
    """Traced mirror of `RGBDBackend._optimize` + `_write_back` with a
    DYNAMIC window start (one program for every trigger)."""
    anchor, use_anchor, prev, prev_mask = _window_inputs(
        est, start, window, pose_key
    )
    result, masks = optimize_window(
        m, start, window, cfg.backend, lm_cfg, anchor, use_anchor,
        updater, prev, prev_mask,
    )
    est = _writeback(est, result.values, masks, start, pose_key)
    return est, result


def _solve_windows_batched(est: EstStore, m: MeasurementMap, first_start,
                           wpd: int, stride: int, window: int,
                           cfg, lm_cfg, pose_key: str, updater: int):
    """Solve `wpd` consecutive pending windows in ONE vmapped LM program.

    The window solve is op-latency bound on TPU (BENCH_NOTES), so vmapping
    the whole LM over pending windows amortizes it nearly wpd-fold.  All
    windows warm-start from the state BEFORE any of them solved (the later
    windows' overlap frames are one writeback staler than in sequential
    mode); writebacks apply in order so overlap frames keep the LATER
    window's estimate, matching the sequential stitching."""
    starts = first_start + jnp.arange(wpd, dtype=jnp.int32) * stride

    def solve_one(start):
        anchor, use_anchor, prev, prev_mask = _window_inputs(
            est, start, window, pose_key
        )
        return optimize_window(
            m, start, window, cfg.backend, lm_cfg, anchor, use_anchor,
            updater, prev, prev_mask,
        )

    results, masks = jax.vmap(solve_one)(starts)
    for i in range(wpd):
        est = _writeback(
            est,
            jax.tree.map(lambda a: a[i], results.values),
            jax.tree.map(lambda a: a[i], masks),
            starts[i], pose_key,
        )
    last = jax.tree.map(lambda a: a[-1], results)
    return est, last


class SegmentPlan(NamedTuple):
    """Static trigger arithmetic for a fixed sequence length."""

    window: int
    overlap: int
    stride: int
    n_segments: int
    n_frames: int


def _plan(cfg: DynoConfig, n_frames: int) -> SegmentPlan:
    bcfg = cfg.backend
    assert not bcfg.use_full_batch_opt, (
        "fused segments implement the sliding-window mode; use "
        "run_from_packets for full-batch"
    )
    W = bcfg.opt_window_size
    V = bcfg.opt_window_overlap
    stride = W - V
    K = n_frames
    assert K >= W and (K - V) % stride == 0, (
        f"sequence length {K} must equal overlap {V} + n_segments * "
        f"stride {stride}"
    )
    return SegmentPlan(W, V, stride, (K - V) // stride, K)


def _lm_cfg(bcfg):
    from .backend.solver import LMConfig

    return LMConfig(
        max_iterations=bcfg.lm_max_iterations,
        initial_lambda=bcfg.lm_initial_lambda,
        lambda_factor=bcfg.lm_lambda_factor,
        max_lambda=bcfg.lm_max_lambda,
        min_lambda=bcfg.lm_min_lambda,
        rel_error_tol=bcfg.lm_rel_error_tol,
        abs_error_tol=bcfg.lm_abs_error_tol,
        cg_max_iterations=bcfg.cg_max_iterations,
        cg_tol=bcfg.cg_tol,
    )


def _make_fe_scan(cam: CameraParams, cfg: DynoConfig, use_klt: bool):
    def fe_scan(fe_state, m, frames, keys, k0, n):
        """Scan `n` frontend steps over frames[1:], pairing each with its
        predecessor; scatter every packet into the map at k0 + i."""
        prev = jax.tree.map(lambda a: a[:-1], frames)
        cur = jax.tree.map(lambda a: a[1:], frames)

        def step(carry, inp):
            st, m = carry
            pf, cf, key, k = inp
            st, pkt, _, _ = frontend_step(
                st, pf, cf, cam, cfg.frontend, key,
                use_klt=use_klt, first_frame=False,
            )
            m = update_map(m, pkt, k)
            return (st, m), pkt

        ks = k0 + jnp.arange(n, dtype=jnp.int32)
        (fe_state, m), pkts = jax.lax.scan(
            step, (fe_state, m), (prev, cur, keys, ks)
        )
        return fe_state, m, pkts

    return fe_scan


def make_offline_runner(cam: CameraParams, cfg: DynoConfig, n_frames: int,
                        use_klt: bool = True):
    """Build the jitted offline runner for a fixed sequence length.

    Returns ``run(fe_state, m, est, stacked_frames, keys) ->
    (fe_state, m, est, packets, last_result)`` — one XLA program for the
    whole sequence.  `stacked_frames` is a (K, ...) FrameImages pytree and
    `keys` a (K,) PRNG key array.
    """
    plan = _plan(cfg, n_frames)
    W, V, stride, n_segments = (
        plan.window, plan.overlap, plan.stride, plan.n_segments
    )
    bcfg = cfg.backend
    updater = bcfg.backend_updater_enum
    pose_key = "H" if updater == 0 else "L"
    lm_cfg = _lm_cfg(bcfg)
    wpd = max(1, int(bcfg.opt_windows_per_dispatch))
    if n_segments % wpd != 0:
        wpd = 1                      # fall back to strictly sequential

    fe_scan = _make_fe_scan(cam, cfg, use_klt)

    @jax.jit
    def run(fe_state: FrontendState, m: MeasurementMap, est: EstStore,
            stacked: FrameImages, keys: jax.Array):
        # ---- warmup: frame 0 + frames 1..V-1 (before the first trigger
        # segment, which covers frames V..W-1)
        f0 = jax.tree.map(lambda a: a[0], stacked)
        fe_state, pkt0, _, _ = frontend_step(
            fe_state, f0, f0, cam, cfg.frontend, keys[0],
            use_klt=use_klt, first_frame=True,
        )
        m = update_map(m, pkt0, 0)
        warm_frames = jax.tree.map(lambda a: a[:V], stacked)
        fe_state, m, warm_pkts = fe_scan(
            fe_state, m, warm_frames, keys[1:V], jnp.asarray(1, jnp.int32),
            V - 1,
        )

        # ---- steady segments: stride frontend steps + one window solve
        # (wpd > 1: wpd*stride frontend steps + wpd vmapped window solves)
        def segment(carry, s):
            fe_state, m, est = carry
            seg_first = V + s * stride          # first frame this segment
            frames = jax.tree.map(
                lambda a: _dsl(a, seg_first - 1, stride + 1), stacked
            )
            seg_keys = _dsl(keys, seg_first, stride)
            fe_state, m, pkts = fe_scan(
                fe_state, m, frames, seg_keys, seg_first, stride
            )
            est, result = _solve_window(
                est, m, s * stride, W, cfg, lm_cfg, pose_key, updater
            )
            return (fe_state, m, est), (pkts, result)

        def group(carry, g):
            fe_state, m, est = carry
            seg_first = V + g * (wpd * stride)
            frames = jax.tree.map(
                lambda a: _dsl(a, seg_first - 1, wpd * stride + 1), stacked
            )
            seg_keys = _dsl(keys, seg_first, wpd * stride)
            fe_state, m, pkts = fe_scan(
                fe_state, m, frames, seg_keys, seg_first, wpd * stride
            )
            est, result = _solve_windows_batched(
                est, m, g * (wpd * stride), wpd, stride, W, cfg, lm_cfg,
                pose_key, updater,
            )
            return (fe_state, m, est), (pkts, result)

        if wpd > 1:
            (fe_state, m, est), (seg_pkts, results) = jax.lax.scan(
                group, (fe_state, m, est),
                jnp.arange(n_segments // wpd, dtype=jnp.int32),
            )
        else:
            (fe_state, m, est), (seg_pkts, results) = jax.lax.scan(
                segment, (fe_state, m, est),
                jnp.arange(n_segments, dtype=jnp.int32),
            )
        # (S, stride, ...) -> (S*stride, ...); prepend warmup packets
        flat = jax.tree.map(
            lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:]),
            seg_pkts,
        )
        packets = jax.tree.map(
            lambda w0, wr, fl: jnp.concatenate(
                [w0[None], wr, fl], axis=0
            ),
            pkt0, warm_pkts, flat,
        )
        last_result = jax.tree.map(lambda a: a[-1], results)
        return fe_state, m, est, packets, last_result

    return run


def online_keys(n: int) -> jax.Array:
    """(n,) stack of the per-frame PRNG keys the online pipeline uses
    (`pipeline.py` feeds `PRNGKey(k)` to frame k) — the default key stream
    so offline replay is bit-compatible with the online path."""
    return jax.vmap(jax.random.PRNGKey)(jnp.arange(n, dtype=jnp.uint32))


def run_offline(frames, cam: CameraParams, cfg: DynoConfig,
                use_klt: bool = True, keys: jax.Array | None = None):
    """Offline throughput entry: list/stack of FrameImages -> (packets,
    EstStore, last LM result).  The whole pipeline is one XLA program."""
    if isinstance(frames, list):
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    else:
        stacked = frames
    K = stacked.gray.shape[0]
    cap = cfg.capacity
    runner = make_offline_runner(cam, cfg, K, use_klt=use_klt)
    fe_state = FrontendState.create(
        cap.max_static_tracks, cap.max_dynamic_tracks, cap.max_objects
    )
    m = MeasurementMap.create(
        max(K, cap.max_frames), cap.max_static_tracks,
        cap.max_dynamic_tracks, cap.max_objects,
    )
    est = EstStore.create(
        max(K, cap.max_frames), cap.max_static_tracks,
        cap.max_dynamic_tracks, cap.max_objects,
    )
    if keys is None:
        keys = online_keys(K)
    fe_state, m, est, packets, last = runner(fe_state, m, est, stacked, keys)
    return packets, est, last


def make_streaming_runner(cam: CameraParams, cfg: DynoConfig, n_frames: int,
                          use_klt: bool = True):
    """Per-segment dispatch variant for HOST-STREAMED frames (native PNG
    decode + prefetch pool feeding the device while it computes).

    Returns ``(warmup, segment, plan)``:
      * ``warmup(fe_state, m, frames_V, keys_V) -> (fe_state, m)`` — frame 0
        (first_frame trace) + frames 1..V-1;
      * ``segment(fe_state, m, est, frames, keys, s) ->
        (fe_state, m, est, chk)`` — `frames` is the (stride+1,) slice
        [seg_first-1 .. seg_first+stride-1], `s` the traced segment index;
        runs the frontend scan + the window solve [s*stride, s*stride+W).

    Identical math to `make_offline_runner`'s fused scan — the host loop
    simply replaces `lax.scan` over segments, so frames can arrive as they
    decode and XLA async dispatch overlaps host decode / H2D staging of
    segment s+1 with device compute of segment s (the reference overlaps
    these with its data-provider thread, `PipelineManager.cc:174-203`).
    """
    plan = _plan(cfg, n_frames)
    bcfg = cfg.backend
    updater = bcfg.backend_updater_enum
    pose_key = "H" if updater == 0 else "L"
    lm_cfg = _lm_cfg(bcfg)
    fe_scan = _make_fe_scan(cam, cfg, use_klt)
    V, stride, W = plan.overlap, plan.stride, plan.window

    @jax.jit
    def warmup(fe_state: FrontendState, m: MeasurementMap,
               frames: FrameImages, keys: jax.Array):
        f0 = jax.tree.map(lambda a: a[0], frames)
        fe_state, pkt0, _, _ = frontend_step(
            fe_state, f0, f0, cam, cfg.frontend, keys[0],
            use_klt=use_klt, first_frame=True,
        )
        m = update_map(m, pkt0, 0)
        fe_state, m, _ = fe_scan(
            fe_state, m, frames, keys[1:V], jnp.asarray(1, jnp.int32), V - 1
        )
        return fe_state, m

    @jax.jit
    def segment(fe_state: FrontendState, m: MeasurementMap, est: EstStore,
                frames: FrameImages, keys: jax.Array, s: jax.Array):
        seg_first = V + s * stride
        fe_state, m, _ = fe_scan(fe_state, m, frames, keys, seg_first, stride)
        est, result = _solve_window(
            est, m, s * stride, W, cfg, lm_cfg, pose_key, updater
        )
        return fe_state, m, est, result.error

    return warmup, segment, plan
