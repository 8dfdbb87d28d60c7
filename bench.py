#!/usr/bin/env python
"""Benchmark: frontend frames/s per chip on KITTI-sized synthetic frames.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference publishes no numeric benchmark tables
(BASELINE.md); its C++ frontend runs of order 10 fps on CPU (per-module
timers `tracking_timer` + solvers, SURVEY §5.1).  `vs_baseline` is
value / 10 fps until a measured reference number replaces it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

REF_BASELINE_FPS = 10.0


def main():
    from dynosam_tpu.core.camera import CameraParams
    from dynosam_tpu.frontend.frontend import (
        FrameImages,
        FrontendState,
        frontend_step,
    )
    from dynosam_tpu.utils.config import FrontendConfig, TrackerConfig

    h, w = 384, 1280  # KITTI-like
    rng = np.random.default_rng(0)
    cam = CameraParams.create(718.0, 718.0, w / 2, h / 2, w, h)
    tcfg = TrackerConfig(max_features_per_frame=1000)
    cfg = FrontendConfig(tracker=tcfg)

    def synth_frame(k):
        gray = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
        depth = jnp.asarray(rng.uniform(3, 30, (h, w)), jnp.float32)
        flow = jnp.asarray(rng.normal(0, 1.5, (h, w, 2)), jnp.float32)
        mask = jnp.zeros((h, w), jnp.int32)
        mask = mask.at[100:220, 300 + 10 * k : 500 + 10 * k].set(3)
        mask = mask.at[120:260, 700 + 8 * k : 900 + 8 * k].set(7)
        return FrameImages(gray=gray, depth=depth, flow=flow, mask=mask)

    frames = [synth_frame(k) for k in range(12)]
    state = FrontendState.create(1200, 4096, 16)

    # warmup / compile
    prev = frames[0]
    state, pkt, _, _ = frontend_step(
        state, prev, frames[0], cam, cfg, jax.random.PRNGKey(0),
        use_klt=True, first_frame=True,
    )
    state, pkt, _, _ = frontend_step(
        state, frames[0], frames[1], cam, cfg, jax.random.PRNGKey(1),
        use_klt=True, first_frame=False,
    )
    jax.block_until_ready(pkt.X_world.t)

    n = 10
    t0 = time.perf_counter()
    for k in range(n):
        a = frames[(k + 1) % len(frames)]
        b = frames[(k + 2) % len(frames)]
        state, pkt, _, _ = frontend_step(
            state, a, b, cam, cfg, jax.random.PRNGKey(k + 2),
            use_klt=True, first_frame=False,
        )
    jax.block_until_ready(pkt.X_world.t)
    dt = time.perf_counter() - t0
    fps = n / dt

    # ---- secondary: backend BA throughput (stderr; headline stays 1 line).
    # Opt-in: the LM while-loop compile takes minutes on the remote-compile
    # TPU path, which would risk the driver's bench timeout.
    if os.environ.get("DYNO_BENCH_BACKEND") != "1":
        print(
            json.dumps(
                {
                    "metric": "frontend_frames_per_s_per_chip",
                    "value": round(fps, 3),
                    "unit": "frames/s",
                    "vs_baseline": round(fps / REF_BASELINE_FPS, 3),
                }
            )
        )
        return
    try:
        from dynosam_tpu.backend.backend import optimize_window_jit
        from dynosam_tpu.backend.map import MeasurementMap, update_map
        from dynosam_tpu.backend.solver import LMConfig
        from dynosam_tpu.core.lie import se3_identity
        from dynosam_tpu.testing.simulator import Scenario, ScenarioConfig
        from dynosam_tpu.utils.config import BackendConfig

        scfg = ScenarioConfig(
            n_frames=10, n_static=800, n_objects=4, pts_per_object=200,
            ns=1024, nd=1024, no=8,
        )
        sc = Scenario(scfg)
        m = MeasurementMap.create(10, 1024, 1024, 8)
        for k, pkt in enumerate(sc.frontend_outputs()):
            m = update_map(m, pkt, k)
        bcfg = BackendConfig(lm_max_iterations=10, cg_max_iterations=60)
        lm_cfg = LMConfig(max_iterations=10, cg_max_iterations=60)
        anchor = se3_identity((), jnp.float32)
        args = (m, 0, 10, bcfg, lm_cfg, anchor, jnp.asarray(False), 0)
        res, _ = optimize_window_jit(*args)  # compile
        jax.block_until_ready(res.error)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            res, _ = optimize_window_jit(*args)
        jax.block_until_ready(res.error)
        ba_dt = (time.perf_counter() - t0) / reps
        iters = int(res.iterations)
        print(
            f"backend: window10 solve {ba_dt*1e3:.1f} ms, "
            f"{iters/ba_dt:.1f} LM iters/s, final err {float(res.error):.3f}",
            file=sys.stderr,
        )
    except Exception as e:  # never break the headline metric
        print(f"backend bench failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "frontend_frames_per_s_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / REF_BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
