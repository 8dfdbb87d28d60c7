#!/usr/bin/env python
"""Device-trace profile of the sustained-pipeline SEGMENT program
(frontend scan x stride + window solve), the unit of `throughput.py`.

Separates the whole-pipeline sustained cost into its segment ops the same
way trace_frontend.py does for the frontend step.  Usage:
`python scripts/trace_pipeline.py [n_segments_traced] [out_dir]`.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts")
)

import jax
import jax.numpy as jnp
import numpy as np

from trace_frontend import parse


def main():
    n_traced = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dyno_trace_pipe"

    import bench as benchmod
    from dynosam_tpu.backend.map import MeasurementMap
    from dynosam_tpu.frontend.frontend import FrontendState
    from dynosam_tpu.testing.render import RenderConfig, RenderedScene
    from dynosam_tpu.throughput import (
        EstStore, make_streaming_runner, online_keys,
    )
    from dynosam_tpu.utils.config import (
        BackendConfig, CapacityConfig, DynoConfig, FrontendConfig,
        PipelineConfig, TrackerConfig,
    )

    n, h, w = 40, 384, 1280
    rcfg = RenderConfig(
        n_frames=n, h=h, w=w, fx=718.0, n_objects=3,
        bg_depth=14.0, obj_depth=9.0, cam_step=0.10, obj_step=0.18,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        sc = RenderedScene(rcfg)
        frames = [jax.tree.map(np.asarray, f) for f in sc.frames()]
    stacked = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *frames)
    cfg = DynoConfig(
        frontend=FrontendConfig(
            tracker=TrackerConfig(max_features_per_frame=1000)
        ),
        backend=BackendConfig(use_full_batch_opt=False, lm_max_iterations=10),
        capacity=CapacityConfig(
            max_static_tracks=2048, max_dynamic_tracks=4096,
            max_objects=16, max_frames=n,
        ),
        pipeline=PipelineConfig(use_backend=True),
    )
    warmup, segment, plan = make_streaming_runner(sc.cam, cfg, n)
    keys = online_keys(n)
    fe = FrontendState.create(2048, 4096, 16)
    m = MeasurementMap.create(n, 2048, 4096, 16)
    est = EstStore.create(n, 2048, 4096, 16)

    V, stride = plan.overlap, plan.stride
    fe, m = warmup(fe, m, jax.tree.map(lambda a: a[:V], stacked), keys[:V])

    def seg(fe, m, est, s):
        first = V + s * stride
        fr = jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(
                a, first - 1, stride + 1, axis=0
            ),
            stacked,
        )
        return segment(
            fe, m, est, fr, keys[first:first + stride],
            jnp.asarray(s, jnp.int32),
        )

    # compile + settle on segment 0
    fe1, m1, est1, err = seg(fe, m, est, 0)
    float(np.asarray(err))
    print(f"compiled; tracing {min(n_traced, plan.n_segments)} segments",
          flush=True)
    jax.profiler.start_trace(out_dir)
    fe_t, m_t, est_t = fe, m, est
    for s in range(min(n_traced, plan.n_segments)):
        fe_t, m_t, est_t, err = seg(fe_t, m_t, est_t, s)
    float(np.asarray(err))                  # fetch barrier INSIDE the trace
    jax.profiler.stop_trace()
    parse(out_dir, min(n_traced, plan.n_segments) * stride, top_individual=30)


if __name__ == "__main__":
    main()
