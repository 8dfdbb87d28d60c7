"""Fused-segment offline pipeline (throughput.py) vs the online
per-dispatch pipeline: same frames -> same estimates.

The fused runner traces ONE window-solve program with a dynamic start and
scans it over trigger segments; the online `DynoPipeline` dispatches each
window separately with static starts.  Identical math modulo f32
reassociation, so the camera trajectories must agree tightly.

Config uses overlap V=1 so the online `finish()` adds no trailing partial
window (the fused runner implements exactly the in-sequence triggers).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynosam_tpu.pipeline import DynoPipeline
from dynosam_tpu.testing.render import RenderConfig, RenderedScene
from dynosam_tpu.throughput import run_offline
from dynosam_tpu.utils.config import (
    BackendConfig,
    CapacityConfig,
    DynoConfig,
    FrontendConfig,
    PipelineConfig,
    TrackerConfig,
)

K = 9  # V + 2 * stride with W=5, V=1


@pytest.fixture(scope="module")
def scene_and_cfg():
    scene = RenderedScene(
        RenderConfig(n_frames=K, h=96, w=128, fx=100.0, seed=3)
    )
    cfg = DynoConfig(
        frontend=FrontendConfig(
            tracker=TrackerConfig(
                max_features_per_frame=150, klt_window=11, klt_levels=2
            ),
        ),
        backend=BackendConfig(
            use_full_batch_opt=False,
            opt_window_size=5,
            opt_window_overlap=1,
            lm_max_iterations=8,
        ),
        capacity=CapacityConfig(
            max_static_tracks=256,
            max_dynamic_tracks=512,
            max_objects=8,
            max_frames=K,
        ),
        pipeline=PipelineConfig(use_backend=True),
    )
    return scene, cfg


def test_offline_matches_online(scene_and_cfg):
    scene, cfg = scene_and_cfg
    frames = scene.frames()

    pipe = DynoPipeline(scene.cam, cfg, use_klt=True)
    online = pipe.run(frames)
    be = online.backend
    X_on, xv_on = be.camera_poses()

    packets, est, last = run_offline(frames, scene.cam, cfg)

    xv_off = np.asarray(est.X_valid)
    assert np.array_equal(np.asarray(xv_on), xv_off)
    sel = xv_off
    np.testing.assert_allclose(
        np.asarray(X_on.t)[sel], np.asarray(est.X.t)[sel], atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(X_on.R)[sel], np.asarray(est.X.R)[sel], atol=5e-4
    )
    # per-frame frontend packets agree too
    t_on = np.stack([np.asarray(p.X_world.t) for p in online.packets])
    np.testing.assert_allclose(
        t_on, np.asarray(packets.X_world.t), atol=5e-4
    )


def test_offline_key_parity(scene_and_cfg):
    """The fused runner must feed frontend_step the SAME per-frame PRNG keys
    the online pipeline uses (PRNGKey(k)), otherwise detection sampling
    diverges and the equivalence above would be vacuous."""
    from dynosam_tpu.throughput import online_keys

    ks = online_keys(4)
    expect = jnp.stack([jax.random.PRNGKey(k) for k in range(4)])
    assert np.array_equal(np.asarray(ks), np.asarray(expect))


def test_streaming_matches_offline(scene_and_cfg):
    """Per-segment host dispatch (make_streaming_runner) == the fused
    lax.scan program (run_offline): identical traced math, the host loop
    just replaces the outer scan."""
    import jax.numpy as jnp

    from dynosam_tpu.backend.map import MeasurementMap
    from dynosam_tpu.frontend.frontend import FrontendState
    from dynosam_tpu.throughput import (
        EstStore,
        make_streaming_runner,
        online_keys,
        run_offline,
    )

    scene, cfg = scene_and_cfg
    frames = scene.frames()
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)

    _, est_ref, _ = run_offline(frames, scene.cam, cfg)

    warmup, segment, plan = make_streaming_runner(scene.cam, cfg, K)
    cap = cfg.capacity
    fe = FrontendState.create(
        cap.max_static_tracks, cap.max_dynamic_tracks, cap.max_objects
    )
    m = MeasurementMap.create(
        K, cap.max_static_tracks, cap.max_dynamic_tracks, cap.max_objects
    )
    est = EstStore.create(
        K, cap.max_static_tracks, cap.max_dynamic_tracks, cap.max_objects
    )
    keys = online_keys(K)
    V, stride = plan.overlap, plan.stride
    fe, m = warmup(fe, m, jax.tree.map(lambda a: a[:V], stacked), keys[:V])
    for s in range(plan.n_segments):
        first = V + s * stride
        seg_frames = jax.tree.map(
            lambda a: a[first - 1 : first + stride], stacked
        )
        fe, m, est, _ = segment(
            fe, m, est, seg_frames, keys[first : first + stride],
            jnp.asarray(s, jnp.int32),
        )

    # same traced math, but the outer-scan and standalone-jit programs are
    # DIFFERENT XLA compilations (fusion/layout choices reassociate f32),
    # and sub-ulp step differences flip LM accept/reject paths; measured
    # max divergence 1.9e-4 m on this scene
    np.testing.assert_allclose(
        np.asarray(est.X.t), np.asarray(est_ref.X.t), atol=1e-3
    )
    assert np.array_equal(
        np.asarray(est.X_valid), np.asarray(est_ref.X_valid)
    )


def test_batched_window_solves_close_to_sequential(scene_and_cfg):
    """opt_windows_per_dispatch=2: both pending windows solve in one
    vmapped LM program, warm-started from the pre-group state.  Solutions
    must stay close to strictly sequential mode (each window is solved to
    convergence, so the staler warm start moves the optimum only within
    solver tolerance), and writeback order keeps the later window's
    estimate on overlap frames."""
    import dataclasses

    scene, cfg = scene_and_cfg
    frames = scene.frames()

    _, est1, _ = run_offline(frames, scene.cam, cfg)
    cfg2 = dataclasses.replace(
        cfg, backend=dataclasses.replace(
            cfg.backend, opt_windows_per_dispatch=2
        )
    )
    _, est2, _ = run_offline(frames, scene.cam, cfg2)

    v1 = np.asarray(est1.X_valid)
    v2 = np.asarray(est2.X_valid)
    assert np.array_equal(v1, v2)
    np.testing.assert_allclose(
        np.asarray(est1.X.t)[v1], np.asarray(est2.X.t)[v1], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(est1.X.R)[v1], np.asarray(est2.X.R)[v1], atol=2e-3
    )


def test_batched_window_solves_fallback(scene_and_cfg):
    """A wpd that does not divide n_segments falls back to sequential
    (bit-identical to wpd=1)."""
    import dataclasses

    scene, cfg = scene_and_cfg
    frames = scene.frames()
    _, est1, _ = run_offline(frames, scene.cam, cfg)
    cfg3 = dataclasses.replace(
        cfg, backend=dataclasses.replace(
            cfg.backend, opt_windows_per_dispatch=3   # n_segments=2
        )
    )
    _, est3, _ = run_offline(frames, scene.cam, cfg3)
    np.testing.assert_array_equal(
        np.asarray(est1.X.t), np.asarray(est3.X.t)
    )
