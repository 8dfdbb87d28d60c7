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
