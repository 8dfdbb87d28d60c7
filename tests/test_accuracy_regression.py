"""Golden-number accuracy regression harness (VERDICT r2 item 6).

One fixed-seed rendered sequence (32 frames, 2 independently moving
objects, realistic sensor noise: 0.5 px flow error + 1 % depth error) runs
the full vision pipeline once; the same frontend packets then replay
through backend variants.  Asserts, against COMMITTED golden bands:

  * frontend and backend camera ATE / object AME within bands;
  * the backend improves the object motions it was fed (AME strictly
    below the frontend's — the reference's central object-level claim);
  * drift recovery: corrupting the frontend camera poses with a growing
    drift (the reference's corrupt-init experiment family,
    `RGBDBackendModule.cc:60-71`) must be repaired by BOTH updaters —
    backend ATE well under the corrupted trajectory's ATE;
  * sliding-window (10/4) vs full-batch ordering: the joint solve is at
    least as accurate (`sliding_window_vs_batch_error_plot.py` analog).

Golden numbers measured 2026-08-19 on CPU f32 (see bands inline); bands
allow ~2x headroom for platform jitter, NOT for regressions.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dynosam_tpu.eval import metrics
from dynosam_tpu.eval.evaluator import evaluate_all
from dynosam_tpu.pipeline import run_and_log, run_from_packets
from dynosam_tpu.testing.render import RenderConfig, RenderedScene
from dynosam_tpu.utils.config import (
    BackendConfig,
    CapacityConfig,
    DynoConfig,
    FrontendConfig,
    PipelineConfig,
    TrackerConfig,
)

from test_pipeline import RenderedDataset

N_FRAMES = 32


def _make_cfg(full_batch=True, updater=0):
    return DynoConfig(
        frontend=FrontendConfig(
            tracker=TrackerConfig(
                max_features_per_frame=300, klt_window=13, klt_levels=2
            ),
            min_dynamic_features_per_object=20,
        ),
        backend=BackendConfig(
            use_full_batch_opt=full_batch,
            backend_updater_enum=updater,
            lm_max_iterations=15,
        ),
        capacity=CapacityConfig(
            max_static_tracks=400,
            max_dynamic_tracks=1024,
            max_objects=8,
            max_frames=N_FRAMES,
        ),
        pipeline=PipelineConfig(use_backend=True),
    )


@pytest.fixture(scope="module")
def golden_run(tmp_path_factory):
    scene = RenderedScene(
        RenderConfig(n_frames=N_FRAMES, n_objects=2, seed=0)
    )
    ds = RenderedDataset(scene)
    # realistic sensor noise (same recipe as bench.py): estimated flow is
    # ~sub-pixel accurate, depth ~1 %
    fr = np.random.default_rng(1)
    ds._frames = [
        type(f)(
            gray=f.gray,
            depth=f.depth
            * (
                1.0
                + jnp.asarray(
                    fr.normal(0, 0.01, np.asarray(f.depth).shape),
                    jnp.float32,
                )
            ),
            flow=f.flow
            + jnp.asarray(
                fr.normal(0, 0.5, np.asarray(f.flow).shape), jnp.float32
            ),
            mask=f.mask,
        )
        for f in ds._frames
    ]
    out = tmp_path_factory.mktemp("golden")
    result = run_and_log(ds, _make_cfg(True, 0), str(out))
    evals = evaluate_all(str(out))
    gt_T = np.stack(
        [
            np.block(
                [
                    [np.asarray(X.R), np.asarray(X.t)[:, None]],
                    [np.zeros((1, 3)), np.ones((1, 1))],
                ]
            )
            for X in scene.X_gt
        ]
    )
    return scene, result, evals, gt_T


def _backend_ate(be, gt_T):
    X, xv = be.camera_poses()
    xv = np.asarray(xv).astype(bool)
    T = np.zeros((int(xv.sum()), 4, 4))
    T[:, 3, 3] = 1
    T[:, :3, :3] = np.asarray(X.R)[xv]
    T[:, :3, 3] = np.asarray(X.t)[xv]
    return metrics.ate(T, gt_T[xv])["trans"].rmse


def test_golden_frontend_bands(golden_run):
    _, _, evals, _ = golden_run
    cam = evals["frontend"]["camera"]
    # measured 2026-08-19: ate 0.0046 m / rpe 0.0014 m / 0.0091 deg
    assert cam["ate_trans_rmse"] < 0.010, cam
    assert cam["rpe_trans_rmse"] < 0.004, cam
    assert cam["rpe_rot_deg_rmse"] < 0.03, cam
    objs = evals["frontend"]["objects_mean"]
    # measured: ame 0.138 m / 1.30 deg, rme 0.029 m
    assert objs["ame_trans_rmse"] < 0.30, objs
    assert objs["ame_rot_deg_rmse"] < 3.0, objs
    assert objs["rme_trans_rmse"] < 0.08, objs


def test_golden_backend_bands_and_object_improvement(golden_run):
    _, _, evals, _ = golden_run
    be = evals["rgbd_motion_world_backend"]
    # measured: ate 0.0100 m, ame 0.0699 m / 0.65 deg
    assert be["camera"]["ate_trans_rmse"] < 0.022, be["camera"]
    objs_be = be["objects_mean"]
    objs_fe = evals["frontend"]["objects_mean"]
    assert objs_be["ame_trans_rmse"] < 0.15, objs_be
    # the backend must IMPROVE the object motions it was fed (measured
    # 0.070 vs 0.138 m and 0.65 vs 1.30 deg — ~2x on both)
    assert objs_be["ame_trans_rmse"] < 0.8 * objs_fe["ame_trans_rmse"], (
        objs_be, objs_fe,
    )
    assert (
        objs_be["ame_rot_deg_rmse"] < 0.8 * objs_fe["ame_rot_deg_rmse"]
    ), (objs_be, objs_fe)


def test_sliding_vs_batch_ordering(golden_run):
    _, result, evals, gt_T = golden_run
    be_sw = run_from_packets(result.packets, _make_cfg(False, 0))
    sw_ate = _backend_ate(be_sw, gt_T)
    fb_ate = evals["rgbd_motion_world_backend"]["camera"]["ate_trans_rmse"]
    # measured: full batch 0.0100, sliding 0.0282; windows see <= 10
    # frames so the joint solve must not lose to them
    assert sw_ate < 0.06, sw_ate
    assert fb_ate <= sw_ate * 1.10, (fb_ate, sw_ate)


@pytest.mark.parametrize("updater", [0, 1])
def test_drift_recovery_both_updaters(golden_run, updater):
    """Corrupt the frontend camera trajectory with a growing drift and
    assert the backend repairs it — the backend-improves-frontend claim in
    the regime it exists for (reference experiment family
    `--corrupt_L_for_init`, `RGBDBackendModule.cc:60-71`).

    Unlike the reference's experiment (which corrupts only linearization
    INIT values), corrupting packets corrupts the odometry MEASUREMENTS
    too, so the config must say so: odometry sigmas are loosened 10x and
    the repair comes from the static landmarks.  Recovery is structurally
    bounded by track length — free landmarks absorb the MEAN drift over
    each track's lifetime and only the drift SPREAD is observable — so the
    measured ceiling is ~2.2x, not full repair (measured 2026-08-19:
    corrupted 0.187 m, recovered 0.0913 (u0) / 0.0796 (u1), LM converged
    at 63/75 iters; huber-off and default-odometry variants measured
    strictly worse)."""
    import dataclasses

    from dynosam_tpu.core.lie import SE3, se3_compose, se3_exp

    scene, result, _, gt_T = golden_run
    drift_per_frame = jnp.asarray(
        [0.0, 0.0015, 0.0, 0.02, 0.008, 0.0], jnp.float32
    )
    corrupted = []
    for k, pkt in enumerate(result.packets):
        D = se3_exp(drift_per_frame * float(k))
        corrupted.append(
            pkt._replace(X_world=se3_compose(D, pkt.X_world))
        )
    # corrupted trajectory ATE (what the backend is fed)
    Tc = np.stack(
        [
            np.block(
                [
                    [
                        np.asarray(p.X_world.R),
                        np.asarray(p.X_world.t)[:, None],
                    ],
                    [np.zeros((1, 3)), np.ones((1, 1))],
                ]
            )
            for p in corrupted
        ]
    )
    corrupted_ate = metrics.ate(Tc, gt_T)["trans"].rmse
    assert corrupted_ate > 0.08, corrupted_ate  # drift is material

    cfg = _make_cfg(True, updater)
    cfg = dataclasses.replace(
        cfg,
        backend=dataclasses.replace(
            cfg.backend,
            lm_max_iterations=100,
            odometry_translation_sigma=1.0,
            odometry_rotation_sigma=0.5,
        ),
    )
    be = run_from_packets(corrupted, cfg)
    rec_ate = _backend_ate(be, gt_T)
    assert rec_ate < corrupted_ate / 1.8, (rec_ate, corrupted_ate)
    assert rec_ate < 0.11, rec_ate
