#!/usr/bin/env python
"""Accuracy regression ON THE REAL TPU (VERDICT r3 item 7).

Runs the same fixed-seed golden scene as tests/test_accuracy_regression.py
(32 frames, 2 objects, sensor noise) through the full pipeline on the
tunneled TPU, asserts the COMMITTED CPU golden bands hold on device (the
only way bf16-class matmul-precision regressions surface before they cost
a round — CLAUDE.md geometry-precision rule), then repeats at the
renderer's full capability (100 frames, 3 objects with occlusion).

Usage:  python scripts/accuracy_tpu.py            (TPU via axon)
        env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/accuracy_tpu.py
Prints one JSON line per scene; appends to tpu_runs/accuracy.jsonl.
"""

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def make_cfg(n_frames: int, full_batch: bool = True):
    from dynosam_tpu.utils.config import (
        BackendConfig, CapacityConfig, DynoConfig, FrontendConfig,
        PipelineConfig, TrackerConfig,
    )

    return DynoConfig(
        frontend=FrontendConfig(
            tracker=TrackerConfig(
                max_features_per_frame=300, klt_window=13, klt_levels=2
            ),
            min_dynamic_features_per_object=20,
        ),
        backend=BackendConfig(
            use_full_batch_opt=full_batch,
            backend_updater_enum=0,
            lm_max_iterations=15,
        ),
        capacity=CapacityConfig(
            max_static_tracks=400,
            max_dynamic_tracks=1024,
            max_objects=8,
            max_frames=n_frames,
        ),
        pipeline=PipelineConfig(use_backend=True),
    )


def run_scene(n_frames: int, n_objects: int, full_batch: bool):
    from dynosam_tpu.eval.evaluator import evaluate_all
    from dynosam_tpu.pipeline import run_and_log
    from dynosam_tpu.testing.render import RenderConfig, RenderedScene

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_pipeline import RenderedDataset

    # render on host CPU (tiny-op renderer; same rule as bench.py)
    with jax.default_device(jax.devices("cpu")[0]):
        scene = RenderedScene(
            RenderConfig(n_frames=n_frames, n_objects=n_objects, seed=0)
        )
        ds = RenderedDataset(scene)
        fr = np.random.default_rng(1)
        ds._frames = [
            type(f)(
                gray=f.gray,
                depth=f.depth
                * (1.0 + jnp.asarray(
                    fr.normal(0, 0.01, np.asarray(f.depth).shape),
                    jnp.float32)),
                flow=f.flow + jnp.asarray(
                    fr.normal(0, 0.5, np.asarray(f.flow).shape),
                    jnp.float32),
                mask=f.mask,
            )
            for f in ds._frames
        ]
        ds._frames = [jax.tree.map(np.asarray, f) for f in ds._frames]

    out = tempfile.mkdtemp(prefix=f"acc_tpu_{n_frames}f_")
    t0 = time.perf_counter()
    run_and_log(ds, make_cfg(n_frames, full_batch), out)
    dt = time.perf_counter() - t0
    evals = evaluate_all(out)
    cam_f = evals["frontend"]["camera"]
    cam_b = evals["rgbd_motion_world_backend"]["camera"]
    obj_f = evals["frontend"]["objects_mean"]
    obj_b = evals["rgbd_motion_world_backend"]["objects_mean"]
    row = {
        "scene": f"{n_frames}f_{n_objects}obj",
        "platform": jax.default_backend(),
        "fe_ate": round(float(cam_f["ate_trans_rmse"]), 5),
        "fe_rpe": round(float(cam_f["rpe_trans_rmse"]), 5),
        "fe_rpe_rot": round(float(cam_f["rpe_rot_deg_rmse"]), 5),
        "be_ate": round(float(cam_b["ate_trans_rmse"]), 5),
        "fe_ame": round(float(obj_f["ame_trans_rmse"]), 5),
        "be_ame": round(float(obj_b["ame_trans_rmse"]), 5),
        "wall_s": round(dt, 1),
    }
    return row


def main():
    failures = []
    rows = []

    # scene 1: the committed golden scene — CPU bands must hold on TPU
    row = run_scene(32, 2, full_batch=True)
    rows.append(row)
    bands = {
        "fe_ate": 0.010, "fe_rpe": 0.004, "fe_rpe_rot": 0.03,
        "be_ate": 0.022,
    }
    for k, band in bands.items():
        if not row[k] < band:
            failures.append(f"{k}={row[k]} !< {band}")
    if not row["be_ame"] < row["fe_ame"]:
        failures.append(
            f"backend must improve AME: {row['be_ame']} !< {row['fe_ame']}"
        )
    row["bands_ok"] = not failures
    print(json.dumps(row), flush=True)

    # scene 2: renderer full capability (100 frames, 3 objects, sliding
    # window backend) — recorded, improvement asserted, no absolute bands
    row2 = run_scene(100, 3, full_batch=False)
    row2["bands_ok"] = row2["be_ame"] < row2["fe_ame"] * 1.05
    rows.append(row2)
    print(json.dumps(row2), flush=True)

    os.makedirs(os.path.join(REPO, "tpu_runs"), exist_ok=True)
    with open(os.path.join(REPO, "tpu_runs", "accuracy.jsonl"), "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    if failures:
        print("BAND FAILURES: " + "; ".join(failures), file=sys.stderr)
        sys.exit(1)
    print("ALL BANDS OK", file=sys.stderr)


if __name__ == "__main__":
    main()
