#!/usr/bin/env python
"""Multi-config experiment sweep — the analog of the reference's TRO sweep
(`dynosam_utils/src/run_experiments_tro.py` / `run_backends.py`): run the
full dataset-dir -> pipeline -> evaluation path for a grid of backend
configurations and commit one results table (VERDICT r4 #10).

Renders a KITTI-layout dataset once (`testing/render.write_reference_layout`
— no real sequences in this environment), then sweeps:

  * updater 0 (WorldMotion) vs 1 (WorldPose)
  * sliding window 10/4 vs full-batch
  * motion smoothing on vs off

Writes artifacts/experiments/{results.json, results.md}.

Usage: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
           python scripts/experiment_sweep.py [--frames 16]
"""

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SWEEP = [
    ("wm_sliding", {"backend.backend_updater_enum": 0}),
    ("wp_sliding", {"backend.backend_updater_enum": 1}),
    ("wm_fullbatch", {"backend.backend_updater_enum": 0,
                      "backend.use_full_batch_opt": True}),
    ("wp_fullbatch", {"backend.backend_updater_enum": 1,
                      "backend.use_full_batch_opt": True}),
    ("wm_nosmooth", {"backend.backend_updater_enum": 0,
                     "backend.use_smoothing_factor": False}),
    ("wm_window6", {"backend.backend_updater_enum": 0,
                    "backend.opt_window_size": 6,
                    "backend.opt_window_overlap": 2}),
]

BASE = {
    "capacity.max_static_tracks": 512,
    "capacity.max_dynamic_tracks": 512,
    "capacity.max_objects": 8,
    "frontend.tracker.max_features_per_frame": 300,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--objects", type=int, default=2)
    a = ap.parse_args()

    from dynosam_tpu.data.factory import create_dataset
    from dynosam_tpu.eval.evaluator import evaluate_all
    from dynosam_tpu.pipeline import run_and_log
    from dynosam_tpu.testing.render import (RenderConfig, RenderedScene,
                                            write_reference_layout)
    from dynosam_tpu.utils.config import load_config

    work = tempfile.mkdtemp(prefix="dyno_sweep_")
    root = os.path.join(work, "0000")
    sc = RenderedScene(RenderConfig(
        n_frames=a.frames, h=192, w=256, fx=200.0,
        n_objects=a.objects, yaw_only_objects=True,
    ))
    write_reference_layout(sc, root)

    rows = {}
    for name, overrides in SWEEP:
        ov = dict(BASE)
        ov["capacity.max_frames"] = a.frames
        ov.update(overrides)
        cfg = load_config(None, ov)
        ds = create_dataset(0, root)
        out = os.path.join(work, name)
        t0 = time.time()
        run_and_log(ds, cfg, out)
        wall = time.time() - t0
        res = evaluate_all(out)
        be_key = [k for k in res if k.endswith("backend")]
        row = {"wall_s": round(wall, 1), "config": overrides}
        if be_key:
            be = res[be_key[0]]
            row["be_ate_trans"] = round(be["camera"]["ate_trans_rmse"], 5)
            row["be_ate_rot_deg"] = round(be["camera"]["ate_rot_deg_rmse"], 4)
            if "objects_mean" in be:
                row["be_ame_trans"] = round(
                    be["objects_mean"].get("ame_trans_rmse", float("nan")), 5
                )
                row["be_ame_rot_deg"] = round(
                    be["objects_mean"].get("ame_rot_deg_rmse", float("nan")), 4
                )
        fe = res.get("frontend", {})
        if "camera" in fe:
            row["fe_ate_trans"] = round(fe["camera"]["ate_trans_rmse"], 5)
        rows[name] = row
        print(f"{name}: {row}", file=sys.stderr)

    art = os.path.join(REPO, "artifacts", "experiments")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "results.json"), "w") as f:
        json.dump({
            "scene": {"frames": a.frames, "objects": a.objects,
                      "size": "192x256", "yaw_only": True},
            "rows": rows,
        }, f, indent=2)
    cols = ["fe_ate_trans", "be_ate_trans", "be_ate_rot_deg",
            "be_ame_trans", "be_ame_rot_deg", "wall_s"]
    with open(os.path.join(art, "results.md"), "w") as f:
        f.write("# Backend configuration sweep (rendered 16-frame scene)\n\n")
        f.write("Analog of the reference's TRO sweep "
                "(`run_experiments_tro.py`): updater / window / smoothing "
                "grid through the dataset-dir CLI path.\n\n")
        f.write("| config | " + " | ".join(cols) + " |\n")
        f.write("|---" * (len(cols) + 1) + "|\n")
        for name, row in rows.items():
            f.write(
                f"| {name} | "
                + " | ".join(str(row.get(c, "-")) for c in cols)
                + " |\n"
            )
    print(json.dumps({"metric": "experiment_sweep", "rows": len(rows),
                      "artifact": os.path.join(art, "results.md")}))


if __name__ == "__main__":
    main()
