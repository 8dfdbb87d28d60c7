#!/usr/bin/env python
"""Dataset-dir -> CLI -> report demo (the reference's canonical entry,
`dynosam_node` + `eval_launch.py`): render a KITTI-layout dataset to disk,
run `python -m dynosam_tpu --dataset_path ... --output_path ...`, and copy
the resulting results.json into artifacts/cli_demo/.

Usage: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
           python scripts/run_cli_demo.py [--frames 16] [--keep-dir DIR]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--objects", type=int, default=2)
    ap.add_argument("--keep-dir", default="")
    a = ap.parse_args()

    from dynosam_tpu.__main__ import main as cli_main
    from dynosam_tpu.testing.render import (RenderConfig, RenderedScene,
                                            write_reference_layout)

    work = a.keep_dir or tempfile.mkdtemp(prefix="dyno_cli_demo_")
    root = os.path.join(work, "0000")
    out = os.path.join(work, "out")
    sc = RenderedScene(RenderConfig(
        n_frames=a.frames, h=192, w=256, fx=200.0,
        n_objects=a.objects, yaw_only_objects=True,
    ))
    write_reference_layout(sc, root)
    print(f"dataset written to {root}", file=sys.stderr)

    rc = cli_main([
        "--dataset_path", root,
        "--output_path", out,
        "--set", "capacity.max_static_tracks=512",
        "--set", "capacity.max_dynamic_tracks=512",
        "--set", "capacity.max_objects=8",
        "--set", f"capacity.max_frames={a.frames}",
        "--set", "frontend.tracker.max_features_per_frame=300",
    ])
    assert rc == 0, rc

    art = os.path.join(REPO, "artifacts", "cli_demo")
    os.makedirs(art, exist_ok=True)
    shutil.copy(os.path.join(out, "results.json"), art)
    with open(os.path.join(out, "results.json")) as f:
        results = json.load(f)
    print(json.dumps({
        "metric": "cli_e2e_ate_trans_rmse",
        "frontend": results["frontend"]["camera"]["ate_trans_rmse"],
        "backend":
            results["rgbd_motion_world_backend"]["camera"]["ate_trans_rmse"],
        "artifact": os.path.join(art, "results.json"),
    }))
    if not a.keep_dir:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
