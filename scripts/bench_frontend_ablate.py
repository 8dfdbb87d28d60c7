#!/usr/bin/env python
"""Frontend stage ablation on the real TPU (fetch-barrier protocol).

Times the full scanned frontend step under a stack of config ablations so
the per-stage cost falls out by differencing.  One process, one render,
several compiles (each remote compile costs minutes — expect ~15-25 min
total).

Usage: python scripts/bench_frontend_ablate.py [reps]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as benchmod
    from dynosam_tpu.utils.config import FrontendConfig, TrackerConfig

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sc, frames = benchmod.rendered_frames()
    cam = sc.cam
    tcfg = TrackerConfig(max_features_per_frame=1000)

    variants = [
        ("full step", FrontendConfig(tracker=tcfg)),
        (
            "no refinements",
            FrontendConfig(
                tracker=tcfg,
                refine_camera_pose_with_joint_of=False,
                refine_motion_with_joint_of=False,
                refine_motion_with_3d=False,
            ),
        ),
        (
            "no object solves",
            FrontendConfig(
                tracker=tcfg,
                refine_motion_with_joint_of=False,
                refine_motion_with_3d=False,
                use_object_motion_pnp=False,
                max_active_objects=1,
            ),
        ),
        (
            "ego ransac 100 iters",
            FrontendConfig(
                tracker=tcfg,
                camera_solver=dataclasses.replace(
                    FrontendConfig().camera_solver, ransac_iterations=100
                ),
                object_solver=dataclasses.replace(
                    FrontendConfig().object_solver, ransac_iterations=100
                ),
            ),
        ),
        (
            "cold KLT (no flow warm start)",
            FrontendConfig(
                tracker=dataclasses.replace(tcfg, klt_flow_warm_start=False),
            ),
        ),
        (
            "no clahe",
            FrontendConfig(
                tracker=dataclasses.replace(tcfg, use_clahe_filter=False),
            ),
        ),
        (
            "redetect on demand (5%)",
            FrontendConfig(
                tracker=dataclasses.replace(
                    tcfg, redetect_min_free_fraction=0.05
                ),
            ),
        ),
    ]

    for label, cfg in variants:
        try:
            fps = benchmod.bench_frontend_scan(
                frames, cam, label, cfg, reps=reps
            )
        except Exception as e:
            print(f"{label}: FAILED {e}", file=sys.stderr)
    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
