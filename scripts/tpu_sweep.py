#!/usr/bin/env python
"""Round-3 TPU A/B sweep — run the moment the axon tunnel is back.

Each configuration runs in a SUBPROCESS (the knobs are read at import, and
a crash in one config must not kill the sweep):

  1. backend window-10 direct Schur: DYNO_SCHUR_LANES 0 vs 1
     (lane-major chain solve, schur.chain_solve_lanes);
  2. frontend full-step scan: DYNO_LK_VARIANT reload vs resident
     x DYNO_LK_PRECISION highest vs float32.

Prints one line per config; paste results into BENCH_NOTES.md and flip the
winning defaults.  Usage: `python scripts/tpu_sweep.py [backend|frontend]`.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BACKEND_SNIPPET = """
import sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import bench
dt = bench.bench_backend_window()
print(f"RESULT backend_window_ms={{dt*1e3:.2f}}", flush=True)
"""

FRONTEND_SNIPPET = """
import sys, time
sys.path.insert(0, {repo!r})
import bench
from dynosam_tpu.utils.config import FrontendConfig, TrackerConfig
sc, frames = bench.rendered_frames()
cfg = FrontendConfig(tracker=TrackerConfig(max_features_per_frame=1000))
fps = bench.bench_frontend_scan(frames, sc.cam, "sweep", cfg)
print(f"RESULT frontend_fps={{fps:.2f}}", flush=True)
"""


def run(env_extra: dict, snippet: str, label: str, timeout=1500):
    env = dict(os.environ)
    env.update(env_extra)
    env["PYTHONPATH"] = (
        REPO + os.pathsep + env["PYTHONPATH"]
        if env.get("PYTHONPATH") else REPO
    )
    try:
        p = subprocess.run(
            [sys.executable, "-c", snippet.format(repo=REPO)],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        print(f"{label:55s} TIMEOUT after {timeout}s")
        return
    res = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT")]
    print(f"{label:55s} {res[0] if res else 'FAILED'}")
    if not res:
        print(p.stderr[-1200:], file=sys.stderr)


ALT_SNIPPET = """
import sys, time
sys.path.insert(0, {repo!r})
import bench
from dynosam_tpu.utils.config import FrontendConfig, TrackerConfig
sc, frames = bench.rendered_frames()
cfg = FrontendConfig(tracker=TrackerConfig(
    max_features_per_frame=1000, {tracker_kw}), {frontend_kw})
fps = bench.bench_frontend_scan(frames, sc.cam, "sweep", cfg)
print(f"RESULT frontend_fps={{fps:.2f}}", flush=True)
"""


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "backend"):
        for stable in ("0", "1"):
            run({"DYNO_SCHUR_STABLE": stable}, BACKEND_SNIPPET,
                f"backend window-10  DYNO_SCHUR_STABLE={stable}")
    if which in ("all", "frontend"):
        for variant in ("reload", "resident", "fma"):
            for prec in ("highest", "float32"):
                run(
                    {"DYNO_LK_VARIANT": variant,
                     "DYNO_LK_PRECISION": prec},
                    FRONTEND_SNIPPET,
                    f"frontend scan  LK={variant} prec={prec}",
                )
    if which in ("all", "alt"):
        # non-default compute paths (VERDICT r3 item 8): one recorded TPU
        # number each for the alternate detector / ego solver / tracker
        # configurations the reference treats as first-class modes
        # (`MotionSolver.cc:111-429`, FeatureDetectorType, ByteTrack).
        alts = [
            ("frontend ORB detector",
             'feature_detector_type="orb"', ""),
            ("frontend 2d2d essential ego",
             "", 'ego_motion_solver="2d2d"'),
            ("frontend 3d3d Arun ego",
             "", 'ego_motion_solver="3d3d"'),
            ("frontend ByteTrack association",
             "use_byte_tracker=True", ""),
        ]
        for label, tracker_kw, frontend_kw in alts:
            snippet = ALT_SNIPPET.replace("{tracker_kw}", tracker_kw
                                          ).replace("{frontend_kw}",
                                                    frontend_kw)
            run({}, snippet, label)


if __name__ == "__main__":
    main()
