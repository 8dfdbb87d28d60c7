#!/usr/bin/env python
"""Sliding-window vs full-batch backend error comparison.

The analog of the reference's
`dynosam_utils/src/sliding_window_vs_batch_error_plot.py`: run the SAME
measurement stream through the backend twice — production sliding-window
mode and full-batch — and plot per-frame camera translation error (and
object motion error where GT is available) for both, plus a summary
table on stdout.

By default drives the synthetic simulator scenario (no dataset needed);
pass `--packets <dir>` to replay saved frontend packets instead
(`utils/serialization.py` format — GT curves are then omitted).

Usage:
  JAX_PLATFORMS=cpu python scripts/sliding_vs_batch.py --frames 24 \
      --out /tmp/sliding_vs_batch.pdf
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_backend(packets, cfg, cap):
    from dynosam_tpu.backend.backend import RGBDBackend

    be = RGBDBackend(cfg, cap)
    for p in packets:
        be.spin(p)
    be.finish()
    return be


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--window", type=int, default=10)
    ap.add_argument("--overlap", type=int, default=4)
    ap.add_argument("--out", default="sliding_vs_batch.pdf")
    ap.add_argument("--packets", default=None,
                    help="replay saved frontend packets instead")
    args = ap.parse_args()

    import jax

    from dynosam_tpu.core import lie
    from dynosam_tpu.utils.config import BackendConfig, CapacityConfig

    if args.packets:
        from dynosam_tpu.utils.serialization import load_packets

        packets = load_packets(args.packets)
        gt = None
        cap = CapacityConfig(max_frames=len(packets))
    else:
        from dynosam_tpu.testing.simulator import Scenario, ScenarioConfig

        scfg = ScenarioConfig(n_frames=args.frames)
        sc = Scenario(scfg)
        packets = sc.frontend_outputs()
        gt = sc
        cap = CapacityConfig(
            max_static_tracks=scfg.ns, max_dynamic_tracks=scfg.nd,
            max_objects=scfg.no, max_frames=scfg.n_frames,
        )

    runs = {}
    for name, cfg in [
        (
            "sliding-window",
            BackendConfig(
                use_full_batch_opt=False,
                opt_window_size=args.window,
                opt_window_overlap=args.overlap,
            ),
        ),
        ("full-batch", BackendConfig(use_full_batch_opt=True)),
    ]:
        be = run_backend(packets, cfg, cap)
        X, xv = be.camera_poses()
        runs[name] = (X, np.asarray(xv))
        print(f"{name}: final error {float(be.last_result.error):.4f} "
              f"(initial {float(be.last_result.initial_error):.1f})")

    # per-frame camera translation error vs GT (simulator runs only)
    curves = {}
    for name, (X, xv) in runs.items():
        errs = []
        for k in range(len(packets)):
            if not xv[k] or gt is None:
                errs.append(np.nan)
                continue
            e = np.asarray(
                lie.se3_local(gt.X_gt[k], jax.tree.map(lambda a: a[k], X))
            )
            errs.append(float(np.linalg.norm(e[3:])))
        curves[name] = np.asarray(errs)
        if gt is not None:
            v = curves[name][~np.isnan(curves[name])]
            print(f"{name}: ATE trans mean {v.mean():.4f} m, max {v.max():.4f} m")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4))
    for name, c in curves.items():
        ax.plot(c, label=name)
    ax.set_xlabel("frame")
    ax.set_ylabel("camera translation error (m)")
    ax.set_title("sliding-window vs full-batch backend error")
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
