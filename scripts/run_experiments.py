#!/usr/bin/env python
"""Experiment sweep runner.

The analog of the reference's `eval_launch.py` -> `runner.py` +
`run_experiments_tro.py` / `run_backends.py` sweep drivers: run the full
pipeline over one or more (dataset, config-override) combinations, write
the CSV logs, evaluate, and emit `results.json` + `results.pdf` per run.

Usage:
  python scripts/run_experiments.py --dataset_path /data/kitti/0004 \
      --data_provider_type 0 --output_path /tmp/out --name kitti0004 \
      --set backend.opt_window_size=20 --set backend.use_full_batch_opt=true

Any `--set group.key=value` overrides a DynoConfig field (the gflags
passthrough of the reference's runner).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_value(v: str):
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        return v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_path", required=True)
    ap.add_argument("--data_provider_type", type=int, default=0)
    ap.add_argument("--output_path", required=True)
    ap.add_argument("--name", default="run")
    ap.add_argument("--starting_frame", type=int, default=-1)
    ap.add_argument("--ending_frame", type=int, default=-1)
    ap.add_argument("--params_yaml", default=None)
    ap.add_argument("--no_backend", action="store_true")
    ap.add_argument("--use_flow_tracking", action="store_true",
                    help="use precomputed dense flow instead of KLT")
    ap.add_argument("--set", action="append", default=[],
                    help="config override group.key=value")
    args = ap.parse_args()

    from dynosam_tpu.data.factory import create_dataset
    from dynosam_tpu.eval.evaluator import evaluate_all
    from dynosam_tpu.eval.plotting import make_report
    from dynosam_tpu.pipeline import run_and_log
    from dynosam_tpu.utils.config import load_config

    overrides = {}
    for s in args.set:
        k, v = s.split("=", 1)
        overrides[k] = parse_value(v)
    if args.no_backend:
        overrides["pipeline.use_backend"] = False
    cfg = load_config(args.params_yaml, overrides)

    ds = create_dataset(
        args.data_provider_type,
        args.dataset_path,
        starting_frame=args.starting_frame,
        ending_frame=args.ending_frame,
    )
    out_dir = os.path.join(args.output_path, args.name)
    result = run_and_log(ds, cfg, out_dir, use_klt=not args.use_flow_tracking)
    print(f"pipeline done: {result.fps:.2f} frames/s")

    results = evaluate_all(out_dir)
    pdf = make_report(out_dir, results)
    from dynosam_tpu.eval.plotting import write_result_tables

    tex = write_result_tables(out_dir, results)
    print(json.dumps(results, indent=2, default=float))
    print(f"report: {pdf}")
    print(f"tables: {tex}")


if __name__ == "__main__":
    main()
