#!/usr/bin/env python
"""Backend solver benchmarks on the real TPU (fetch-barrier protocol).

Measures the batched-window regime (all windows of a 128-frame sequence
vmapped into one program) for both solvers at a fixed LM budget and to
convergence — the table BENCH_NOTES tracks — plus compile times.

Usage: python scripts/bench_backend.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dynosam_tpu.backend.batch_windows import _solve_windows, window_starts
    from dynosam_tpu.backend.map import MeasurementMap, update_map
    from dynosam_tpu.backend.solver import LMConfig
    from dynosam_tpu.testing.simulator import Scenario, ScenarioConfig
    from dynosam_tpu.utils.config import BackendConfig

    scfg = ScenarioConfig(
        n_frames=128, n_static=800, n_objects=4, pts_per_object=200,
        ns=1024, nd=1024, no=8,
    )
    sc = Scenario(scfg)
    m = MeasurementMap.create(128, 1024, 1024, 8)
    for k, pkt in enumerate(sc.frontend_outputs()):
        m = update_map(m, pkt, k)
    starts = jnp.asarray(window_starts(128, 10, 4), jnp.int32)
    n_win = starts.shape[0]
    print(f"{n_win} windows of a 128-frame sequence", file=sys.stderr)

    def run(tag, use_schur, iters, reps=3):
        cfg = BackendConfig(use_full_batch_opt=False, use_schur=use_schur)
        lm_cfg = LMConfig(max_iterations=iters)
        t0 = time.perf_counter()
        vals, err, ierr, masks = _solve_windows(m, starts, 10, cfg, lm_cfg)
        e = float(np.asarray(err).sum())       # fetch barrier
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            vals, err, ierr, masks = _solve_windows(m, starts, 10, cfg, lm_cfg)
        errs = np.asarray(err)                 # fetch barrier
        dt = (time.perf_counter() - t0) / reps / n_win
        print(
            f"{tag:28s} {dt*1e3:7.1f} ms/window  median final err "
            f"{np.median(errs):.3f}  (compile {compile_s:.0f}s)",
            flush=True,
        )

    run("schur 10 LM iters", True, 10)
    run("schur converged (<=40)", True, 40)
    run("pcg   10 LM iters", False, 10)
    run("pcg   converged (<=40)", False, 40)
    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
