#!/usr/bin/env python
"""LM schedule probe (CPU, hardware-independent).

Runs the window-10 Schur solve over all windows of the 128-frame synthetic
scenario and reports final error / iteration counts.  Used to A/B the
lambda NaN-ratchet (DYNO_SCHUR_NAN_RATCHET) against the plain NaN-reject
schedule — set the env var BEFORE launching (module-level flag).

Usage: env JAX_PLATFORMS=cpu DYNO_SCHUR_NAN_RATCHET={0,1} python scripts/probe_lm.py
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

    retry = os.environ.get("DYNO_SCHUR_NAN_RATCHET", "1")
    scfg = ScenarioConfig(
        n_frames=128, n_static=800, n_objects=4, pts_per_object=200,
        ns=1024, nd=1024, no=8,
    )
    sc = Scenario(scfg)
    m = MeasurementMap.create(128, 1024, 1024, 8)
    for k, pkt in enumerate(sc.frontend_outputs()):
        m = update_map(m, pkt, k)
    starts = jnp.asarray(window_starts(128, 10, 4), jnp.int32)
    cfg = BackendConfig(use_full_batch_opt=False, use_schur=True)
    lm_cfg = LMConfig(max_iterations=int(os.environ.get("DYNO_PROBE_ITERS", "10")))
    t0 = time.perf_counter()
    vals, err, ierr, masks = _solve_windows(m, starts, 10, cfg, lm_cfg)
    errs = np.asarray(err)
    dt = time.perf_counter() - t0
    print(
        f"iters={lm_cfg.max_iterations} nan_ratchet={retry}: median err {np.median(errs):.4f}  "
        f"mean {errs.mean():.4f}  max {errs.max():.4f}  "
        f"(init median {np.median(np.asarray(ierr)):.2f}; {dt:.1f}s total)"
    )


if __name__ == "__main__":
    main()
