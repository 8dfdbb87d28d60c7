#!/usr/bin/env python
"""Device-trace profile of the backend window-10 direct-Schur solve.

Same xplane protocol as trace_frontend.py (chained-rep microbenches are
tunnel-floor dominated; only the device trace gives per-op truth).  Runs
the production `optimize_window_jit` problem from bench.py several times
under `jax.profiler` and bins device-plane op durations by fusion-name
prefix.

Usage: python scripts/trace_backend.py [reps] [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from trace_frontend import parse


def run_traced(out_dir, reps, formulation=0):
    from dynosam_tpu.backend.backend import optimize_window_jit
    from dynosam_tpu.backend.map import MeasurementMap, update_map
    from dynosam_tpu.backend.solver import LMConfig
    from dynosam_tpu.core.lie import se3_identity
    from dynosam_tpu.testing.simulator import Scenario, ScenarioConfig
    from dynosam_tpu.utils.config import BackendConfig

    scfg = ScenarioConfig(
        n_frames=10, n_static=800, n_objects=4, pts_per_object=200,
        ns=1024, nd=1024, no=8,
    )
    sc = Scenario(scfg)
    m = MeasurementMap.create(10, 1024, 1024, 8)
    for k, pkt in enumerate(sc.frontend_outputs()):
        m = update_map(m, pkt, k)
    bcfg = BackendConfig(lm_max_iterations=10, backend_updater_enum=formulation)
    lm_cfg = LMConfig(max_iterations=10)
    anchor = se3_identity((), jnp.float32)
    args = (m, 0, 10, bcfg, lm_cfg, anchor, jnp.asarray(False), formulation)
    res, _ = optimize_window_jit(*args)  # compile
    float(res.error)                     # fetch barrier
    jax.profiler.start_trace(out_dir)
    for _ in range(reps):
        res, _ = optimize_window_jit(*args)
    float(res.error)                     # fetch barrier INSIDE the trace
    jax.profiler.stop_trace()
    print(
        f"traced {reps} solves ({int(res.iterations)} LM iters each, "
        f"final err {float(res.error):.3f})",
        file=sys.stderr,
    )
    return reps


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dyno_trace_backend"
    formulation = int(os.environ.get("DYNO_TRACE_FORMULATION", "0"))
    n = run_traced(out_dir, reps, formulation)
    # per-"frame-ish" divisor = reps, so the table prints ms per solve
    parse(out_dir, n, top_individual=30)


if __name__ == "__main__":
    main()
