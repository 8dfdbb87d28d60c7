#!/usr/bin/env python
"""Latency-free scaling figure for the distributed window BA (VERDICT r4 #5).

The CPU/Gloo N-process harness (`scaling_efficiency.py`) is collective-
LATENCY bound (~ms per Gloo collective), so its 0.363 N=2 efficiency
measures the transport, not the algorithm.  This harness removes the
transport entirely and replaces it with a measured-bytes analytic model:

1. **Single-process virtual mesh** (jax_num_cpu_devices=8): all N devices
   live in one process, collectives are shared-memory memcpys.  Run with
   XLA_FLAGS=--xla_cpu_multi_thread_eigen=false so every device program
   executes single-threaded and SERIALLY: wall time then measures the
   TOTAL WORK across devices, and T(N)/T(1) is the partitioned program's
   work ratio W(N)/W(1) — replicated pose-family compute, frame-
   replicated static builds, ghost-row recompute, and memcpy collectives.
   (Without the flag the N=1 program grabs all host cores and the ratio
   is confounded by scheduling.)

2. **Analytic ICI projection**: per-iteration collective bytes are read
   from the COMPILED HLO of each N (scripts/collective_census.py
   machinery — the same program the pod would run), and pod efficiency is

       eff(N) = T1 / (N * (T1 * W(N)/W(1) / N + t_comm(N)))
       t_comm(N) = lm_iters * (sum(bytes)/BW_ici + n_collectives * t_lat)

   with T1 the measured single-chip TPU window-solve time (BENCH_r*),
   ovh(N) the measured overhead ratio from (1), and conservative ICI
   constants (v5e: 45 GB/s usable per direction per link; 5 us/collective
   launch+sync).  Every input is measured except BW/latency, which are
   public hardware numbers.

Usage:
    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
        python scripts/scaling_1proc.py [--window 32] [--t1-ms 12.9]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--t1-ms", type=float, default=0.0,
                    help="measured single-chip TPU solve at THIS window "
                         "size (scripts/bench_backend.py); 0 = skip the "
                         "pod projection")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--bw-gbs", type=float, default=45.0,
                    help="usable ICI bandwidth per direction (v5e)")
    ap.add_argument("--lat-us", type=float, default=5.0,
                    help="per-collective launch+sync latency over ICI")
    a = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", max(a.devices))
    import numpy as np

    from dynosam_tpu.backend.map import MeasurementMap, update_map
    from dynosam_tpu.backend.solver import LMConfig
    from dynosam_tpu.parallel import schur_dist
    from dynosam_tpu.parallel.mesh import make_mesh, shard_map_data
    from dynosam_tpu.testing.simulator import Scenario, ScenarioConfig
    from dynosam_tpu.utils.config import BackendConfig

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from collective_census import census, collective_shapes

    window = a.window
    scfg = ScenarioConfig(
        n_frames=window, n_static=400, n_objects=4, pts_per_object=100,
        ns=512, nd=512, no=8,
    )
    sc = Scenario(scfg)
    m = MeasurementMap.create(window, 512, 512, 8)
    for k, pkt in enumerate(sc.frontend_outputs()):
        m = update_map(m, pkt, k)
    cfg = BackendConfig()
    lm_cfg = LMConfig(max_iterations=a.iters)

    rows = {}
    for n in a.devices:
        mesh = make_mesh(n)   # production shapes: 2->(2,1), 4->(2,2), 8->(4,2)
        m_sh = shard_map_data(m, mesh, layout="compute")
        fn = jax.jit(
            lambda mm: schur_dist._optimize_schur_sharded(
                mm, window, cfg, lm_cfg, 0, mesh
            ).error
        )
        compiled = fn.lower(m_sh).compile()
        err = float(np.asarray(compiled(m_sh)))          # settle
        t0 = time.perf_counter()
        for _ in range(a.reps):
            err = float(np.asarray(compiled(m_sh)))
        dt = (time.perf_counter() - t0) / a.reps
        txt = compiled.as_text()
        inside, outside, in_bytes = census(txt)
        n_coll = sum(inside.values())
        if n == 1:
            in_bytes = 0
        rows[n] = {
            "solve_s": dt, "error": err, "coll_per_iter": n_coll,
            "bytes_per_iter": in_bytes,
        }
        print(f"N={n}: {dt*1e3:.1f} ms/solve, err {err:.4f}, "
              f"{n_coll} coll/iter, {in_bytes/1e6:.2f} MB/iter",
              file=sys.stderr)

    t1 = rows[a.devices[0]]["solve_s"]
    t1_chip = a.t1_ms * 1e-3 if a.t1_ms else 0.0
    out = {
        "metric": "ba_scaling_efficiency_1proc",
        "window": window,
        "devices": a.devices,
        "solve_s": [round(rows[n]["solve_s"], 4) for n in a.devices],
        "overhead_ratio": {
            n: round(rows[n]["solve_s"] / t1, 3) for n in a.devices
        },
        "coll_per_iter": {n: rows[n]["coll_per_iter"] for n in a.devices},
        "bytes_per_iter": {n: rows[n]["bytes_per_iter"] for n in a.devices},
        "projected_pod_efficiency": {},
        "model": {
            "t1_chip_ms": a.t1_ms, "bw_GBps": a.bw_gbs,
            "lat_us_per_collective": a.lat_us, "lm_iters": a.iters,
        },
    }
    for n in a.devices:
        if n == 1 or not t1_chip:
            out["projected_pod_efficiency"][n] = 1.0 if t1_chip else None
            continue
        ovh = rows[n]["solve_s"] / t1
        t_comm = a.iters * (
            rows[n]["bytes_per_iter"] / (a.bw_gbs * 1e9)
            + rows[n]["coll_per_iter"] * a.lat_us * 1e-6
        )
        t_n = t1_chip * ovh / n + t_comm
        out["projected_pod_efficiency"][n] = round(t1_chip / (n * t_n), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
