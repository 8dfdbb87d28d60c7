"""Multi-process dryrun worker: one process of an N-host distributed solve.

Run as `python -m dynosam_tpu.parallel.mp_worker --process-id I
--num-processes N --port P --out FILE`.  Each process:

  1. forces the CPU platform (1 local device) and joins the
     `jax.distributed` cluster — the process-boundary analog of a real
     multi-host TPU pod, runnable without hardware (SURVEY §4 "multi-node");
  2. builds the SAME deterministic scenario, keeps only its own
     `local_frame_range` keyframe block, and feeds it through
     `jax.make_array_from_process_local_data` (host-local data loading);
  3. runs the frame-sharded SPIKE direct-Schur solve over the global
     DCN-aware mesh (`multihost.global_mesh`);
  4. compares against the single-process solve computed redundantly on its
     local device and writes a JSON verdict.

In f64 (default) the two paths agree to ~1e-6 — reduction order is the
only difference; looser f32 bands would hide real bugs (VERDICT r2 weak 6).
"""

from __future__ import annotations

import argparse
import json


def run_worker(
    process_id: int,
    num_processes: int,
    port: int,
    out_path: str | None,
    window: int = 8,
    updater: int = 0,
    x64: bool = True,
) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    if x64:
        jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from ..backend import formulation as fm
    from ..backend.map import MeasurementMap, slice_window, update_map
    from ..backend.schur import lm_optimize_schur
    from ..backend.solver import LMConfig
    from ..testing.simulator import Scenario, ScenarioConfig
    from ..utils.config import BackendConfig
    from . import multihost
    from .schur_dist import distributed_schur_optimize

    assert jax.process_count() == num_processes

    scfg = ScenarioConfig(
        n_frames=window, n_static=48, n_objects=2, pts_per_object=24,
        ns=64, nd=64, no=4,
    )
    sc = Scenario(scfg)
    m = MeasurementMap.create(window, 64, 64, 4)
    for k, pkt in enumerate(sc.frontend_outputs()):
        m = update_map(m, pkt, k)
    if x64:
        m = jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            m,
        )

    cfg = BackendConfig(backend_updater_enum=updater)
    lm_cfg = LMConfig(max_iterations=4)

    # ---- reference: single-process direct solve on the local device ------
    w = slice_window(m, 0, window)
    masks = fm.build_masks(w, cfg)
    if updater == 0:
        values = fm.init_values(w, masks, cfg)
    else:
        values = fm.init_values_world_pose(w, masks, cfg)
    ref = jax.jit(
        lambda v: lm_optimize_schur(
            v, w, masks, cfg, lm_cfg, w.X_init[0], formulation=updater
        )
    )(values)
    ref_Xt = np.asarray(ref.values["X"].t)
    ref_err = float(ref.error)

    # ---- distributed: global mesh + host-local feeding -------------------
    mesh = multihost.global_mesh()
    lo, hi = multihost.local_frame_range(mesh, window)
    m_local = jax.tree.map(lambda a: np.asarray(a)[lo:hi], m)
    m_global = multihost.feed_measurement_map(m_local, mesh)
    res = distributed_schur_optimize(
        m_global, window, cfg, mesh=mesh, updater=updater, lm_cfg=lm_cfg
    )
    dist_Xt = np.asarray(
        multihost_utils.process_allgather(res.values["X"].t, tiled=True)
    )
    dist_err = float(
        np.asarray(
            multihost_utils.process_allgather(res.error, tiled=True)
        ).ravel()[0]
    )

    max_dx = float(np.max(np.abs(dist_Xt - ref_Xt)))
    derr = abs(dist_err - ref_err) / max(ref_err, 1e-30)
    # Both updaters route through _optimize_schur_explicit (default
    # DYNO_DIST_GSPMD=0); WorldPose (updater 1) gets the wider tolerance
    # because its explicit path's SPIKE interface solve uses the generic
    # 6x6 block elimination (spike_chain_solve_local alpha mode), which
    # carries ~1e-8 relative f64 error at the motion-pose conditioning
    # T/c ~ 1e8 (see test_multiprocess) — a few 1e-6 of translation
    # spread after 4 LM iterations is its floor.
    tol = (1e-6 if updater == 0 else 2e-5) if x64 else 2e-2
    verdict = {
        "process_id": process_id,
        "num_processes": num_processes,
        "n_devices": len(jax.devices()),
        "updater": updater,
        "x64": x64,
        "ref_error": ref_err,
        "dist_error": dist_err,
        "max_abs_dX_t": max_dx,
        "rel_derr": derr,
        "ok": bool(max_dx < tol and derr < tol if x64 else derr < 1e-3),
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(verdict, f)
    return verdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--updater", type=int, default=0)
    ap.add_argument("--f32", action="store_true")
    a = ap.parse_args()
    v = run_worker(
        a.process_id, a.num_processes, a.port, a.out,
        window=a.window, updater=a.updater, x64=not a.f32,
    )
    print(json.dumps(v), flush=True)


if __name__ == "__main__":
    main()
