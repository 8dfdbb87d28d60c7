"""Batched (vmapped) window solving: quality parity with the sequential
sliding-window backend."""

import jax.numpy as jnp
import numpy as np

from dynosam_tpu.backend.backend import RGBDBackend
from dynosam_tpu.backend.batch_windows import solve_all_windows, window_starts
from dynosam_tpu.backend.map import MeasurementMap, update_map
from dynosam_tpu.backend.solver import LMConfig
from dynosam_tpu.core import lie
from dynosam_tpu.testing.simulator import Scenario, ScenarioConfig
from dynosam_tpu.utils.config import BackendConfig, CapacityConfig


def test_window_starts():
    assert window_starts(12, 6, 2) == [0, 4, 6]  # tail covered
    assert window_starts(10, 10, 4) == [0]
    assert window_starts(20, 10, 4) == [0, 6, 10]  # tail window at 10


def test_batched_windows_match_sequential_quality():
    scfg = ScenarioConfig(n_frames=14)
    sc = Scenario(scfg)
    cfg = BackendConfig(
        opt_window_size=6, opt_window_overlap=2,
        lm_max_iterations=15, cg_max_iterations=150,
    )
    m = MeasurementMap.create(scfg.n_frames, scfg.ns, scfg.nd, scfg.no)
    for k, pkt in enumerate(sc.frontend_outputs()):
        m = update_map(m, pkt, k)

    est, errors, init_errors, starts = solve_all_windows(
        m, scfg.n_frames, cfg,
        LMConfig(max_iterations=15, cg_max_iterations=150),
    )
    assert (errors < 0.05 * init_errors).all()
    assert bool(np.asarray(est["X_valid"]).all())

    # camera quality: relative drift vs GT
    rel_est = lie.se3_between(est["X"][0], est["X"][scfg.n_frames - 1])
    rel_gt = lie.se3_between(sc.X_gt[0], sc.X_gt[scfg.n_frames - 1])
    drift = np.asarray(lie.se3_local(rel_gt, rel_est))
    assert np.linalg.norm(drift[3:]) < 0.2, drift

    # motion quality: point-transfer error
    errs = []
    hv = np.asarray(est["H_valid"])
    for j in range(scfg.n_objects):
        for k in range(1, scfg.n_frames):
            if hv[k, j]:
                prev = sc.obj_points_w[j][k - 1]
                cur = np.asarray(sc.obj_points_w[j][k])
                moved = np.asarray(
                    lie.se3_apply(est["H"][k, j], prev)
                )
                errs.append(np.linalg.norm(moved - cur, axis=-1).mean())
    assert len(errs) > 10
    assert np.median(errs) < 0.08, np.median(errs)
