"""Metrics + logger tests (analog of the reference's evaluation suite)."""

import os

import numpy as np

from dynosam_tpu.eval import metrics


def random_traj(rng, n=20, step=0.3):
    from scipy.spatial.transform import Rotation

    T = [np.eye(4)]
    for _ in range(n - 1):
        d = np.eye(4)
        d[:3, :3] = Rotation.from_rotvec(rng.normal(size=3) * 0.05).as_matrix()
        d[:3, 3] = [step, 0, 0.05]
        T.append(T[-1] @ d)
    return np.stack(T)


def test_ate_zero_for_identical(rng):
    gt = random_traj(rng)
    r = metrics.ate(gt, gt, align=False)
    assert r["trans"].rmse < 1e-9


def test_ate_alignment_removes_global_offset(rng):
    gt = random_traj(rng)
    from scipy.spatial.transform import Rotation

    G = np.eye(4)
    G[:3, :3] = Rotation.from_rotvec([0.3, -0.1, 0.2]).as_matrix()
    G[:3, 3] = [5.0, -3.0, 1.0]
    est = np.einsum("ij,njk->nik", G, gt)
    r_noalign = metrics.ate(est, gt, align=False)
    r_align = metrics.ate(est, gt, align=True)
    assert r_noalign["trans"].rmse > 1.0
    assert r_align["trans"].rmse < 1e-5


def test_rpe_detects_local_noise(rng):
    gt = random_traj(rng)
    est = gt.copy()
    est[:, :3, 3] += rng.normal(size=(gt.shape[0], 3)) * 0.01
    r = metrics.rpe(est, gt)
    assert 0.001 < r["trans"].rmse < 0.1


def test_ame_rme_zero_at_truth(rng):
    H = random_traj(rng, n=10, step=0.5)
    L = random_traj(rng, n=10, step=0.1)
    a = metrics.ame(H, H)
    assert a["trans"].rmse < 1e-9
    r = metrics.rme(H, H, L)
    assert r["trans"].rmse < 1e-9


def test_rme_object_frame_mapping(rng):
    """A pure-rotation motion error at distance produces the lever-arm
    translation in AME but RME maps it into the object frame."""
    n = 5
    H_gt = np.tile(np.eye(4), (n, 1, 1))
    H_est = H_gt.copy()
    # estimated motion has small rotation error about origin
    from scipy.spatial.transform import Rotation

    for i in range(n):
        H_est[i, :3, :3] = Rotation.from_rotvec([0, 0.01, 0]).as_matrix()
    L = np.tile(np.eye(4), (n, 1, 1))
    L[:, 0, 3] = 20.0  # object 20m from origin
    a = metrics.ame(H_est, H_gt)
    r = metrics.rme(H_est, H_gt, L)
    # identical rotation error in both
    np.testing.assert_allclose(a["rot"].rmse, r["rot"].rmse, rtol=1e-6)
    # RME translation sees the lever arm (error expressed at the object)
    assert r["trans"].rmse > 0.1


def test_logger_roundtrip(tmp_path, rng):
    from dynosam_tpu.utils.logger import EstimationLogger, read_pose_log

    gt = random_traj(rng, n=8)
    est = gt.copy()
    est[:, :3, 3] += 0.01
    log = EstimationLogger(str(tmp_path), "frontend")
    for k in range(8):
        log.log_camera_pose(k, est[k], gt[k])
        log.log_timestamp(k, k * 0.1)
    log.log_object_motion(1, 2, est[1], gt[1])
    log.log_object_pose(1, 2, est[1], gt[1])
    log.log_map_point(0, 7, np.array([1.0, 2.0, 3.0]))
    log.flush()

    frames, est2, gt2 = read_pose_log(
        os.path.join(str(tmp_path), "frontend_camera_pose_log.csv")
    )
    assert (frames == np.arange(8)).all()
    np.testing.assert_allclose(est2, est, atol=1e-6)
    np.testing.assert_allclose(gt2, gt, atol=1e-6)
    # evaluation over the logs
    r = metrics.ate(est2, gt2, align=False)
    assert 0.005 < r["trans"].rmse < 0.05


def test_report_pdf(tmp_path, rng):
    """End-to-end report: logs -> evaluate_all -> results.pdf."""
    from dynosam_tpu.eval.evaluator import evaluate_all
    from dynosam_tpu.eval.plotting import make_report
    from dynosam_tpu.utils.logger import EstimationLogger

    gt = random_traj(rng, n=10)
    est = gt.copy()
    est[:, :3, 3] += rng.normal(size=(10, 3)) * 0.02
    log = EstimationLogger(str(tmp_path), "frontend")
    for k in range(10):
        log.log_camera_pose(k, est[k], gt[k])
        log.log_timestamp(k, k * 0.1)
    log.log_object_motion(1, 2, est[1], gt[1])
    log.log_object_pose(1, 2, est[1], gt[1])
    log.flush()
    results = evaluate_all(str(tmp_path))
    assert "frontend" in results and "camera" in results["frontend"]
    pdf = make_report(str(tmp_path), results)
    assert os.path.exists(pdf) and os.path.getsize(pdf) > 1000


def test_results_table_and_aggregate(tmp_path, rng):
    from dynosam_tpu.eval.evaluator import evaluate_all
    from dynosam_tpu.eval.plotting import aggregate_runs, results_table_markdown
    from dynosam_tpu.utils.logger import EstimationLogger

    gt = random_traj(rng, n=6)
    for run in ["runA", "runB"]:
        d = tmp_path / run
        d.mkdir()
        log = EstimationLogger(str(d), "frontend")
        for k in range(6):
            log.log_camera_pose(k, gt[k], gt[k])
            log.log_timestamp(k, k * 0.1)
        log.flush()
        evaluate_all(str(d))
    summary = aggregate_runs(
        [str(tmp_path / "runA"), str(tmp_path / "runB")],
        str(tmp_path / "all.json"),
    )
    assert set(summary["runs"]) == {"runA", "runB"}
    table = summary["tables"]["runA"]
    assert "| frontend |" in table and "0.0000" in table
    assert os.path.exists(str(tmp_path / "all.json"))


def test_latex_result_tables(tmp_path, rng):
    """`result_tables.tex` emission (the reference's pylatex
    `result_tables.pdf`, `formatting_utils.py:62-210`)."""
    from dynosam_tpu.eval.evaluator import evaluate_all
    from dynosam_tpu.eval.plotting import results_table_latex, write_result_tables
    from dynosam_tpu.utils.logger import EstimationLogger

    gt = random_traj(rng, n=8)
    est = gt.copy()
    est[:, :3, 3] += rng.normal(size=(8, 3)) * 0.02
    log = EstimationLogger(str(tmp_path), "rgbd_backend")
    for k in range(8):
        log.log_camera_pose(k, est[k], gt[k])
        log.log_timestamp(k, k * 0.1)
    for k in range(1, 8):
        log.log_object_motion(k, 3, est[k], gt[k])
        log.log_object_pose(k, 3, est[k], gt[k])
    log.flush()
    results = evaluate_all(str(tmp_path))
    tex = results_table_latex(results)
    assert tex.startswith(r"\documentclass")
    assert tex.rstrip().endswith(r"\end{document}")
    assert r"rgbd\_backend" in tex
    assert r"\begin{tabular}{|c|cc|}" in tex       # camera ATE/RPE table
    assert r"\begin{tabular}{|c|cc|cc|}" in tex    # per-object AME/RME table
    assert "ATE &" in tex and "mean &" in tex
    # the logged object (id 3) has its own row
    assert "\n3 & " in tex
    path = write_result_tables(str(tmp_path), results)
    assert os.path.exists(path)
    assert open(path).read() == tex
