"""VarPro elimination unit tests: the closed-form landmark solves must
reproduce ground truth given true poses/motions (the optimization-level
integration is experimental, default off)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.backend import formulation as fm
from dynosam_tpu.backend import varpro
from dynosam_tpu.backend.map import MeasurementMap, slice_window, update_map
from dynosam_tpu.core.lie import SE3
from dynosam_tpu.testing.simulator import Scenario, ScenarioConfig
from dynosam_tpu.utils.config import BackendConfig


def make_problem(point_noise=0.0):
    scfg = ScenarioConfig(
        n_frames=8, n_static=30, n_objects=2, pts_per_object=10,
        ns=40, nd=32, no=4, point_noise=point_noise,
        odom_rot_noise=0.0, odom_trans_noise=0.0,
    )
    sc = Scenario(scfg)
    m = MeasurementMap.create(8, 40, 32, 4)
    for k, pkt in enumerate(sc.frontend_outputs()):
        m = update_map(m, pkt, k)
    w = slice_window(m, 0, 8)
    cfg = BackendConfig()
    masks = fm.build_masks(w, cfg)
    return sc, scfg, w, masks, cfg


def gt_values(sc, scfg, w):
    X = sc.X_gt
    R = jnp.stack([sc.H_gt[j][1].R for j in range(scfg.n_objects)])
    t = jnp.stack([sc.H_gt[j][1].t for j in range(scfg.n_objects)])
    # (W, O) constant motions; identity row 0 handled by masks
    HR = jnp.tile(R[None], (scfg.n_frames, 1, 1, 1))
    Ht = jnp.tile(t[None], (scfg.n_frames, 1, 1))
    pad_R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (scfg.n_frames, 2, 1, 1))
    pad_t = jnp.zeros((scfg.n_frames, 2, 3), jnp.float32)
    H = SE3(
        jnp.concatenate([HR, pad_R], axis=1),
        jnp.concatenate([Ht, pad_t], axis=1),
    )
    return X, H


def test_optimal_static_points_exact():
    sc, scfg, w, masks, cfg = make_problem(point_noise=0.0)
    X, H = gt_values(sc, scfg, w)
    sp = varpro.optimal_static_points(X, w, masks)
    np.testing.assert_allclose(
        np.asarray(sp[: scfg.n_static]), np.asarray(sc.static_w), atol=1e-3
    )


def test_optimal_dynamic_points_exact():
    sc, scfg, w, masks, cfg = make_problem(point_noise=0.0)
    X, H = gt_values(sc, scfg, w)
    obj_idx = jnp.clip(w.dyn_obj, 0, 3)
    H_all = SE3(
        jnp.take_along_axis(H.R, obj_idx[..., None, None], axis=1),
        jnp.take_along_axis(H.t, obj_idx[..., None], axis=1),
    )
    dp = varpro.optimal_dynamic_points(X, H_all, w, masks, cfg)
    P = scfg.pts_per_object
    for j in range(scfg.n_objects):
        sl = slice(j * P, (j + 1) * P)
        est = np.asarray(dp[:, sl])
        gt = np.asarray(sc.obj_points_w[j])
        ok = np.asarray(masks.dyn_obs[:, sl])
        err = np.linalg.norm(est - gt, axis=-1)[ok]
        assert err.max() < 5e-3, (j, err.max())


def test_optimal_dynamic_points_noise_robust():
    sc, scfg, w, masks, cfg = make_problem(point_noise=0.02)
    X, H = gt_values(sc, scfg, w)
    obj_idx = jnp.clip(w.dyn_obj, 0, 3)
    H_all = SE3(
        jnp.take_along_axis(H.R, obj_idx[..., None, None], axis=1),
        jnp.take_along_axis(H.t, obj_idx[..., None], axis=1),
    )
    dp = varpro.optimal_dynamic_points(X, H_all, w, masks, cfg)
    P = scfg.pts_per_object
    est = np.asarray(dp[:, : scfg.n_objects * P])
    ok = np.asarray(masks.dyn_obs[:, : scfg.n_objects * P])
    gt = np.concatenate(
        [np.asarray(sc.obj_points_w[j]) for j in range(scfg.n_objects)], axis=1
    )
    err = np.linalg.norm(est - gt, axis=-1)[ok]
    # chain-averaged: error well below raw per-observation noise
    assert np.median(err) < 0.02
    assert np.isfinite(est).all()
