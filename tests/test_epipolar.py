"""2d2d essential-matrix solver tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.core import camera as cam_mod
from dynosam_tpu.core import lie
from dynosam_tpu.ops import epipolar


def make_pair(rng, n=120, outliers=0):
    cam = cam_mod.CameraParams.create(320.0, 320.0, 320.0, 240.0, 640, 480)
    # relative motion with meaningful translation
    rel = lie.se3_exp(
        jnp.asarray([0.02, -0.03, 0.01, 0.3, 0.05, 0.1], jnp.float32)
    )
    uv1 = jnp.asarray(rng.uniform(60, [580, 420], size=(n, 2)), jnp.float32)
    depth = jnp.asarray(rng.uniform(4, 30, size=(n,)), jnp.float32)
    p_c1 = cam_mod.backproject(cam, uv1, depth)
    # x2 = R x1 + t with (R, t) = rel
    p_c2 = lie.se3_apply(rel, p_c1)
    uv2, _ = cam_mod.project_local(cam, p_c2)
    uv2 = uv2 + jnp.asarray(rng.normal(size=(n, 2)) * 0.2, jnp.float32)
    if outliers:
        idx = rng.choice(n, outliers, replace=False)
        uv2 = uv2.at[idx].add(
            jnp.asarray(rng.uniform(30, 100, size=(outliers, 2)), jnp.float32)
        )
    else:
        idx = np.array([], int)
    return cam, rel, uv1, uv2, idx


def test_essential_exact(rng):
    cam, rel, uv1, uv2, _ = make_pair(rng)
    p = epipolar.normalize_points(cam, uv1)
    q = epipolar.normalize_points(cam, uv2)
    E = epipolar.essential_from_points(p, q)
    err = epipolar.sampson_error(E, p, q)
    assert float(jnp.median(err)) < 1e-6


def test_ransac_essential_with_outliers(rng):
    cam, rel, uv1, uv2, out_idx = make_pair(rng, outliers=30)
    res = epipolar.ransac_essential(
        jax.random.PRNGKey(0), uv1, uv2, jnp.ones(uv1.shape[0], bool), cam,
        iters=300, threshold=2e-6,
    )
    assert int(res.n_inliers) >= 80
    # the epipolar constraint is 1-D: outliers displaced along their
    # epipolar line are geometrically indistinguishable, so allow a few
    assert np.asarray(res.inliers)[out_idx].sum() <= 8
    # recovered rotation close to GT; translation direction matches
    R_err = lie.so3_log(
        jnp.einsum("ij,jk->ik", jnp.swapaxes(rel.R, -1, -2), res.rel_pose.R)
    )
    assert np.linalg.norm(np.asarray(R_err)) < 0.01
    t_gt = np.asarray(rel.t) / np.linalg.norm(np.asarray(rel.t))
    t_est = np.asarray(res.rel_pose.t)
    assert abs(float(t_gt @ t_est)) > 0.97


def test_two_point_given_rotation(rng):
    """2-pt translation-only solver with the true rotation recovers the
    translation direction (MotionSolver.cc 2-pt mono mode analog)."""
    cam, rel, uv1, uv2, out_idx = make_pair(rng, outliers=20)
    res = epipolar.ransac_translation_given_rot(
        jax.random.PRNGKey(1), uv1, uv2, jnp.ones(uv1.shape[0], bool), cam,
        rel.R, iters=300, threshold=2e-6,
    )
    assert int(res.n_inliers) >= 80
    t_gt = np.asarray(rel.t) / np.linalg.norm(np.asarray(rel.t))
    t_est = np.asarray(res.rel_pose.t)
    # cheirality voting fixes the sign
    assert float(t_gt @ t_est) > 0.97
    np.testing.assert_allclose(np.asarray(res.rel_pose.R), np.asarray(rel.R))


def test_scale_from_depth(rng):
    """Triangulated-vs-measured depth recovers the metric baseline scale."""
    cam, rel, uv1, uv2, _ = make_pair(rng)
    depth1 = np.asarray(
        cam_mod.backproject(cam, uv1, jnp.ones(uv1.shape[0]))
    )  # direction only; recompute actual depths
    # re-derive the GT depths used by make_pair via projection geometry:
    # triangulate with the unit-scaled pose and compare
    t_norm = float(np.linalg.norm(np.asarray(rel.t)))
    rel_unit = lie.SE3(rel.R, rel.t / t_norm)
    p = epipolar.normalize_points(cam, uv1)
    q = epipolar.normalize_points(cam, uv2)
    lam_unit = epipolar.triangulate_depth_ref(rel_unit, p, q)
    # measured depth = lam under the TRUE scale
    lam_true = epipolar.triangulate_depth_ref(rel, p, q)
    scale, ok = epipolar.scale_from_depth(
        rel_unit, p, q, lam_true, jnp.ones(p.shape[0], bool)
    )
    assert bool(ok)
    np.testing.assert_allclose(float(scale), t_norm, rtol=2e-3)
