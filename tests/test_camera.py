"""Camera model tests (analog of reference `test_camera.cc`)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.core import camera as cam
from dynosam_tpu.core import lie


def make_params():
    return cam.CameraParams.create(fx=320.0, fy=320.0, cx=320.0, cy=240.0,
                                   width=640, height=480)


def test_project_backproject_roundtrip(rng):
    p = make_params()
    uv = jnp.asarray(rng.uniform(0, [640, 480], size=(100, 2)), jnp.float32)
    depth = jnp.asarray(rng.uniform(1.0, 30.0, size=(100,)), jnp.float32)
    pts = cam.backproject(p, uv, depth)
    uv2, z = cam.project_local(p, pts)
    np.testing.assert_allclose(uv, uv2, atol=1e-3)
    np.testing.assert_allclose(depth, z, atol=1e-5)


def test_project_world_roundtrip(rng):
    p = make_params()
    pose = lie.se3_exp(jnp.asarray(rng.normal(size=(6,)) * 0.3, jnp.float32))
    uv = jnp.asarray(rng.uniform(50, [600, 400], size=(50, 2)), jnp.float32)
    depth = jnp.asarray(rng.uniform(2.0, 20.0, size=(50,)), jnp.float32)
    pw = cam.backproject_to_world(p, uv, depth, pose)
    uv2, z = cam.project(p, pose, pw)
    np.testing.assert_allclose(uv, uv2, atol=1e-2)
    np.testing.assert_allclose(depth, z, atol=1e-4)


def test_projection_point_jacobian(rng):
    p = make_params()
    pts = jnp.asarray(rng.uniform([-5, -5, 2], [5, 5, 30], size=(20, 3)), jnp.float32)
    J_analytic = cam.project_jacobian_point(p, pts)
    J_ad = jax.vmap(jax.jacfwd(lambda x: cam.project_local(p, x)[0]))(pts)
    np.testing.assert_allclose(J_analytic, J_ad, rtol=1e-4, atol=1e-5)


def test_projection_pose_jacobian_matches_ad(rng):
    """Pose jacobian of uv = pi((X Exp(xi))^-1 p_w) at xi=0."""
    p = make_params()
    pose = lie.se3_exp(jnp.asarray(rng.normal(size=(6,)) * 0.2, jnp.float32))
    p_w = jnp.asarray(rng.uniform([-5, -5, 5], [5, 5, 25], size=(10, 3)), jnp.float32)

    def proj(xi, pw):
        X = lie.se3_retract(pose, xi)
        return cam.project(p, X, pw)[0]

    J_ad = jax.vmap(lambda pw: jax.jacfwd(lambda xi: proj(xi, pw))(jnp.zeros(6, jnp.float32)))(p_w)
    p_cam = lie.se3_apply(lie.se3_inverse(pose), p_w)
    J_an = cam.project_jacobian_pose(p, p_cam)
    np.testing.assert_allclose(J_an, J_ad, rtol=1e-3, atol=1e-3)


def test_in_image():
    p = make_params()
    uv = jnp.array([[0.0, 0.0], [639.0, 479.0], [640.0, 100.0], [-1.0, 5.0], [320, 240]])
    np.testing.assert_array_equal(
        cam.in_image(p, uv), [True, True, False, False, True]
    )


def test_disparity_to_depth():
    # reference KITTI conversion: d = baseline / (disp/scale)
    disp = jnp.array([256.0, 512.0, 0.0, -5.0])
    d = cam.disparity_to_depth(disp, fx_baseline=387.5744, scale=256.0)
    np.testing.assert_allclose(d[:2], [387.5744, 193.7872], rtol=1e-5)
    assert d[2] == 0.0 and d[3] == 0.0
