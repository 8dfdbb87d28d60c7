"""Distortion model tests: inverse consistency + cv2 cross-check."""

import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.core.camera import CameraParams
from dynosam_tpu.core.distortion import (
    Distortion,
    distort_points,
    remap_bilinear,
    undistort_points,
    undistort_rectify_map,
)


@pytest.fixture
def cam():
    return CameraParams.create(320.0, 320.0, 320.0, 240.0, 640, 480)


def test_radtan_roundtrip(cam, rng):
    d = Distortion(jnp.asarray([-0.28, 0.07, 1e-4, -2e-4], jnp.float32))
    uv = jnp.asarray(rng.uniform(100, [540, 380], size=(200, 2)), jnp.float32)
    distorted = distort_points(uv, cam, d)
    undone = undistort_points(distorted, cam, d)
    np.testing.assert_allclose(np.asarray(undone), np.asarray(uv), atol=0.05)


def test_radtan_matches_cv2(cam, rng):
    cv2 = pytest.importorskip("cv2")
    d = np.array([-0.28, 0.07, 1e-4, -2e-4], np.float32)
    K = np.array([[320.0, 0, 320.0], [0, 320.0, 240.0], [0, 0, 1]])
    uv = rng.uniform(100, [540, 380], size=(50, 2)).astype(np.float32)
    # cv2.projectPoints distorts ideal points
    ideal = np.concatenate(
        [(uv - [320, 240]) / 320.0, np.ones((50, 1), np.float32)], axis=1
    )
    proj, _ = cv2.projectPoints(
        ideal.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), K, d
    )
    ours = distort_points(
        jnp.asarray(uv), cam, Distortion(jnp.asarray(d))
    )
    np.testing.assert_allclose(
        np.asarray(ours), proj.reshape(-1, 2), atol=0.05
    )


def test_equidistant_roundtrip(cam, rng):
    d = Distortion(
        jnp.asarray([-0.01, 0.02, -0.005, 0.001], jnp.float32),
        model="equidistant",
    )
    uv = jnp.asarray(rng.uniform(150, [500, 350], size=(100, 2)), jnp.float32)
    distorted = distort_points(uv, cam, d)
    undone = undistort_points(distorted, cam, d, iters=12)
    np.testing.assert_allclose(np.asarray(undone), np.asarray(uv), atol=0.1)


def test_rectify_map_and_remap(cam):
    d = Distortion(jnp.asarray([-0.1, 0.01, 0.0, 0.0], jnp.float32))
    mapping = undistort_rectify_map(cam, d)
    assert mapping.shape == (480, 640, 2)
    # identity distortion -> identity map
    d0 = Distortion(jnp.zeros(4, jnp.float32))
    m0 = undistort_rectify_map(cam, d0)
    yy, xx = np.meshgrid(np.arange(480), np.arange(640), indexing="ij")
    np.testing.assert_allclose(np.asarray(m0[..., 0]), xx, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m0[..., 1]), yy, atol=1e-3)
    # remap with identity map reproduces the image
    img = jnp.arange(480.0 * 640.0, dtype=jnp.float32).reshape(480, 640)
    out = remap_bilinear(img, m0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-2)
