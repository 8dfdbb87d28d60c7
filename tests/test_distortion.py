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


def test_rectifier_pre_pass_recovers_frame(cam):
    """Full-frame rectification pre-pass (`frontend/rectify.py`): distort a
    structured frame synthetically, rectify, recover the original in the
    interior.  Flow is vector-corrected: a constant rectified motion c
    encoded in distorted space must come back as exactly c."""
    import jax

    from dynosam_tpu.frontend.frontend import FrameImages
    from dynosam_tpu.frontend.rectify import make_rectifier

    h, w = cam.height, cam.width
    d = Distortion(jnp.asarray([-0.15, 0.03, 0.0, 0.0], jnp.float32))

    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32), indexing="ij",
    )
    # smooth structured gray + piecewise depth + block mask
    gray = jnp.sin(xx * 0.05) * jnp.cos(yy * 0.07)
    depth = jnp.where(xx < w / 2, 5.0, 9.0)
    mask = jnp.where(
        (xx > w * 0.3) & (xx < w * 0.5) & (yy > h * 0.3) & (yy < h * 0.6),
        3, 0,
    ).astype(jnp.int32)

    # build the DISTORTED frame: dist(v) = orig(U(v)); then rectification
    # (which samples at M(u_r)) recovers orig because U(M(u)) == u
    grid = jnp.stack([xx, yy], -1).reshape(-1, 2)
    src = undistort_points(grid, cam, d)
    from dynosam_tpu.ops.klt import bilinear_sample

    gray_d = bilinear_sample(gray, src).reshape(h, w)
    sx = jnp.clip(jnp.round(src[:, 0]).astype(int), 0, w - 1)
    sy = jnp.clip(jnp.round(src[:, 1]).astype(int), 0, h - 1)
    depth_d = depth[sy, sx].reshape(h, w)
    mask_d = mask[sy, sx].reshape(h, w)

    # constant rectified motion c: flow_d(v) = D(U(v) + c) - v
    c = jnp.asarray([3.0, -2.0], jnp.float32)
    dest_d = distort_points(src + c, cam, d)
    flow_d = (dest_d - grid).reshape(h, w, 2)

    rectify = make_rectifier(cam, d)
    out = rectify(
        FrameImages(gray=gray_d, depth=depth_d, flow=flow_d, mask=mask_d)
    )

    # interior only: borders map outside the distorted frame
    sl = (slice(60, h - 60), slice(80, w - 80))
    np.testing.assert_allclose(
        np.asarray(out.gray[sl]), np.asarray(gray[sl]), atol=0.02
    )
    assert (
        np.mean(np.asarray(out.mask[sl]) == np.asarray(mask[sl])) > 0.995
    )
    match = np.isclose(
        np.asarray(out.depth[sl]), np.asarray(depth[sl]), atol=1e-3
    )
    assert match.mean() > 0.995  # nearest-neighbour edge pixels may flip
    np.testing.assert_allclose(
        np.asarray(out.flow[sl]),
        np.broadcast_to(np.asarray(c), (*np.asarray(out.flow[sl]).shape[:2], 2)),
        atol=0.05,
    )


def test_distortion_from_yaml(tmp_path):
    from dynosam_tpu.core.camera import distortion_from_yaml

    p = tmp_path / "cam.yaml"
    p.write_text(
        "Camera.fx: 100.0\nCamera.distortion_model: plumb_bob\n"
        "Camera.distortion_coefficients: [-0.2, 0.05, 0.001, -0.002]\n"
    )
    d = distortion_from_yaml(str(p))
    assert d.model == "radtan"
    np.testing.assert_allclose(
        np.asarray(d.coeffs), [-0.2, 0.05, 0.001, -0.002], atol=1e-7
    )
    p2 = tmp_path / "rect.yaml"
    p2.write_text("Camera.fx: 100.0\nCamera.distortion_coefficients: [0, 0, 0, 0]\n")
    assert distortion_from_yaml(str(p2)) is None
