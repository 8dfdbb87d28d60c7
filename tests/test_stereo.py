"""Dense stereo tests: JAX block matcher recovers known disparity."""

import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.core.camera import CameraParams, StereoParams
from dynosam_tpu.frontend import stereo


@pytest.fixture
def pair(rng):
    """Textured left image; right = left shifted by disparity 8."""
    from scipy.ndimage import gaussian_filter

    h, w = 64, 128
    tex = gaussian_filter(rng.uniform(0, 255, (h, w + 32)), 1.0).astype(
        np.float32
    )
    d = 8
    # scene point at left x appears at right x - d (standard rectified rig)
    left = tex[:, 16 : 16 + w]
    right = tex[:, 16 + d : 16 + d + w]
    return jnp.asarray(left), jnp.asarray(right), d


def test_block_match_recovers_disparity(pair):
    left, right, d = pair
    disp = stereo.block_match_jax(left, right, max_disparity=32)
    dd = np.asarray(disp)
    valid = dd > 0
    # away from borders, most pixels should hit d +/- 1
    inner = dd[8:-8, 40:-8]
    good = np.abs(inner - d) < 1.0
    assert good.mean() > 0.8, good.mean()


def test_depth_conversion(pair):
    left, right, d = pair
    sp = StereoParams(
        left=CameraParams.create(100.0, 100.0, 64.0, 32.0, 128, 64),
        baseline=jnp.asarray(0.5, jnp.float32),
    )
    res = stereo.dense_stereo(left, right, sp, max_disparity=32)
    depth = np.asarray(res.depth)[8:-8, 40:-8]
    expected = 100.0 * 0.5 / d
    med = np.median(depth[depth > 0])
    assert abs(med - expected) / expected < 0.1


def test_sgbm_backend(pair):
    left, right, d = pair
    sp = StereoParams(
        left=CameraParams.create(100.0, 100.0, 64.0, 32.0, 128, 64),
        baseline=jnp.asarray(0.5, jnp.float32),
    )
    res = stereo.sgbm_cv2(left, right, sp, max_disparity=32)
    dd = np.asarray(res.disparity)[8:-8, 40:-8]
    valid = dd > 0
    if valid.sum() > 50:
        assert abs(np.median(dd[valid]) - d) < 1.5
