"""Tests: mask propagation, boundary/bbox ops, IMU buffer."""

import jax.numpy as jnp
import numpy as np

from dynosam_tpu.frontend import mask_ops
from dynosam_tpu.frontend.imu import ImuBuffer, ImuMeasurement


def test_propagate_mask_recovers_lost_object():
    h, w = 40, 60
    prev = np.zeros((h, w), np.int32)
    prev[10:20, 10:20] = 5
    flow = np.zeros((h, w, 2), np.float32)
    flow[..., 0] = 3.0  # object moves +3 px in x
    cur = np.zeros((h, w), np.int32)  # segmenter lost the object
    out = np.asarray(
        mask_ops.propagate_mask(
            jnp.asarray(prev), jnp.asarray(flow), jnp.asarray(cur)
        )
    )
    assert (out[12:18, 14:22] == 5).mean() > 0.8
    # where the current segmenter HAS labels they win
    cur2 = np.zeros((h, w), np.int32)
    cur2[12:22, 13:23] = 9
    out2 = np.asarray(
        mask_ops.propagate_mask(
            jnp.asarray(prev), jnp.asarray(flow), jnp.asarray(cur2)
        )
    )
    assert (out2[14:20, 15:21] == 9).all()


def test_mask_boundary_and_bboxes():
    m = np.zeros((30, 30), np.int32)
    m[5:15, 5:15] = 2
    b = np.asarray(mask_ops.mask_boundary(jnp.asarray(m)))
    assert b[5, 5] and b[14, 14]
    assert not b[10, 10]
    boxes, counts = mask_ops.object_bboxes(jnp.asarray(m))
    np.testing.assert_array_equal(np.asarray(boxes)[2], [5, 5, 15, 15])
    assert int(np.asarray(counts)[2]) == 100


def test_shrink_mask():
    m = np.zeros((20, 20), np.int32)
    m[5:15, 5:15] = 3
    s = np.asarray(mask_ops.shrink_mask(jnp.asarray(m), 2))
    assert s[10, 10] == 3
    assert s[5, 5] == 0 and s[6, 6] == 0
    assert s[8, 8] == 3


def test_imu_buffer_interpolation():
    buf = ImuBuffer()
    for k in range(10):
        buf.add(
            ImuMeasurement(
                k * 0.01, np.array([k, 0.0, 9.8]), np.array([0.0, k * 0.1, 0])
            )
        )
    m = buf.interpolate(0.015)
    np.testing.assert_allclose(m.accel[0], 1.5)
    ts, acc, gyr = buf.between(0.015, 0.045)
    assert ts[0] == 0.015 and ts[-1] == 0.045
    np.testing.assert_allclose(acc[0, 0], 1.5)
    np.testing.assert_allclose(acc[-1, 0], 4.5)
    assert buf.interpolate(1.0) is None
