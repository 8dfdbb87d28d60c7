"""Image undistortion / rectification pre-pass.

The analog of the reference's `UndistorterRectifier`
(`frontend/vision/UndistortRectifier.hpp:58`: build `cv::remap` maps once
per camera, remap every incoming frame before tracking).  Like the
reference, this runs on the HOST as part of data provision (the prefetch
thread overlaps it with device compute): a dense arbitrary-coordinate warp
is a per-element gather, which serializes on the TPU (~40 cycles/element,
see CLAUDE.md) but is one vectorized XLA:CPU program here.

Channel semantics:
  * gray: bilinear resample through the static undistortion map;
  * depth / mask: nearest-neighbour (bilinear across a depth edge or an
    instance-id boundary fabricates values);
  * flow: resampled AND vector-corrected — dense flow produced on the
    distorted grid maps distorted k-pixels to distorted k+1-positions, so
    the rectified flow is  U(M(u_r) + flow_d(M(u_r))) - u_r  with M the
    rectified->distorted map and U the iterative point undistortion;
  * pixels whose source falls outside the distorted image get depth 0
    (= invalid) and mask 0 (= background), the reference's
    `kInvalidDepth`/background convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import CameraParams
from ..core.distortion import (
    Distortion,
    undistort_points,
    undistort_rectify_map,
)
from .frontend import FrameImages


def make_rectifier(cam: CameraParams, dist: Distortion):
    """Build the per-camera rectifier: FrameImages -> FrameImages.

    The returned callable runs one jitted XLA:CPU program per frame (maps
    are closed-over constants, built once like initUndistortRectifyMap).
    """
    from ..ops.klt import bilinear_sample

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        mapping = undistort_rectify_map(cam, dist)          # (H, W, 2)
    h, w = mapping.shape[:2]
    flat = mapping.reshape(-1, 2)
    inside = (
        (flat[:, 0] >= 0.0) & (flat[:, 0] <= w - 1.0)
        & (flat[:, 1] >= 0.0) & (flat[:, 1] <= h - 1.0)
    )
    xi = jnp.clip(jnp.round(flat[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(flat[:, 1]).astype(jnp.int32), 0, h - 1)
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    grid_r = jnp.stack([xx, yy], axis=-1).reshape(-1, 2)

    @jax.jit
    def rectify(images: FrameImages) -> FrameImages:
        gray = bilinear_sample(images.gray, flat).reshape(h, w)
        depth = jnp.where(inside, images.depth[yi, xi], 0.0).reshape(h, w)
        mask = jnp.where(inside, images.mask[yi, xi], 0).reshape(h, w)
        fx_d = bilinear_sample(images.flow[..., 0], flat)
        fy_d = bilinear_sample(images.flow[..., 1], flat)
        dest_d = flat + jnp.stack([fx_d, fy_d], axis=-1)
        dest_r = undistort_points(dest_d, cam, dist)
        flow = jnp.where(
            inside[:, None], dest_r - grid_r, 0.0
        ).reshape(h, w, 2)
        return FrameImages(
            gray=gray, depth=depth, flow=flow, mask=mask.astype(jnp.int32)
        )

    def rectify_on_host(images: FrameImages) -> FrameImages:
        with jax.default_device(cpu):
            return rectify(images)

    return rectify_on_host
