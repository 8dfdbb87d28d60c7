"""Lens distortion models + undistortion/rectification.

Analog of the reference's `UndistorterRectifier`
(`frontend/vision/UndistortRectifier.hpp:58`, 279-LoC impl) and the
distortion handling in `CameraParams` (radial-tangential and equidistant
models from CameraParams.yaml).  Batched and jit-safe:

  * `distort_radtan` / `distort_equidistant`: normalized coords -> distorted
  * `undistort_points`: fixed-iteration Newton/fixed-point inverse (the
    TPU shape of cv::undistortPoints' iterative scheme)
  * `undistort_rectify_map` + `remap_bilinear`: dense image undistortion
    (map built once, applied per frame as a batched bilinear gather)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .camera import CameraParams


class Distortion(NamedTuple):
    """Distortion coefficients; model: 'radtan' (k1 k2 p1 p2) or
    'equidistant' (k1 k2 k3 k4)."""

    coeffs: jax.Array   # (4,)
    model: str = "radtan"


def distort_radtan(xy: jax.Array, d: jax.Array) -> jax.Array:
    """Normalized (..., 2) -> distorted normalized coords (radtan/plumb-bob)."""
    k1, k2, p1, p2 = d[0], d[1], d[2], d[3]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def distort_equidistant(xy: jax.Array, d: jax.Array) -> jax.Array:
    """Kannala-Brandt equidistant (fisheye) model."""
    k1, k2, k3, k4 = d[0], d[1], d[2], d[3]
    x, y = xy[..., 0], xy[..., 1]
    r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-12))
    th = jnp.arctan(r)
    th2 = th * th
    th_d = th * (1.0 + k1 * th2 + k2 * th2**2 + k3 * th2**3 + k4 * th2**4)
    scale = jnp.where(r > 1e-8, th_d / r, 1.0)
    return xy * scale[..., None]


def _distort(xy, dist: Distortion):
    if dist.model == "radtan":
        return distort_radtan(xy, dist.coeffs)
    if dist.model == "equidistant":
        return distort_equidistant(xy, dist.coeffs)
    raise ValueError(dist.model)


def undistort_points(
    uv: jax.Array, cam: CameraParams, dist: Distortion, iters: int = 8
) -> jax.Array:
    """Distorted pixels -> undistorted pixels (same intrinsics).

    Fixed-point iteration x_{n+1} = x_d - (D(x_n) - x_n), the scheme
    cv::undistortPoints uses, with a fixed iteration count for jit.
    """
    xd = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy],
        axis=-1,
    )

    def body(_, x):
        return xd - (_distort(x, dist) - x)

    x = jax.lax.fori_loop(0, iters, body, xd)
    return jnp.stack(
        [x[..., 0] * cam.fx + cam.cx, x[..., 1] * cam.fy + cam.cy], axis=-1
    )


def distort_points(uv: jax.Array, cam: CameraParams, dist: Distortion):
    """Ideal (undistorted) pixels -> distorted pixels."""
    x = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy],
        axis=-1,
    )
    xd = _distort(x, dist)
    return jnp.stack(
        [xd[..., 0] * cam.fx + cam.cx, xd[..., 1] * cam.fy + cam.cy], axis=-1
    )


def undistort_rectify_map(cam: CameraParams, dist: Distortion):
    """(H, W, 2) map: for each undistorted pixel, where to sample the
    distorted image (build once per camera, like initUndistortRectifyMap)."""
    h, w = cam.height, cam.width
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    uv = jnp.stack([xx, yy], axis=-1).astype(jnp.float32).reshape(-1, 2)
    src = distort_points(uv, cam, dist)
    return src.reshape(h, w, 2)


@jax.jit
def remap_bilinear(img: jax.Array, mapping: jax.Array) -> jax.Array:
    """Apply an undistortion map with bilinear sampling ((H,W) image)."""
    from ..ops.klt import bilinear_sample

    h, w = img.shape
    out = bilinear_sample(img, mapping.reshape(-1, 2))
    return out.reshape(h, w)
