"""Pyramidal Lucas-Kanade optical flow, batched over features.

TPU-native replacement for `cv::calcOpticalFlowPyrLK` used by the
reference's static tracker (`src/frontend/vision/StaticFeatureTracker.cc:417`).
Design: gaussian image pyramids via XLA convolutions; per-level iterative LK
where *all* features update simultaneously — each iteration is a batched
bilinear gather of (win x win) patches plus a batched 2x2 solve.  No scalar
loops: levels are a python loop over static pyramid shapes, iterations are
`lax.fori_loop`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


def gaussian_blur(img: jax.Array) -> jax.Array:
    """5x5 binomial blur (separable)."""
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], img.dtype) / 16.0
    x = img[None, :, :, None]
    kv = k[:, None, None, None]
    kh = k[None, :, None, None]
    dn = ("NHWC", "HWIO", "NHWC")
    # full precision: bf16-class conv accumulation shifts pyramid levels
    # enough to bias sub-pixel KLT (and thus ego-motion) on TPU
    x = jax.lax.conv_general_dilated(
        x, kv, (1, 1), "SAME", dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "SAME", dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    )
    return x[0, :, :, 0]


def build_pyramid(gray: jax.Array, levels: int) -> list:
    """List of images, level 0 = full res, each next level half size."""
    pyr = [gray]
    for _ in range(levels - 1):
        blurred = gaussian_blur(pyr[-1])
        pyr.append(blurred[::2, ::2])
    return pyr


def _tpu_point_query(img: jax.Array, xy: jax.Array) -> bool:
    # (N, 2) single-point queries on TPU route through the Pallas point
    # kernel (XLA serializes arbitrary-coordinate gathers at ~40
    # cycles/element); patch-shaped queries on TPU already go through
    # ops/pallas/lk.py, and CPU gathers are fine.
    return (
        jax.default_backend() == "tpu"
        and img.ndim == 2
        and xy.ndim == 2
        and xy.shape[-1] == 2
    )


def bilinear_sample(
    img: jax.Array, xy: jax.Array, valid: jax.Array | None = None
) -> jax.Array:
    """Sample (..., 2) float (x, y) locations from (H, W) image, clamped.

    `valid` (same leading shape as xy[..., 0]) zeroes masked rows — on TPU
    the point kernel SKIPS their window work entirely, so callers with
    slot-pool masks should pass them."""
    if _tpu_point_query(img, xy):
        from .onehot_sample import point_sample_mxu

        return point_sample_mxu(
            img[None], xy, ("bilinear",), valid=valid
        )[:, 0].astype(img.dtype)
    h, w = img.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.0)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    if valid is not None:
        out = jnp.where(valid, out, 0)   # match the kernel's skipped rows
    return out


class KLTResult(NamedTuple):
    uv: jax.Array       # (N, 2) tracked positions in the current image
    ok: jax.Array       # (N,) bool convergence + bounds + residual check
    error: jax.Array    # (N,) mean abs photometric residual


def _patch_offsets(win: int, dtype):
    r = (win - 1) / 2.0
    o = jnp.linspace(-r, r, win).astype(dtype)
    oy, ox = jnp.meshgrid(o, o, indexing="ij")
    return jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)  # (win*win, 2)


@functools.partial(jax.jit, static_argnames=("win", "levels", "iters"))
def klt_track(
    prev_gray: jax.Array,
    cur_gray: jax.Array,
    uv_prev: jax.Array,
    valid: jax.Array,
    win: int = 21,
    levels: int = 3,
    iters: int = 10,
    max_error: float = 20.0,
    g0: jax.Array | None = None,
):
    """Track points from prev to cur image.  All-feature-batched pyramidal LK.

    uv_prev: (N, 2) float (x, y).  Returns KLTResult with static shape N.
    `g0` (N, 2, level-0 pixels) warm-starts the flow estimate (e.g. from the
    dense optical-flow input channel) — used with a reduced level/iteration
    budget since only a sub-pixel polish remains.
    """
    dtype = prev_gray.dtype
    pyr_prev = build_pyramid(prev_gray, levels)
    pyr_cur = build_pyramid(cur_gray, levels)
    offs = _patch_offsets(win, dtype)                     # (P, 2)
    n = uv_prev.shape[0]

    # start at coarsest level
    if g0 is None:
        g = jnp.zeros((n, 2), dtype)  # flow estimate at level scale
    else:
        g = g0.astype(dtype) / (2.0 ** (levels - 1))
    for lvl in range(levels - 1, -1, -1):
        scale = 2.0 ** lvl
        ip, ic = pyr_prev[lvl], pyr_cur[lvl]
        p_lvl = uv_prev / scale                           # (N, 2)

        # template patches + gradients from prev image at p_lvl
        coords = p_lvl[:, None, :] + offs[None, :, :]     # (N, P, 2)
        t = bilinear_sample(ip, coords)                   # (N, P)
        # central-difference gradients of prev at template coords
        ex = jnp.asarray([1.0, 0.0], dtype)
        ey = jnp.asarray([0.0, 1.0], dtype)
        gx = (bilinear_sample(ip, coords + ex) - bilinear_sample(ip, coords - ex)) * 0.5
        gy = (bilinear_sample(ip, coords + ey) - bilinear_sample(ip, coords - ey)) * 0.5
        # 2x2 normal matrix per feature
        gxx = jnp.sum(gx * gx, axis=-1)
        gxy = jnp.sum(gx * gy, axis=-1)
        gyy = jnp.sum(gy * gy, axis=-1)
        det = gxx * gyy - gxy * gxy
        inv_ok = det > 1e-6
        det_safe = jnp.where(inv_ok, det, 1.0)

        def body(_, gcur):
            c2 = p_lvl + gcur
            patch = bilinear_sample(ic, c2[:, None, :] + offs[None, :, :])
            r = patch - t                                  # (N, P)
            bx = jnp.sum(r * gx, axis=-1)
            by = jnp.sum(r * gy, axis=-1)
            dx = -(gyy * bx - gxy * by) / det_safe
            dy = -(-gxy * bx + gxx * by) / det_safe
            step = jnp.stack([dx, dy], axis=-1)
            step = jnp.where(inv_ok[:, None], step, 0.0)
            return gcur + jnp.clip(step, -win, win)

        g = jax.lax.fori_loop(0, iters, body, g)
        if lvl > 0:
            g = g * 2.0

    uv_cur = uv_prev + g
    # final photometric error at level 0
    patch_prev = bilinear_sample(pyr_prev[0], uv_prev[:, None, :] + offs[None])
    patch_cur = bilinear_sample(pyr_cur[0], uv_cur[:, None, :] + offs[None])
    err = jnp.mean(jnp.abs(patch_cur - patch_prev), axis=-1)

    h, w = cur_gray.shape
    inb = (
        (uv_cur[:, 0] >= 0)
        & (uv_cur[:, 0] <= w - 1)
        & (uv_cur[:, 1] >= 0)
        & (uv_cur[:, 1] <= h - 1)
    )
    ok = valid & inb & (err < max_error) & jnp.all(jnp.isfinite(uv_cur), axis=-1)
    return KLTResult(uv=uv_cur, ok=ok, error=err)


def flow_at(
    flow: jax.Array, uv: jax.Array, valid: jax.Array | None = None
) -> jax.Array:
    """Sample a dense flow field (H, W, 2) at feature locations (N, 2)."""
    if _tpu_point_query(flow[..., 0], uv):
        from .onehot_sample import point_sample_mxu

        return point_sample_mxu(
            jnp.moveaxis(flow, -1, 0), uv, ("bilinear", "bilinear"),
            valid=valid,
        ).astype(flow.dtype)
    fx = bilinear_sample(flow[..., 0], uv, valid)
    fy = bilinear_sample(flow[..., 1], uv, valid)
    return jnp.stack([fx, fy], axis=-1)


def sample_channels(imgs, modes, uv: jax.Array, valid: jax.Array | None = None):
    """Sample several (H, W) channels at SHARED positions in one call.

    On TPU this is one point-kernel invocation (the per-query window/weight
    build amortizes over channels — merging call sites that share `uv` is
    the cheapest point-sampling optimization there is); elsewhere it
    falls back to per-channel gathers.  Returns a list aligned with
    `imgs`, dtypes preserved.  Rows masked off by `valid` come back 0.
    """
    imgs = list(imgs)
    if _tpu_point_query(imgs[0], uv):
        from .onehot_sample import point_sample_mxu

        out = point_sample_mxu(
            jnp.stack([im.astype(jnp.float32) for im in imgs]),
            uv, tuple(modes), valid=valid,
        )
        return [out[:, i].astype(im.dtype) for i, im in enumerate(imgs)]
    return [
        bilinear_sample(im, uv, valid) if m == "bilinear"
        else nearest_at(im, uv, valid)
        for im, m in zip(imgs, modes)
    ]


def nearest_at(
    img: jax.Array, uv: jax.Array, valid: jax.Array | None = None
) -> jax.Array:
    """Nearest-neighbour sample (for label/mask images)."""
    if _tpu_point_query(img, uv):
        from .onehot_sample import point_sample_mxu

        # int labels round-trip exactly through f32 below 2^16 (the
        # one-hot sampler's hi/lo split carries 16 mantissa bits)
        return point_sample_mxu(
            img[None], uv, ("nearest",), valid=valid
        )[:, 0].astype(img.dtype)
    h, w = img.shape
    x = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, h - 1)
    out = img[y, x]
    if valid is not None:
        out = jnp.where(valid, out, 0)
    return out
