"""Feature detection as dense convolutions.

Replaces the reference's sparse detector stack — cv::GFTT / ORB extractor
with quadtree distribution and adaptive non-maximum suppression
(`frontend/vision/FeatureDetector.hpp:57-97`,
`frontend/vision/ORBextractor.hpp:58`, `frontend/anms/`) — with a dense
TPU formulation:

  * Shi-Tomasi corner response = min eigenvalue of the 2x2 structure tensor,
    computed with separable box/Sobel convolutions (pure XLA convs on the
    whole image).
  * Spatial distribution = grid non-max suppression: one max-pool per cell
    (the analog of both the occupancy grid `OccupandyGrid2D` binning and the
    ANMS step — bucketed NMS is how the reference distributes features,
    `StaticFeatureTracker.cc:309-379`).
  * Top-K selection over cell winners gives a fixed-size candidate list.

Everything is static-shaped: detection returns exactly `max_corners`
candidates with a validity mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _conv2(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Single-channel 2D convolution with SAME padding (NHWC conv)."""
    x = img[None, :, :, None]
    k = kernel[:, :, None, None]
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0, :, :, 0]


def sobel_gradients(gray: jax.Array):
    kx = jnp.asarray(
        [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], gray.dtype
    ) / 8.0
    ky = kx.T
    return _conv2(gray, kx), _conv2(gray, ky)


def shi_tomasi_response(gray: jax.Array, window: int = 5) -> jax.Array:
    """Min-eigenvalue corner response (cv::goodFeaturesToTrack quality)."""
    ix, iy = sobel_gradients(gray)
    box = jnp.ones((window, window), gray.dtype) / (window * window)
    sxx = _conv2(ix * ix, box)
    syy = _conv2(iy * iy, box)
    sxy = _conv2(ix * iy, box)
    # min eig of [[sxx, sxy], [sxy, syy]]
    tr = sxx + syy
    det_rad = jnp.sqrt(
        jnp.maximum((sxx - syy) ** 2 + 4.0 * sxy * sxy, 0.0)
    )
    return 0.5 * (tr - det_rad)


def harris_response(gray: jax.Array, window: int = 5, k: float = 0.04):
    ix, iy = sobel_gradients(gray)
    box = jnp.ones((window, window), gray.dtype) / (window * window)
    sxx = _conv2(ix * ix, box)
    syy = _conv2(iy * iy, box)
    sxy = _conv2(ix * iy, box)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


class Detections(NamedTuple):
    uv: jax.Array      # (K, 2) float pixel coords (x, y)
    score: jax.Array   # (K,)
    valid: jax.Array   # (K,) bool


@functools.partial(
    jax.jit, static_argnames=("max_corners", "cell_size", "min_distance")
)
def detect_grid_nms(
    response: jax.Array,
    occupied_or_invalid: jax.Array,
    max_corners: int = 1000,
    cell_size: int = 16,
    quality_level: float = 0.001,
    min_distance: int = 0,
) -> Detections:
    """Grid-NMS corner selection.

    response: (H, W) corner score.  occupied_or_invalid: (H, W) bool — pixels
    to suppress (existing feature neighbourhoods, dynamic-object masks,
    image border: the reference's equivalents are the occupancy grid, the
    semantic mask exclusion and `shrink_row/col`).  Returns top
    `max_corners` cell-winners above `quality_level * max(response)`.
    """
    h, wd = response.shape
    resp = jnp.where(occupied_or_invalid, -jnp.inf, response)

    # pad to multiples of cell_size
    ph = -h % cell_size
    pw = -wd % cell_size
    resp_p = jnp.pad(resp, ((0, ph), (0, pw)), constant_values=-jnp.inf)
    hh, ww = resp_p.shape
    cells = resp_p.reshape(
        hh // cell_size, cell_size, ww // cell_size, cell_size
    ).transpose(0, 2, 1, 3).reshape(hh // cell_size, ww // cell_size, -1)
    win = jnp.argmax(cells, axis=-1)                 # (CH, CW)
    win_score = jnp.take_along_axis(cells, win[..., None], axis=-1)[..., 0]

    cy = jnp.arange(hh // cell_size)[:, None] * cell_size + win // cell_size
    cx = jnp.arange(ww // cell_size)[None, :] * cell_size + win % cell_size

    flat_score = win_score.reshape(-1)
    flat_uv = jnp.stack([cx.reshape(-1), cy.reshape(-1)], axis=-1).astype(
        response.dtype
    )

    k = min(max_corners, flat_score.shape[0])
    top_score, top_idx = jax.lax.top_k(flat_score, k)
    top_uv = flat_uv[top_idx]
    thresh = quality_level * jnp.maximum(jnp.max(top_score), 1e-12)
    valid = jnp.isfinite(top_score) & (top_score > thresh)

    if k < max_corners:
        pad = max_corners - k
        top_uv = jnp.pad(top_uv, ((0, pad), (0, 0)))
        top_score = jnp.pad(top_score, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return Detections(uv=top_uv, score=top_score, valid=valid)


def occupancy_mask(
    shape, uv: jax.Array, valid: jax.Array, radius: int
) -> jax.Array:
    """(H, W) bool mask marking a disc around each existing feature —
    the analog of `OccupandyGrid2D` keep-away binning.

    Implemented by scattering points then max-pooling with a (2r+1) window.
    """
    h, w = shape
    grid = jnp.zeros((h, w), jnp.float32)
    xi = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, h - 1)
    grid = grid.at[yi, xi].max(jnp.where(valid, 1.0, 0.0))
    if radius > 0:
        win = 2 * radius + 1
        grid = jax.lax.reduce_window(
            grid, -jnp.inf, jax.lax.max, (win, win), (1, 1), "SAME"
        )
    return grid > 0.5


def occupancy_at_grid(
    shape, uv: jax.Array, valid: jax.Array, radius: int, step: int, off: int
) -> jax.Array:
    """Occupancy test evaluated ONLY at the subsampled candidate grid
    (`off::step` in both dims): True where a disc of `radius` around any
    valid feature covers the grid point.

    Exactly `occupancy_mask(shape, uv, valid, radius)[off::step, off::step]`
    — but a lane-strided slice of a (H, W) image lowers to a ~H*W/step^2
    serialized gather on TPU (stride-`step` on the minor dim is a lane
    shuffle; measured 0.3 ms/frame each in the round-5 trace), and the
    reduce_window dilation is wasted on the pixels the slice drops.  Both
    fold into banded 0/1 selection matmuls on the MXU: the scattered grid
    is 0/1 and band sums are <= (2r+1)^2 < 256, so bf16 accumulation is
    exact."""
    h, w = shape
    grid = jnp.zeros((h, w), jnp.float32)
    xi = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, h - 1)
    grid = grid.at[yi, xi].max(jnp.where(valid, 1.0, 0.0))
    gy = jnp.arange(off, h, step)
    gx = jnp.arange(off, w, step)
    Sy = (
        jnp.abs(gy[:, None] - jnp.arange(h)[None, :]) <= radius
    ).astype(jnp.float32)                                   # (Hg, H)
    Sx = (
        jnp.abs(jnp.arange(w)[:, None] - gx[None, :]) <= radius
    ).astype(jnp.float32)                                   # (W, Wg)
    return (Sy @ grid) @ Sx > 0.5                           # (Hg, Wg)


def grid_subsample_i32(img: jax.Array, step: int, off: int) -> jax.Array:
    """`img[off::step, off::step]` for an integer image via one-hot
    selection matmuls (HIGHEST precision: f32 exact to 2^24) — same
    lane-shuffle-avoidance as `occupancy_at_grid`."""
    h, w = img.shape
    gy = jnp.arange(off, h, step)
    gx = jnp.arange(off, w, step)
    Sy = (gy[:, None] == jnp.arange(h)[None, :]).astype(jnp.float32)
    Sx = (jnp.arange(w)[:, None] == gx[None, :]).astype(jnp.float32)
    out = jnp.einsum(
        "gh,hw,wx->gx", Sy, img.astype(jnp.float32), Sx,
        precision="highest", optimize=True,
    )
    return jnp.round(out).astype(img.dtype)


def border_mask(shape, shrink_row: int, shrink_col: int) -> jax.Array:
    """(H, W) bool: True where detection is forbidden (image border),
    the analog of `shrink_row/shrink_col` (`TrackerParams`)."""
    h, w = shape
    r = jnp.zeros((h, w), bool)
    if shrink_row > 0:
        r = r.at[:shrink_row, :].set(True)
        r = r.at[-shrink_row:, :].set(True)
    if shrink_col > 0:
        r = r.at[:, :shrink_col].set(True)
        r = r.at[:, -shrink_col:].set(True)
    return r


# --------------------------------------------------------------------------
# Fast response path: shift-based gradients + integral-image box sums.
# Single-channel 2D convs lower poorly on TPU (MXU-shaped conv machinery for
# a 1-channel VPU job); rolls + cumsums are pure VPU and ~10x faster.
# --------------------------------------------------------------------------


def _shift(img: jax.Array, dy: int, dx: int) -> jax.Array:
    """Shifted copy with edge padding (replicates conv SAME behaviour).

    Pad+slice, never arange indexing — a clamped-iota row/lane index can
    lower to a serialized gather on TPU (CLAUDE.md static-shift rule)."""
    h, w = img.shape
    a_t, a_b = max(-dy, 0), max(dy, 0)
    a_l, a_r = max(-dx, 0), max(dx, 0)
    p = jnp.pad(img, ((a_t, a_b), (a_l, a_r)), mode="edge")
    return jax.lax.slice(
        p, (dy + a_t, dx + a_l), (dy + a_t + h, dx + a_l + w)
    )


def sobel_gradients_fast(gray: jax.Array):
    """Sobel via 8 shifted adds (VPU) instead of conv."""
    tl = _shift(gray, -1, -1)
    tc = _shift(gray, -1, 0)
    tr = _shift(gray, -1, 1)
    ml = _shift(gray, 0, -1)
    mr = _shift(gray, 0, 1)
    bl = _shift(gray, 1, -1)
    bc = _shift(gray, 1, 0)
    br = _shift(gray, 1, 1)
    ix = ((tr + 2.0 * mr + br) - (tl + 2.0 * ml + bl)) / 8.0
    iy = ((bl + 2.0 * bc + br) - (tl + 2.0 * tc + tr)) / 8.0
    return ix, iy


def _box_sum(img: jax.Array, r: int) -> jax.Array:
    """(2r+1)^2 box sum via integral image (two cumsums + four SHIFTED
    copies — pad+slice via `_shift`, never clamped-arange gathers)."""
    h, w = img.shape
    ii = jnp.cumsum(jnp.cumsum(img, axis=0), axis=1)
    ii = jnp.pad(ii, ((1, 0), (1, 0)))                  # (h+1, w+1)
    a = _shift(ii, r + 1, r + 1)[:h, :w]
    b = _shift(ii, -r, r + 1)[:h, :w]
    c = _shift(ii, r + 1, -r)[:h, :w]
    d = _shift(ii, -r, -r)[:h, :w]
    return a - b - c + d


def shi_tomasi_response_fast(gray: jax.Array, window: int = 5) -> jax.Array:
    """Min-eigenvalue response, mathematically equal to
    `shi_tomasi_response` up to edge handling; ~10x faster on TPU."""
    ix, iy = sobel_gradients_fast(gray)
    r = window // 2
    n = float(window * window)
    sxx = _box_sum(ix * ix, r) / n
    syy = _box_sum(iy * iy, r) / n
    sxy = _box_sum(ix * iy, r) / n
    tr = sxx + syy
    det_rad = jnp.sqrt(jnp.maximum((sxx - syy) ** 2 + 4.0 * sxy * sxy, 0.0))
    return 0.5 * (tr - det_rad)


# --------------------------------------------------------------------------
# FAST corner detection (the ORB-extractor detector stage, vectorized)
# --------------------------------------------------------------------------

# Bresenham circle of radius 3 (the FAST-9/16 test ring)
_FAST_RING = (
    (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
)


def _windowed_all(x: jax.Array, width: int) -> jax.Array:
    """AND over every length-`width` window along axis 0, log-depth:
    out[i] = all(x[i : i + width]).  Shape (L - width + 1, ...)."""
    tbl = {1: x}
    w = 1
    while w * 2 <= width:
        t = tbl[w]
        tbl[w * 2] = t[:-w] & t[w:]
        w *= 2
    n_out = x.shape[0] - width + 1
    res = None
    off = 0
    rem = width
    for p in sorted(tbl, reverse=True):
        while rem >= p:
            seg = jax.lax.slice_in_dim(tbl[p], off, off + n_out, axis=0)
            res = seg if res is None else (res & seg)
            off += p
            rem -= p
    return res


def _fast_from_diff(diff: jax.Array, threshold: float, arc: int):
    """FAST criterion + strength from the precomputed (16, H, W) ring
    differences.  A circular run of >= arc equals "some length-arc window
    of the ring, wrapped, is all True" — evaluated with the log-depth
    windowed AND instead of a 32-step run-length scan (the scan cost ~2x
    the whole ring build at every pyramid level in ORB mode)."""
    brighter = diff > threshold
    darker = diff < -threshold

    def ok_arc(flags):
        doubled = jnp.concatenate([flags, flags[: arc - 1]], axis=0)
        return jnp.any(_windowed_all(doubled, arc), axis=0)

    ok = ok_arc(brighter) | ok_arc(darker)
    strength = jnp.sum(jnp.abs(diff) * (brighter | darker), axis=0)
    return jnp.where(ok, strength, 0.0)


def _fast_ring_diff(gray: jax.Array) -> jax.Array:
    ring = jnp.stack(
        [_shift(gray, dy, dx) for (dx, dy) in _FAST_RING], axis=0
    )                                                       # (16, H, W)
    return ring - gray[None]


def fast_response(gray: jax.Array, threshold: float = 20.0, arc: int = 9):
    """FAST-N corner test, dense: every pixel at once.

    Returns a response map (sum of absolute differences of contiguous
    brighter/darker ring pixels; 0 where the FAST criterion fails) — the
    detector stage of the reference's ORB extractor
    (`frontend/vision/ORBextractor.hpp:58`), without the pyramid/BRIEF
    stages (KLT tracking replaces descriptor matching in this design).
    """
    return _fast_from_diff(_fast_ring_diff(gray), threshold, arc)


def fast_response_pair(
    gray: jax.Array, t_init: float, t_min: float, arc: int = 9
):
    """`fast_response` at BOTH ORB thresholds sharing one ring build (the
    extractor's init->min fallback needs both maps every level,
    `ORBextractor.cc` ComputeKeyPointsOctTree)."""
    diff = _fast_ring_diff(gray)
    return (
        _fast_from_diff(diff, t_init, arc),
        _fast_from_diff(diff, t_min, arc),
    )
