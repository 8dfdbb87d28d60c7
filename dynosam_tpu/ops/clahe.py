"""Contrast-limited adaptive histogram equalization (CLAHE) as one XLA program.

TPU-native analog of the reference's detector preprocessing
(`src/frontend/vision/FeatureDetector.cc:95-109`: `cv::createCLAHE(2.0,
cv::Size(8, 8))` applied to the grayscale image before sparse detection,
gated by `TrackerParams.use_clahe_filter`, default true).

TPU mechanics — histogramming and per-pixel LUT lookup are the two ops the
hardware is worst at (scatter-add serializes; 500k table gathers are
latency-bound), so neither appears here:

  * per-tile histograms are a fused compare-and-reduce
    (`sum(tile_vals == bin)`) — no scatter;
  * the LUT application is restructured into half-tile-shifted blocks:
    every pixel of a block interpolates the SAME four tile LUTs, so the
    equalized value is `cdf(q) = G @ hist` — a (block, pixel, bins) x
    (block, bins, 4) batched MATMUL on the MXU, where G is a soft-geq
    basis matrix (linear interpolation between bin edges) built from the
    pixel values by broadcasting — no gather;
  * the 4 per-neighbour CDFs are blended with the separable bilinear ramp.

Functionally this matches OpenCV's algorithm (clip at
`clip_limit * area / bins`, uniform excess redistribution, scaled-CDF LUT,
bilinear tile interpolation) up to LUT integer rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("tiles", "n_bins"))
def clahe(
    gray: jax.Array,
    clip_limit: float = 2.0,
    tiles: tuple = (8, 8),
    n_bins: int = 256,
) -> jax.Array:
    """Equalize a (H, W) grayscale image with values in [0, 255]."""
    h, w = gray.shape
    dtype = gray.dtype
    ty, tx = tiles
    th = -(-h // ty)
    tw = -(-w // tx)
    hp, wp = th * ty, tw * tx
    img = jnp.pad(gray, ((0, hp - h), (0, wp - w)), mode="edge")
    v = jnp.clip(img, 0.0, 255.0)
    s = 256.0 / n_bins                                    # bin width (levels)

    # ---- per-tile histograms: fused compare-and-reduce (no scatter) ------
    qb = jnp.minimum((v / s).astype(jnp.int32), n_bins - 1)
    tile_vals = (
        qb.reshape(ty, th, tx, tw).transpose(0, 2, 1, 3).reshape(ty * tx, th * tw)
    )
    bins = jnp.arange(n_bins, dtype=jnp.int32)
    hist = jnp.sum(
        (tile_vals[:, :, None] == bins).astype(jnp.float32), axis=1
    )                                                     # (T, n_bins)

    # ---- clip + uniform redistribution (cv::CLAHE semantics) -------------
    area = float(th * tw)
    limit = max(clip_limit * area / n_bins, 1.0)
    clipped = jnp.minimum(hist, limit)
    excess = area - jnp.sum(clipped, axis=-1, keepdims=True)
    clipped = clipped + excess / n_bins
    Hs = (clipped * (255.0 / area)).reshape(ty, tx, n_bins)

    # ---- half-tile-shifted blocks: each block uses exactly 4 tile LUTs ---
    pt, pb = th // 2, th - th // 2
    pl, pr = tw // 2, tw - tw // 2
    vpad = jnp.pad(v, ((pt, pb), (pl, pr)), mode="edge")  # ((ty+1)th, (tx+1)tw)
    by, bx = ty + 1, tx + 1
    blocks = (
        vpad.reshape(by, th, bx, tw).transpose(0, 2, 1, 3).reshape(by * bx, th * tw)
    )

    # soft-geq basis: G[p, b] = fraction of bin b at or below value p
    # (linear interpolation between bin edges; s == 1 reproduces the
    # inclusive integer CDF)
    edges = (bins.astype(dtype) * s)[None, None, :]
    G = jnp.clip((blocks[:, :, None] + 1.0 - edges) / s, 0.0, 1.0)

    # the 4 neighbour LUT histograms per block (clamped at the borders)
    ri0 = jnp.clip(jnp.arange(by) - 1, 0, ty - 1)
    ri1 = jnp.clip(jnp.arange(by), 0, ty - 1)
    cj0 = jnp.clip(jnp.arange(bx) - 1, 0, tx - 1)
    cj1 = jnp.clip(jnp.arange(bx), 0, tx - 1)
    H4 = jnp.stack(
        [
            Hs[ri0][:, cj0],
            Hs[ri0][:, cj1],
            Hs[ri1][:, cj0],
            Hs[ri1][:, cj1],
        ],
        axis=-1,
    ).reshape(by * bx, n_bins, 4)

    # (B, P, n_bins) @ (B, n_bins, 4) on the MXU -> per-neighbour CDF values
    vals = jnp.einsum(
        "bpn,bnf->bpf",
        G.astype(jnp.bfloat16),
        H4.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    # separable bilinear ramp within each block
    fy = ((jnp.arange(th, dtype=jnp.float32) + 0.5) / th)[:, None]
    fx = ((jnp.arange(tw, dtype=jnp.float32) + 0.5) / tw)[None, :]
    wgt = jnp.stack(
        [
            (1 - fy) * (1 - fx),
            (1 - fy) * fx,
            fy * (1 - fx),
            fy * fx,
        ],
        axis=-1,
    ).reshape(1, th * tw, 4)
    out = jnp.sum(vals * wgt, axis=-1)
    out = (
        out.reshape(by, bx, th, tw).transpose(0, 2, 1, 3).reshape(by * th, bx * tw)
    )
    return out[pt : pt + h, pl : pl + w].astype(dtype)
