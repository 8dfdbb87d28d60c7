"""Instance-mask tensor operations: propagation, boundaries, bboxes.

TPU-native versions of the reference's per-pixel mask loops:

  * `FeatureTracker::propogateMask` (`src/frontend/vision/FeatureTracker.cc:
    344-492`): carry the previous frame's instance labels forward through
    the dense optical flow so objects keep their label when the segmenter
    drops/flickers them.  The reference loops over pixels; here it is one
    scatter + majority reconciliation.
  * `computeObjectMaskBoundaryMask`, bounding boxes, per-object pixel
    counts (`src/frontend/vision/VisionTools.cc:440+`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("min_overlap_frac",))
def propagate_mask(
    prev_mask: jax.Array,   # (H, W) int32 labels at k-1
    flow_prev: jax.Array,   # (H, W, 2) flow mapping k-1 -> k
    cur_mask: jax.Array,    # (H, W) int32 labels at k (from the segmenter)
    min_overlap_frac: float = 0.3,
):
    """Warp prev labels into frame k; where the segmenter lost an object
    (label present at k-1, absent at k) paint the warped label onto
    background pixels.  Where labels disagree, the current segmentation
    wins (it is the measurement)."""
    h, w = prev_mask.shape
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    tx = jnp.clip(jnp.round(xx + flow_prev[..., 0]).astype(jnp.int32), 0, w - 1)
    ty = jnp.clip(jnp.round(yy + flow_prev[..., 1]).astype(jnp.int32), 0, h - 1)
    warped = jnp.zeros_like(prev_mask)
    # forward scatter (max keeps a deterministic winner on collisions)
    warped = warped.at[ty.reshape(-1), tx.reshape(-1)].max(
        prev_mask.reshape(-1)
    )

    label_cap = 256
    cur_counts = jnp.zeros((label_cap,), jnp.int32).at[
        jnp.clip(cur_mask.reshape(-1), 0, label_cap - 1)
    ].add(1)
    prev_counts = jnp.zeros((label_cap,), jnp.int32).at[
        jnp.clip(prev_mask.reshape(-1), 0, label_cap - 1)
    ].add(1)
    # labels the segmenter lost this frame but that had real support before
    lost = (cur_counts == 0) & (
        prev_counts > (min_overlap_frac * 100)
    )
    lost = lost.at[0].set(False)
    warped_is_lost = lost[jnp.clip(warped, 0, label_cap - 1)]
    out = jnp.where((cur_mask == 0) & warped_is_lost, warped, cur_mask)
    return out


def label_counts(mask: jax.Array, label_cap: int) -> jax.Array:
    """Pixel count per instance label, (label_cap,) int32.

    On TPU a scatter-add indexed by every pixel (H*W ~ 500k indices)
    serializes at ~40 cycles/element; the compare-and-reduce histogram
    (`sum(labels == l)`, the `ops/clahe.py` trick) is a dense VPU reduction
    instead.  Other backends keep the scatter (cheaper there).
    """
    lab = jnp.clip(mask.reshape(-1), 0, label_cap - 1)
    if jax.default_backend() == "tpu":
        ids = jnp.arange(label_cap, dtype=lab.dtype)
        return jnp.sum(
            (lab[None, :] == ids[:, None]).astype(jnp.int32), axis=1
        )
    return jnp.zeros((label_cap,), jnp.int32).at[lab].add(1)


def mask_boundary(mask: jax.Array, thickness: int = 1) -> jax.Array:
    """(H, W) bool mask of object boundary pixels (label transitions)."""
    m = mask
    pad = [(thickness, thickness), (thickness, thickness)]
    mp = jnp.pad(m, pad, mode="edge")
    out = jnp.zeros(m.shape, bool)
    h, w = m.shape
    for dy in range(-thickness, thickness + 1):
        for dx in range(-thickness, thickness + 1):
            if dx == 0 and dy == 0:
                continue
            shifted = mp[
                thickness + dy : thickness + dy + h,
                thickness + dx : thickness + dx + w,
            ]
            out = out | (shifted != m)
    return out & (m > 0)


def object_bboxes(mask: jax.Array, max_objects: int = 256):
    """Per-label [x1, y1, x2, y2] boxes + pixel counts, fixed size.

    Returns (boxes (L, 4) int32, counts (L,) int32) with L = max_objects;
    empty labels have count 0.
    """
    h, w = mask.shape
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    lab = jnp.clip(mask.reshape(-1), 0, max_objects - 1)
    big = jnp.iinfo(jnp.int32).max
    x1 = jnp.full((max_objects,), big, jnp.int32).at[lab].min(xx.reshape(-1))
    y1 = jnp.full((max_objects,), big, jnp.int32).at[lab].min(yy.reshape(-1))
    x2 = jnp.zeros((max_objects,), jnp.int32).at[lab].max(xx.reshape(-1))
    y2 = jnp.zeros((max_objects,), jnp.int32).at[lab].max(yy.reshape(-1))
    counts = jnp.zeros((max_objects,), jnp.int32).at[lab].add(1)
    boxes = jnp.stack([x1, y1, x2 + 1, y2 + 1], axis=-1)
    boxes = jnp.where(counts[:, None] > 0, boxes, 0)
    counts = counts.at[0].set(0)
    return boxes, counts


def shrink_mask(mask: jax.Array, erode: int) -> jax.Array:
    """Erode object regions (drop boundary-adjacent pixels), the analog of
    sampling away from mask boundaries."""
    if erode <= 0:
        return mask
    on = (mask > 0).astype(jnp.float32)
    win = 2 * erode + 1
    eroded = -jax.lax.reduce_window(
        -on, -jnp.inf, jax.lax.max, (win, win), (1, 1), "SAME"
    )
    return jnp.where(eroded > 0.5, mask, 0)
