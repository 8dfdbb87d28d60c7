"""TPU-native ORB extractor: pyramid FAST + orientation + steered BRIEF.

The reference's `ORBextractor` (`frontend/vision/ORBextractor.hpp:58`,
`ORBextractor.cc` — the ORB-SLAM2 extractor) builds an 8-level 1.2x image
pyramid, runs per-cell FAST-9/16 with an init->min threshold fallback,
distributes keypoints with an octree, computes intensity-centroid
orientation, and rotated BRIEF-256 descriptors over the Gaussian-blurred
level image.  It is wired twice: as detector mode `ORB_SLAM_ORB`
(`FeatureDetector.cc:55-83`) and as `ExternalFlowFeatureTracker`'s
keypoint/descriptor source (`StaticFeatureTracker.cc:58-83`).

TPU redesign (no translation):

  * every pyramid level is processed with dense whole-image ops — the FAST
    ring test over 16 shifted copies (`detect.fast_response`), the per-cell
    threshold fallback as a strided cell-max select;
  * the octree distribution becomes per-level grid-NMS + a geometric
    per-level quota top-K — the same spatial-uniformity goal with constant
    shapes (`detect.detect_grid_nms`);
  * orientation moments and descriptor taps are batched bilinear gathers
    at the (few hundred) selected keypoints only — never dense per-pixel
    LUT work, and never on differentiated data;
  * the 256 BRIEF point pairs are OUR own deterministic Gaussian pattern
    (BRIEF-paper sigma = patch/5, fixed seed) — the reference/OpenCV
    learned `bit_pattern_31_` array is deliberately not copied; the
    pattern is steered by the keypoint angle at sample time;
  * descriptors are (N, 256) ±1 int8, so Hamming distance is
    `(256 - A @ B^T) / 2` — all-pairs matching is one MXU matmul
    (`match_descriptors`).

Everything is static-shaped: the extractor returns exactly `n_features`
rows with a validity mask, quota'd per level like `mnFeaturesPerLevel`.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .detect import Detections, detect_grid_nms, fast_response_pair

HALF_PATCH = 15          # orientation patch radius (ORBextractor HALF_PATCH_SIZE)
EDGE_THRESHOLD = 19      # detection keep-away border per level
_PATTERN_SIGMA = 31.0 / 5.0   # BRIEF: sigma^2 = patch^2 / 25
_PATTERN_CLIP = 12.0          # keep rotated taps inside the blurred patch


def _brief_pattern(n_bits: int = 256, seed: int = 42) -> np.ndarray:
    """(n_bits, 2, 2) float32 sample-point pairs, Gaussian around the
    keypoint (our deterministic pattern; NOT OpenCV's learned array)."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, _PATTERN_SIGMA, size=(n_bits, 2, 2))
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    pts = np.where(norm > _PATTERN_CLIP, pts * (_PATTERN_CLIP / norm), pts)
    return pts.astype(np.float32)


_PATTERN = _brief_pattern()


class OrbFeatures(NamedTuple):
    uv: jax.Array        # (N, 2) float32 keypoint coords in BASE image pixels
    response: jax.Array  # (N,) FAST strength at the detection level
    angle: jax.Array     # (N,) radians, intensity-centroid orientation
    level: jax.Array     # (N,) int32 pyramid octave
    scale: jax.Array     # (N,) float32 level scale factor (uv = uv_level*scale)
    desc: jax.Array      # (N, 256) int8 in {-1, +1}; rotated-BRIEF bits
    valid: jax.Array     # (N,) bool


def features_per_level(
    n_features: int, n_levels: int, scale_factor: float
) -> list:
    """Geometric per-level quota (the reference's `mnFeaturesPerLevel`
    computation: most features at full resolution, 1/scale per level up,
    remainder into the coarsest level)."""
    inv = 1.0 / scale_factor
    first = n_features * (1.0 - inv) / (1.0 - inv ** n_levels)
    quotas = []
    acc = 0
    for lvl in range(n_levels - 1):
        q = int(round(first * inv ** lvl))
        quotas.append(q)
        acc += q
    quotas.append(max(n_features - acc, 0))
    return quotas


def _cell_max(resp: jax.Array, cell: int) -> jax.Array:
    """Per-cell max broadcast back to pixel resolution (pad-to-multiple)."""
    h, w = resp.shape
    ph, pw = -h % cell, -w % cell
    r = jnp.pad(resp, ((0, ph), (0, pw)), constant_values=0.0)
    hh, ww = r.shape
    m = r.reshape(hh // cell, cell, ww // cell, cell).max(axis=(1, 3))
    m = jnp.repeat(jnp.repeat(m, cell, axis=0), cell, axis=1)
    return m[:h, :w]


def _sample_bilinear(img: jax.Array, xy: jax.Array) -> jax.Array:
    """Bilinear sample img[y, x] at float coords xy (..., 2), edge-clipped."""
    h, w = img.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def _gaussian_blur7(img: jax.Array, sigma: float = 2.0) -> jax.Array:
    """Separable 7x7 Gaussian via shifted adds (the pre-BRIEF blur,
    `GaussianBlur(7, 7, 2, 2)` in the reference's compute path).  Shifts
    are pad+slice (`detect._shift`) — clamped-arange row/lane indexing can
    lower to serialized gathers on TPU."""
    from .detect import _shift

    taps = np.exp(-0.5 * (np.arange(-3, 4) / sigma) ** 2)
    taps = (taps / taps.sum()).astype(np.float32)
    out = jnp.zeros_like(img)
    for i, t in enumerate(taps):
        out = out + float(t) * _shift(img, i - 3, 0)
    img2 = out
    out = jnp.zeros_like(img)
    for i, t in enumerate(taps):
        out = out + float(t) * _shift(img2, 0, i - 3)
    return out


# circular orientation-patch offsets, precomputed once (host).  Kept as
# NUMPY: this module is lazily imported from inside traced functions, and
# module-level jnp ops executed during a trace would leak tracers.
_oy, _ox = np.mgrid[-HALF_PATCH:HALF_PATCH + 1, -HALF_PATCH:HALF_PATCH + 1]
_circ = (_ox ** 2 + _oy ** 2) <= HALF_PATCH ** 2
_M_OX = (_ox * _circ).reshape(-1).astype(np.float32)
_M_OY = (_oy * _circ).reshape(-1).astype(np.float32)
_OFF_X = _ox.reshape(-1).astype(np.int32)
_OFF_Y = _oy.reshape(-1).astype(np.int32)


def _orientations(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Intensity-centroid angle (IC_Angle): theta = atan2(m01, m10) over the
    radius-15 circular patch, evaluated by one batched gather per frame."""
    h, w = img.shape
    xi = jnp.round(uv[:, 0]).astype(jnp.int32)
    yi = jnp.round(uv[:, 1]).astype(jnp.int32)
    xs = jnp.clip(xi[:, None] + _OFF_X[None, :], 0, w - 1)   # (N, P)
    ys = jnp.clip(yi[:, None] + _OFF_Y[None, :], 0, h - 1)
    vals = img[ys, xs]                                        # (N, P) gather
    m10 = vals @ _M_OX
    m01 = vals @ _M_OY
    return jnp.arctan2(m01, m10)


def _descriptors(
    blurred: jax.Array, uv: jax.Array, angle: jax.Array
) -> jax.Array:
    """Steered BRIEF-256: rotate the pattern by each keypoint's angle,
    bilinear-sample both taps of every pair, compare.  (N, 256) ±1 int8."""
    pat = jnp.asarray(_PATTERN)                               # (256, 2, 2)
    ca, sa = jnp.cos(angle), jnp.sin(angle)                   # (N,)
    rot = jnp.stack(
        [jnp.stack([ca, -sa], -1), jnp.stack([sa, ca], -1)], axis=-2
    )                                                         # (N, 2, 2)
    # (N, 256, 2pts, 2coords): rotated offsets + keypoint position
    off = jnp.einsum("nij,bpj->nbpi", rot, pat)
    xy = uv[:, None, None, :] + off
    vals = _sample_bilinear(blurred, xy)                      # (N, 256, 2)
    bits = vals[..., 0] < vals[..., 1]
    return jnp.where(bits, 1, -1).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_features", "n_levels", "scale_factor",
        "init_threshold", "min_threshold", "cell_size",
    ),
)
def extract_orb(
    gray: jax.Array,
    n_features: int = 1000,
    n_levels: int = 8,
    scale_factor: float = 1.2,
    init_threshold: float = 20.0,
    min_threshold: float = 7.0,
    cell_size: int = 35,
) -> OrbFeatures:
    """Extract ORB keypoints + descriptors from a (H, W) grayscale image.

    One XLA program; the pyramid loop is unrolled over the static
    `n_levels`.  Returns exactly `n_features` rows (per-level geometric
    quotas) with a validity mask.
    """
    h, w = gray.shape
    quotas = features_per_level(n_features, n_levels, scale_factor)
    img = gray.astype(jnp.float32)
    # DYNO_ORB_FORCE_PALLAS=1 exercises the canvas-packed kernel path in
    # interpret mode on CPU (tests)
    use_pallas = (
        jax.default_backend() == "tpu"
        or os.environ.get("DYNO_ORB_FORCE_PALLAS", "0") == "1"
    )

    uts, rts, ats, lts, sts, dts, vts = [], [], [], [], [], [], []
    pending = []            # canvas jobs: (level_img, blurred, uv, out_idx)
    level_img = img
    for lvl in range(n_levels):
        scale = scale_factor ** lvl
        lh, lw = level_img.shape
        if min(lh, lw) < 2 * EDGE_THRESHOLD + 8 or quotas[lvl] <= 0:
            # level too small — emit an all-invalid quota block
            q = max(quotas[lvl], 0)
            if q > 0:
                uts.append(jnp.zeros((q, 2), jnp.float32))
                rts.append(jnp.zeros((q,), jnp.float32))
                ats.append(jnp.zeros((q,), jnp.float32))
                lts.append(jnp.full((q,), lvl, jnp.int32))
                sts.append(jnp.full((q,), scale, jnp.float32))
                dts.append(jnp.zeros((q, 256), jnp.int8))
                vts.append(jnp.zeros((q,), bool))
        else:
            # FAST with per-cell init->min threshold fallback
            # (`ComputeKeyPointsOctTree`: cells where the init threshold
            # finds nothing are re-run at the min threshold)
            r_init, r_min = fast_response_pair(
                level_img, init_threshold, min_threshold
            )
            has_init = _cell_max(r_init, cell_size) > 0.0
            resp = jnp.where(has_init, r_init, r_min)

            border = jnp.zeros((lh, lw), bool)
            e = EDGE_THRESHOLD
            border = border.at[:e, :].set(True)
            border = border.at[-e:, :].set(True)
            border = border.at[:, :e].set(True)
            border = border.at[:, -e:].set(True)

            # NMS cell sized so the grid has ~4x the quota in cells (one
            # winner per cell — the density knob the octree subdivision
            # turns in the reference)
            nms_cell = int(math.sqrt(lh * lw / max(4 * quotas[lvl], 1)))
            nms_cell = max(4, min(nms_cell, cell_size))
            dets = detect_grid_nms(
                resp, border,
                max_corners=quotas[lvl],
                cell_size=nms_cell,
                quality_level=0.0,
            )
            blurred = _gaussian_blur7(level_img)
            if use_pallas:
                # per-element gathers serialize on TPU; the Pallas window
                # kernel does the same sampling as dense matrix arithmetic
                # (`ops/pallas/orb_sample.py`).  ALL levels run in ONE
                # canvas-packed call after the loop (placeholders here).
                ang = None
                desc = None
                pending.append((level_img, blurred, dets.uv, len(ats)))
            else:
                ang = _orientations(level_img, dets.uv)
                desc = _descriptors(blurred, dets.uv, ang)
            uts.append(dets.uv * scale)
            rts.append(dets.score)
            ats.append(ang)
            lts.append(jnp.full((quotas[lvl],), lvl, jnp.int32))
            sts.append(jnp.full((quotas[lvl],), scale, jnp.float32))
            dts.append(desc)
            vts.append(dets.valid & (dets.score > 0.0))
        if lvl + 1 < n_levels:
            nh = max(int(round(h / scale_factor ** (lvl + 1))), 1)
            nw = max(int(round(w / scale_factor ** (lvl + 1))), 1)
            level_img = jax.image.resize(img, (nh, nw), method="bilinear")

    if pending:
        # ---- one canvas-packed kernel call for every pyramid level ------
        # Levels stack vertically (each padded to 8-row alignment and the
        # base width); keypoint windows never read across a level band:
        # detected keypoints keep the 19 px EDGE_THRESHOLD margin while
        # orientation/tap samples reach at most +-16 px, and the kernel's
        # selection weights are zero outside the sampled rows, so whatever
        # the 48x256 VMEM window covers beyond the band is never selected.
        # This removes 7 per-level kernel launches (~0.1 ms fixed cost
        # each on the round-5 trace).
        from ..ops.pallas.orb_sample import orb_orientation_descriptors

        raws, blurs, uvs, y_offs = [], [], [], []
        y = 0
        for limg, lblur, luv, _ in pending:
            lh_, lw_ = limg.shape
            ph = (-lh_) % 8
            raws.append(jnp.pad(limg, ((0, ph), (0, w - lw_))))
            blurs.append(jnp.pad(lblur, ((0, ph), (0, w - lw_))))
            y_offs.append(y)
            y += lh_ + ph
        canvas_raw = jnp.concatenate(raws, axis=0)
        canvas_blur = jnp.concatenate(blurs, axis=0)
        uv_all = jnp.concatenate(
            [
                luv + jnp.asarray([0.0, yo], jnp.float32)
                for (_, _, luv, _), yo in zip(pending, y_offs)
            ],
            axis=0,
        )
        ang_all, desc_all = orb_orientation_descriptors(
            canvas_raw, canvas_blur, uv_all,
            interpret=jax.default_backend() != "tpu",
        )
        o = 0
        for (_, _, luv, idx) in pending:
            n_l = luv.shape[0]
            ats[idx] = ang_all[o : o + n_l]
            dts[idx] = desc_all[o : o + n_l]
            o += n_l

    return OrbFeatures(
        uv=jnp.concatenate(uts, axis=0),
        response=jnp.concatenate(rts, axis=0),
        angle=jnp.concatenate(ats, axis=0),
        level=jnp.concatenate(lts, axis=0),
        scale=jnp.concatenate(sts, axis=0),
        desc=jnp.concatenate(dts, axis=0),
        valid=jnp.concatenate(vts, axis=0),
    )


def orb_detections(feats: OrbFeatures) -> Detections:
    """View the extractor output as a detector candidate list (the
    `FunctionalDetector` adapter, `FeatureDetector.cc:55-83`), sorted by
    response so downstream budget cuts keep the strongest corners."""
    order = jnp.argsort(
        jnp.where(feats.valid, -feats.response, jnp.inf)
    )
    return Detections(
        uv=feats.uv[order], score=feats.response[order],
        valid=feats.valid[order],
    )


class Matches(NamedTuple):
    index: jax.Array     # (NA,) int32 best match in B for each A row
    distance: jax.Array  # (NA,) float32 Hamming distance (0..256)
    ok: jax.Array        # (NA,) bool — gates + mutual consistency


@functools.partial(jax.jit, static_argnames=("cross_check",))
def match_descriptors(
    desc_a: jax.Array,
    valid_a: jax.Array,
    desc_b: jax.Array,
    valid_b: jax.Array,
    max_hamming: float = 64.0,
    ratio: float = 0.8,
    cross_check: bool = True,
) -> Matches:
    """All-pairs Hamming matching as ONE MXU matmul on ±1 descriptors:
    ham = (256 - A @ B^T) / 2, then best/second-best gating (Lowe ratio)
    and mutual cross-check — the brute-force Hamming `BFMatcher` the
    reference's descriptor path implies, with zero gather stages."""
    n_bits = desc_a.shape[1]
    # DEFAULT (bf16) is BIT-EXACT here: both operands are ±1 (exactly
    # representable) and the f32 accumulator sums integers <= n_bits=256,
    # so no rounding can occur — unlike the geometry-matmul HIGHEST rule,
    # which exists for f32-valued rotations/coordinates.
    sim = jnp.matmul(
        desc_a.astype(jnp.float32), desc_b.astype(jnp.float32).T,
        precision=jax.lax.Precision.DEFAULT,
    )
    ham = (n_bits - sim) * 0.5
    big = jnp.float32(n_bits + 1)
    ham = jnp.where(valid_a[:, None] & valid_b[None, :], ham, big)

    best = jnp.argmin(ham, axis=1)
    d_best = jnp.min(ham, axis=1)
    oh = jax.nn.one_hot(best, ham.shape[1], dtype=ham.dtype)
    d_second = jnp.min(ham + oh * big, axis=1)
    ok = (d_best <= max_hamming) & (d_best <= ratio * d_second)
    if cross_check:
        best_rev = jnp.argmin(ham, axis=0)                    # (NB,)
        ok = ok & (best_rev[best] == jnp.arange(ham.shape[0]))
    return Matches(index=best.astype(jnp.int32), distance=d_best, ok=ok)
