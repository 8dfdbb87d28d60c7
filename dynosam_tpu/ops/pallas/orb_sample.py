"""Pallas TPU kernel: ORB orientation + steered-BRIEF sampling.

The XLA formulation (`frontend/orb.py` `_orientations`/`_descriptors`)
gathers ~1.9M orientation-patch elements and ~4M bilinear descriptor taps
per frame; TPU serializes per-element gathers at ~40 cycles each, which
would make the ORB detector mode unusable there (hundreds of ms).  Same
fix as `ops/pallas/lk.py`: per keypoint, load ONE tile-aligned window
with a `pl.ds` dynamic slice and restructure every access as dense
vector/matrix arithmetic on that window.

Round 5: the kernel is BLOCK-BATCHED like `lk.py`'s "stack" variant — the
round-5 ORB trace showed the per-feature form at 14.8 ms/frame, op-COUNT
bound (~20 sequential Mosaic ops per feature, each with fixed scheduling
cost).  All F features of a block now run as rank-3 batched ops:

  * the F windows are copied into one (F, SY, SX) VMEM scratch;
  * the intensity-centroid moments use batched one-hot selection
    `dot_general`s (P = R @ W @ C^T per feature, batch F);
  * the 512 rotated BRIEF taps bilinear-sample as
    `rowsum((Rt @ W) * Ct)` with (F, 512, SY/SX) 2-hot weights built by
    broadcasting — two fat ops instead of 512-tap per-feature chains.

Outputs match `frontend/orb.py`'s `_orientations`/`_descriptors` up to
float tolerance (same edge clamping; the XLA versions clip per sample).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...frontend import orb as _orb

import os as _os

# features per kernel program.  The round-5 trace put the block-batched
# kernel at ~100 us/BLOCK — dominated by per-block fixed cost (iota
# materialization, phase scheduling), so fatter blocks amortize it.
# 16 won the canvas-packed A/B (115.3 vs 113.2 fps in-pipeline,
# tpu_runs/orb_canvas_ab.txt); scratch is 16x48x256x4 = 786 KB.
_ORB_FEAT_BLOCK = int(_os.environ.get("DYNO_ORB_FEAT_BLOCK", "16"))

# dot precision for the selection/sampling matmuls.  DEFAULT (bf16) is the
# production setting: the weights are exact 0/1 one-hot rows resp. [0,1]
# bilinear coefficients over 8-bit-scale intensities, and the only effect
# of bf16 rounding is near-tie BRIEF bit flips — measured on-device vs
# HIGHEST: 99.19% descriptor-bit agreement, orientation err p99 0.022 rad
# (tpu_runs/orb_fb_prec_ab.txt), for +11% ORB-mode pipeline fps.  This is
# NOT the geometry-matmul precision rule (no rotations/poses flow through
# these dots).  Set DYNO_ORB_PRECISION=highest for bit-exact A/B against
# the XLA path.  Mosaic lowers only DEFAULT and HIGHEST.
_ORB_PRECISION = (
    jax.lax.Precision.HIGHEST
    if _os.environ.get("DYNO_ORB_PRECISION", "default") == "highest"
    else jax.lax.Precision.DEFAULT
)

HALF = _orb.HALF_PATCH                      # 15
_P31 = 2 * HALF + 1                         # orientation patch size

# circular moment masks (numpy at import; see orb.py tracer-leak note)
_oy, _ox = np.mgrid[-HALF:HALF + 1, -HALF:HALF + 1]
_circ = (_ox ** 2 + _oy ** 2) <= HALF ** 2
_WX = (_ox * _circ).astype(np.float32)      # (31, 31)
_WY = (_oy * _circ).astype(np.float32)

# BRIEF pattern as flat (512, 2) tap offsets.  The source interleaves the
# (a, b) tap pairs; de-interleave HERE (numpy, import time) so the kernel
# compares contiguous halves — a strided vals[0::2] slice lowers to a
# lane gather that Mosaic rejects ("Only 2D gather is supported").
_PAT_I = _orb._PATTERN.reshape(-1, 2).astype(np.float32)     # (512, 2)
_PAT = np.concatenate([_PAT_I[0::2], _PAT_I[1::2]], axis=0)  # a's then b's
_N_TAPS = _PAT.shape[0]
_N_PAIRS = _N_TAPS // 2


def _make_kernel(h: int, w: int, orig_h: int, orig_w: int, feat_block: int):
    # Window coverage: the patch spans floor(p)-16 .. floor(p)+17
    # (orientation +-15 with nearest-int rounding, taps +-13 with +1
    # bilinear).  The start is floor(p)-16 rounded DOWN to the tile grid
    # (8 rows / 128 lanes of slack), so SY >= 17+16+7+1 -> 48 and
    # SX >= 17+16+127+1 -> 256.  (h, w) are the TILE-ALIGNED padded image
    # dims (the wrapper pads to multiples of (8, 128) — without that,
    # mid-pyramid levels like 267x889 forced FULL-IMAGE windows and the
    # kernel cost 7x more at those levels than at aligned full-res);
    # (orig_h, orig_w) bound the coordinate clips so results are
    # identical to the unpadded XLA reference.
    SY = min(h, 48)
    SX = min(w, 256)
    assert (h - SY) % 8 == 0 and (w - SX) % 128 == 0, (h, w, SY, SX)
    F = feat_block

    def kernel(p_ref, pat_ref, raw_ref, blur_ref, ang_ref, desc_ref,
               wstk_ref):
        base = pl.program_id(0) * F
        if F % 8 == 0:
            base = pl.multiple_of(base, 8)
        pv = p_ref[pl.ds(base, F), :]
        # pattern ships TRANSPOSED (2, 512): a [:, 0] column index on the
        # minor dim lowers to a Mosaic gather; row slices are free
        pat_x = pat_ref[0:1, :]                              # (1, 512)
        pat_y = pat_ref[1:2, :]

        def _rsum12(x):
            # Mosaic crashes on multi-axis reduces of rank-3 values —
            # reduce one axis at a time
            return jnp.sum(jnp.sum(x, axis=2), axis=1)

        def load_stack(ref, off_y, off_x):
            """Fill the (F, SY, SX) scratch with per-feature windows;
            returns the window-origin vectors (F, 1) as floats."""
            jy0s, jx0s = [], []
            for f in range(F):
                px = pv[f, 0]
                py = pv[f, 1]
                if SY == h:
                    jy0 = 0
                else:
                    jy0 = jnp.clip(
                        ((jnp.floor(py).astype(jnp.int32) - 16) // 8) * 8,
                        0, h - SY,
                    )
                    jy0 = pl.multiple_of(jy0, 8)
                if SX == w:
                    jx0 = 0
                else:
                    jx0 = jnp.clip(
                        ((jnp.floor(px).astype(jnp.int32) - 16) // 128)
                        * 128, 0, w - SX,
                    )
                    jx0 = pl.multiple_of(jx0, 128)
                wstk_ref[f] = ref[pl.ds(jy0, SY), pl.ds(jx0, SX)]
                jy0s.append(jy0)
                jx0s.append(jx0)
            jy0v = jnp.stack(
                [jnp.asarray(j, jnp.float32) * 1.0 for j in jy0s]
            )[:, None]
            jx0v = jnp.stack(
                [jnp.asarray(j, jnp.float32) * 1.0 for j in jx0s]
            )[:, None]
            return jy0v, jx0v

        pxv = pv[:, 0:1]                                     # (F, 1)
        pyv = pv[:, 1:2]
        xiv = jnp.round(pxv)                                 # (F, 1) float
        yiv = jnp.round(pyv)

        # ---- orientation from the RAW level image ----------------------
        jy0v, jx0v = load_stack(raw_ref, 16, 16)
        Ws = wstk_ref[...]                                   # (F, SY, SX)
        # 2D per-feature coordinates FIRST ((F,1) broadcasts against
        # (F,31) are fine; a direct (F,1,1) broadcast_in_dim is an
        # "unsupported shape cast" in Mosaic), then lift to rank 3
        ri = jax.lax.broadcasted_iota(
            jnp.int32, (F, _P31), 1).astype(jnp.float32)
        rows2 = jnp.clip(yiv - HALF + ri, 0.0, orig_h - 1.0) - jy0v  # (F, 31)
        cols2 = jnp.clip(xiv - HALF + ri, 0.0, orig_w - 1.0) - jx0v
        jy = jax.lax.broadcasted_iota(
            jnp.int32, (F, _P31, SY), 2).astype(jnp.float32)
        Rm = (rows2[:, :, None] == jy).astype(jnp.float32)   # (F, 31, SY)
        jx = jax.lax.broadcasted_iota(
            jnp.int32, (F, _P31, SX), 2).astype(jnp.float32)
        Cm = (cols2[:, :, None] == jx).astype(jnp.float32)   # (F, 31, SX)
        RW = jax.lax.dot_general(
            Rm, Ws, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_ORB_PRECISION,
        )                                                    # (F, 31, SX)
        p31 = jax.lax.dot_general(
            RW, Cm, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_ORB_PRECISION,
        )                                                    # (F, 31, 31)
        oyk = jax.lax.broadcasted_iota(
            jnp.int32, (F, _P31, _P31), 1).astype(jnp.float32) - HALF
        oxk = jax.lax.broadcasted_iota(
            jnp.int32, (F, _P31, _P31), 2).astype(jnp.float32) - HALF
        circ = (oxk * oxk + oyk * oyk) <= float(HALF * HALF)
        m10 = _rsum12(p31 * jnp.where(circ, oxk, 0.0))       # (F,)
        m01 = _rsum12(p31 * jnp.where(circ, oyk, 0.0))

        # ---- steered BRIEF taps from the BLURRED level image ------------
        jy0b, jx0b = load_stack(blur_ref, 16, 16)
        Wb = wstk_ref[...]                                   # (F, SY, SX)
        r = jnp.sqrt(m10 * m10 + m01 * m01)
        r_ok = r > 0.0
        r_safe = jnp.where(r_ok, r, 1.0)
        ca = jnp.where(r_ok, m10 / r_safe, 1.0)[:, None]     # (F, 1)
        sa = jnp.where(r_ok, m01 / r_safe, 0.0)[:, None]
        tx = pxv + ca * pat_x - sa * pat_y                   # (F, 512)
        ty = pyv + sa * pat_x + ca * pat_y
        jyt = jax.lax.broadcasted_iota(
            jnp.int32, (F, _N_TAPS, SY), 2).astype(jnp.float32)
        jxt = jax.lax.broadcasted_iota(
            jnp.int32, (F, _N_TAPS, SX), 2).astype(jnp.float32)
        lyt2 = jnp.clip(ty, 0.0, orig_h - 1.0) - jy0b        # (F, 512)
        lxt2 = jnp.clip(tx, 0.0, orig_w - 1.0) - jx0b
        Rt = jnp.maximum(0.0, 1.0 - jnp.abs(lyt2[:, :, None] - jyt))
        Ct = jnp.maximum(0.0, 1.0 - jnp.abs(lxt2[:, :, None] - jxt))
        rw = jax.lax.dot_general(
            Rt, Wb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_ORB_PRECISION,
        )                                                    # (F, 512, SX)
        vals = jnp.sum(rw * Ct, axis=2)                      # (F, 512)
        a = vals[:, :_N_PAIRS]                               # de-interleaved
        b = vals[:, _N_PAIRS:]
        desc = jnp.where(a < b, 1.0, -1.0)                   # (F, 256)

        ang_ref[pl.ds(base, F), :] = jnp.stack([m01, m10], axis=-1)
        desc_ref[pl.ds(base, F), :] = desc

    return kernel, SY, SX


@functools.partial(jax.jit, static_argnames=("feat_block", "interpret"))
def orb_orientation_descriptors(
    raw_img: jax.Array,      # (H, W) level image (orientation source)
    blur_img: jax.Array,     # (H, W) blurred level image (BRIEF source)
    uv: jax.Array,           # (N, 2) keypoint positions at this level
    feat_block: int | None = None,
    interpret: bool = False,
):
    """Returns (angle (N,), desc (N, 256) int8 ±1) — the Pallas analog of
    `frontend.orb._orientations` + `_descriptors` in one pass."""
    orig_h, orig_w = raw_img.shape
    # tile-align the level image so the kernel always gets 48x256 windows
    # (unaligned dims previously forced full-image windows — 7x slower)
    ph = (-orig_h) % 8
    pw = (-orig_w) % 128
    if ph or pw:
        raw_img = jnp.pad(raw_img, ((0, ph), (0, pw)))
        blur_img = jnp.pad(blur_img, ((0, ph), (0, pw)))
    h, w = raw_img.shape
    if feat_block is None:
        feat_block = _ORB_FEAT_BLOCK
    n = uv.shape[0]
    pad = (-n) % feat_block
    if pad:
        uv = jnp.pad(uv, ((0, pad), (0, 0)))
    np_ = uv.shape[0]
    kernel, SY_, SX_ = _make_kernel(h, w, orig_h, orig_w, feat_block)
    ang, desc = pl.pallas_call(
        kernel,
        grid=(np_ // feat_block,),
        in_specs=[
            pl.BlockSpec((np_, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _N_TAPS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((np_, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, 2), jnp.float32),
            jax.ShapeDtypeStruct((np_, 256), jnp.float32),
        ],
        scratch_shapes=(
            pltpu.VMEM((feat_block, SY_, SX_), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(uv.astype(jnp.float32), jnp.asarray(_PAT.T.copy()), raw_img, blur_img)
    # the kernel emits the raw centroid moments (m01, m10) — Mosaic has no
    # atan2 lowering, so the angle is reconstructed here on the XLA side
    angle = jnp.arctan2(ang[:n, 0], ang[:n, 1])
    return angle, desc[:n].astype(jnp.int8)
