"""Pallas TPU kernel: ORB orientation + steered-BRIEF sampling.

The XLA formulation (`frontend/orb.py` `_orientations`/`_descriptors`)
gathers ~1.9M orientation-patch elements and ~4M bilinear descriptor taps
per frame; TPU serializes per-element gathers at ~40 cycles each, which
would make the ORB detector mode unusable there (hundreds of ms).  Same
fix as `ops/pallas/lk.py`: per keypoint, load ONE tile-aligned window
with a `pl.ds` dynamic slice and restructure every access as dense
vector/matrix arithmetic on that window:

  * the intensity-centroid moments are `sum(P * WX)` where P is the 31x31
    patch extracted with separable one-hot selection matrices
    (P = R @ W @ C^T — exact integer selection, no gather) and WX/WY are
    the precomputed circular moment masks;
  * the 512 rotated BRIEF taps are bilinear-sampled as
    `rowsum((R_t @ Wb) * C_t)` with 2-hot row/column weight matrices
    built from the rotated pattern coordinates by broadcasting — one
    (512, SY) @ (SY, SX) matmul + one elementwise reduce per keypoint.

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


def _make_kernel(h: int, w: int, feat_block: int):
    # Window coverage: the patch spans floor(p)-16 .. floor(p)+17
    # (orientation +-15 with nearest-int rounding, taps +-13 with +1
    # bilinear).  The start is floor(p)-16 rounded DOWN to the tile grid
    # (8 rows / 128 lanes of slack), so SY >= 17+16+7+1 -> 48 and
    # SX >= 17+16+127+1 -> 256.
    SY = min(h, 48)
    SX = min(w, 256)
    if SY != h and (h - SY) % 8 != 0:
        SY = h
    if SX != w and (w - SX) % 128 != 0:
        SX = w

    def kernel(p_ref, pat_ref, raw_ref, blur_ref, ang_ref, desc_ref):
        base = pl.program_id(0) * feat_block
        if feat_block % 8 == 0:
            base = pl.multiple_of(base, 8)
        pv = p_ref[pl.ds(base, feat_block), :]

        # circular moment masks rebuilt from iota (Pallas kernels cannot
        # capture array constants)
        oy = jax.lax.broadcasted_iota(
            jnp.int32, (_P31, _P31), 0).astype(jnp.float32) - HALF
        ox = jax.lax.broadcasted_iota(
            jnp.int32, (_P31, _P31), 1).astype(jnp.float32) - HALF
        circ = (ox * ox + oy * oy) <= float(HALF * HALF)
        wx = jnp.where(circ, ox, 0.0)
        wy = jnp.where(circ, oy, 0.0)
        pat = pat_ref[:, :]                                  # (512, 2)

        def window(ref, px, py):
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
                    ((jnp.floor(px).astype(jnp.int32) - 16) // 128) * 128,
                    0, w - SX,
                )
                jx0 = pl.multiple_of(jx0, 128)
            return ref[pl.ds(jy0, SY), pl.ds(jx0, SX)], jy0, jx0

        angs = []
        descs = []
        for f in range(feat_block):
            px = pv[f, 0]
            py = pv[f, 1]

            # ---- orientation from the RAW level image ------------------
            wraw, jy0, jx0 = window(raw_ref, px, py)
            xi = jnp.round(px).astype(jnp.int32)
            yi = jnp.round(py).astype(jnp.int32)
            # one-hot selection matrices for the integer 31x31 patch with
            # per-sample edge clamping (matches orb._orientations' clip)
            ry = jax.lax.broadcasted_iota(jnp.int32, (_P31, SY), 0)
            jy = jax.lax.broadcasted_iota(jnp.int32, (_P31, SY), 1)
            rows = jnp.clip(yi - HALF + ry, 0, h - 1) - jy0
            Rm = (rows == jy).astype(jnp.float32)            # (31, SY)
            rx = jax.lax.broadcasted_iota(jnp.int32, (_P31, SX), 0)
            jx = jax.lax.broadcasted_iota(jnp.int32, (_P31, SX), 1)
            cols = jnp.clip(xi - HALF + rx, 0, w - 1) - jx0
            Cm = (cols == jx).astype(jnp.float32)            # (31, SX)
            p31 = jnp.dot(
                jnp.dot(Rm, wraw, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST),
                Cm.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                                 # (31, 31)
            m10 = jnp.sum(p31 * wx)
            m01 = jnp.sum(p31 * wy)
            # Mosaic has no atan2 lowering; the steering only needs
            # cos/sin of the centroid angle, which come straight from the
            # normalized moment vector (exactly cos/sin(atan2(m01, m10)),
            # and the zero-moment case matches atan2(0,0)=0).  The angle
            # itself is reconstructed by the wrapper via XLA arctan2.
            angs.append(jnp.stack([m01, m10]))

            # ---- steered BRIEF taps from the BLURRED level image -------
            wblur, jy0b, jx0b = window(blur_ref, px, py)
            r = jnp.sqrt(m10 * m10 + m01 * m01)
            r_ok = r > 0.0
            r_safe = jnp.where(r_ok, r, 1.0)
            ca = jnp.where(r_ok, m10 / r_safe, 1.0)
            sa = jnp.where(r_ok, m01 / r_safe, 0.0)
            tx = px + ca * pat[:, 0] - sa * pat[:, 1]        # (512,)
            ty = py + sa * pat[:, 0] + ca * pat[:, 1]
            # 2-hot bilinear row/col weights against the window grid
            jyt = jax.lax.broadcasted_iota(
                jnp.int32, (_N_TAPS, SY), 1).astype(jnp.float32)
            jxt = jax.lax.broadcasted_iota(
                jnp.int32, (_N_TAPS, SX), 1).astype(jnp.float32)
            lyt = jnp.clip(ty, 0.0, h - 1.0)[:, None] - jy0b * 1.0
            lxt = jnp.clip(tx, 0.0, w - 1.0)[:, None] - jx0b * 1.0
            Rt = jnp.maximum(0.0, 1.0 - jnp.abs(lyt - jyt))  # (512, SY)
            Ct = jnp.maximum(0.0, 1.0 - jnp.abs(lxt - jxt))  # (512, SX)
            rw = jnp.dot(Rt, wblur, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            vals = jnp.sum(rw * Ct, axis=1)                  # (512,)
            a = vals[:_N_PAIRS]                              # de-interleaved
            b = vals[_N_PAIRS:]
            descs.append(jnp.where(a < b, 1.0, -1.0))        # (256,)

        ang_ref[pl.ds(base, feat_block), :] = jnp.stack(angs)  # (F, 2)
        desc_ref[pl.ds(base, feat_block), :] = jnp.stack(descs)

    return kernel, SY, SX


@functools.partial(jax.jit, static_argnames=("feat_block", "interpret"))
def orb_orientation_descriptors(
    raw_img: jax.Array,      # (H, W) level image (orientation source)
    blur_img: jax.Array,     # (H, W) blurred level image (BRIEF source)
    uv: jax.Array,           # (N, 2) keypoint positions at this level
    feat_block: int = 8,
    interpret: bool = False,
):
    """Returns (angle (N,), desc (N, 256) int8 ±1) — the Pallas analog of
    `frontend.orb._orientations` + `_descriptors` in one pass."""
    h, w = raw_img.shape
    n = uv.shape[0]
    pad = (-n) % feat_block
    if pad:
        uv = jnp.pad(uv, ((0, pad), (0, 0)))
    np_ = uv.shape[0]
    kernel, _, _ = _make_kernel(h, w, feat_block)
    ang, desc = pl.pallas_call(
        kernel,
        grid=(np_ // feat_block,),
        in_specs=[
            pl.BlockSpec((np_, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_N_TAPS, 2), lambda i: (0, 0),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(uv.astype(jnp.float32), jnp.asarray(_PAT), raw_img, blur_img)
    # the kernel emits the raw centroid moments (m01, m10) — Mosaic has no
    # atan2 lowering, so the angle is reconstructed here on the XLA side
    angle = jnp.arctan2(ang[:n, 0], ang[:n, 1])
    return angle, desc[:n].astype(jnp.int8)
