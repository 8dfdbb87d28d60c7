"""Exact batched point sampling as one-hot MXU matmuls.

Replaces the Pallas window-reduction point kernel (`ops/pallas/
point_sample.py`) on the hot path: per point that kernel loads a
tile-aligned (16, 256) window and runs a serialized weighted reduction
(~0.4 ms per 8K-point call); here the x-gather is ONE dense matmul of the
image against 0/1 one-hot columns (MXU, ~full utilization) and the
y-stage a masked lane reduction — measured 4.4x faster at n=8192
(scripts/bench_point_sample.py), identical call signature.

Exactness: 0/1 one-hots are exact in bf16, and the f32 image is split
into two bf16 halves that each multiply exactly (f32 accumulation), so
the gather reproduces the f32 pixel to ~2^-16 relative (the lo half's
single rounding).  Two traps the implementation works around, both
measured (BENCH_NOTES session 5):

  * the hi/lo split MUST be built by bit-masking the f32 mantissa — XLA
    folds the textbook ``bf16(img - f32(bf16(img)))`` residual to ZERO
    (convert-roundtrip simplification), silently degrading to single-bf16
    accuracy;
  * the halves must never recombine in a plain ``dot(hi,e) + dot(lo,e)``
    — the algebraic simplifier rewrites it to ``dot(hi+lo, e)`` with a
    bf16 re-round.  They ride one stacked matmul and meet inside the
    y-stage masked reduction instead.

Semantics match `ops.klt.bilinear_sample` / `nearest_at` (coords clipped
to the image, border-clamped 2-hot weights / round-half-even) like the
Pallas kernel; rows masked by `valid` come back 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("modes",))
def point_sample_mxu(
    stack: jax.Array,        # (C, H, W) channel stack
    uv: jax.Array,           # (N, 2) float (x, y)
    modes: tuple,            # per-channel "bilinear" | "nearest"
    valid: jax.Array | None = None,   # (N,) mask; inactive rows -> 0
) -> jax.Array:              # (N, C) float32
    c, h, w = stack.shape
    modes = tuple(modes)
    assert len(modes) == c
    f32 = jnp.float32
    img = stack.astype(f32)
    x = jnp.clip(uv[:, 0].astype(f32), 0.0, w - 1.0)
    y = jnp.clip(uv[:, 1].astype(f32), 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    a = x - x0
    b = y - y0
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    iw = jnp.arange(w, dtype=jnp.int32)
    ih = jnp.arange(h, dtype=jnp.int32)

    # exact-in-bf16 split by mantissa masking (see module docstring)
    ui = jax.lax.bitcast_convert_type(img, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(ui & jnp.uint32(0xFFFF0000), f32)
    lo = img - hi                        # exact f32, |lo| < 2^-8 |img|
    hilo = jnp.concatenate([hi, lo], axis=1)         # (C, 2H, W)
    hilo = hilo.reshape(c * 2 * h, w).astype(jnp.bfloat16)

    def xgather(e):      # (N, W) one-hot -> (C, N, 2H) exact columns
        m = jnp.matmul(
            hilo, e.T.astype(jnp.bfloat16), preferred_element_type=f32
        )
        return jnp.swapaxes(m.reshape(c, 2 * h, -1), -1, -2)

    outs = [None] * c
    if "bilinear" in modes:
        ex0 = iw[None, :] == xi[:, None]
        ex1 = iw[None, :] == jnp.minimum(xi + 1, w - 1)[:, None]
        col = (
            xgather(ex0) * (1.0 - a)[:, None] + xgather(ex1) * a[:, None]
        )                                            # (C, N, 2H)
        ey0 = ih[None, :] == yi[:, None]
        ey1 = ih[None, :] == jnp.minimum(yi + 1, h - 1)[:, None]
        r0 = jnp.sum(
            jnp.where(jnp.concatenate([ey0, ey0], axis=1), col, 0.0), axis=-1
        )
        r1 = jnp.sum(
            jnp.where(jnp.concatenate([ey1, ey1], axis=1), col, 0.0), axis=-1
        )
        outb = r0 * (1.0 - b) + r1 * b               # (C, N)
        for ci, m in enumerate(modes):
            if m == "bilinear":
                outs[ci] = outb[ci]
    if "nearest" in modes:
        exn = iw[None, :] == jnp.round(x).astype(jnp.int32)[:, None]
        eyn = ih[None, :] == jnp.round(y).astype(jnp.int32)[:, None]
        coln = xgather(exn)
        outn = jnp.sum(
            jnp.where(jnp.concatenate([eyn, eyn], axis=1), coln, 0.0),
            axis=-1,
        )
        for ci, m in enumerate(modes):
            if m == "nearest":
                outs[ci] = outn[ci]
    out = jnp.stack(outs, axis=-1)                   # (N, C)
    if valid is not None:
        out = jnp.where(valid[:, None], out, 0.0)
    return out
