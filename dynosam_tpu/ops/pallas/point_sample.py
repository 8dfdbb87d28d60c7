"""Pallas TPU kernel: batched point sampling (bilinear / nearest).

The frontend samples image channels (depth, dense flow, instance masks,
occupancy) at feature positions ~170K taps per frame across ~10 call
sites; XLA lowers each arbitrary-coordinate `img[y, x]` gather to ~40
serialized cycles on TPU (~7 ms/frame total).  Same cure as
`ops/pallas/lk.py`: per point, ONE tile-aligned `pl.ds` window load and
the taps restructured as a dense 2-hot/1-hot weight-mask reduction —
zero gathers.  All channels of a call share the window coordinates, so a
C-channel query costs one weight build + C window reductions.

Semantics match `ops.klt.bilinear_sample` (coords clipped to the image,
then 2-hot bilinear weights — border-clamped) and `ops.klt.nearest_at`
(round + clip) bit-for-bit up to float association order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(c: int, h: int, w: int, feat_block: int, modes):
    # window must contain floor(y) .. floor(y)+1 after aligning the start
    # down to the (8, 128) tile grid -> 8+1+7 rows, 128+1+127 lanes
    SY = min(h, 16)
    SX = min(w, 256)
    if SY != h and (h - SY) % 8 != 0:
        SY = h
    if SX != w and (w - SX) % 128 != 0:
        SX = w

    def kernel(p_ref, v_ref, img_ref, out_ref):
        base = pl.program_id(0) * feat_block
        if feat_block % 8 == 0:
            base = pl.multiple_of(base, 8)
        pv = p_ref[pl.ds(base, feat_block), :]
        vv = v_ref[pl.ds(base, feat_block), 0]

        def dead_block():
            return jnp.zeros((feat_block, c), jnp.float32)

        def live_block():
            outs = []
            for f in range(feat_block):
                def tap(f=f):
                    x = jnp.clip(pv[f, 0], 0.0, w - 1.0)
                    y = jnp.clip(pv[f, 1], 0.0, h - 1.0)
                    if SY == h:
                        jy0 = 0
                    else:
                        jy0 = jnp.clip(
                            (jnp.floor(y).astype(jnp.int32) // 8) * 8,
                            0, h - SY,
                        )
                        jy0 = pl.multiple_of(jy0, 8)
                    if SX == w:
                        jx0 = 0
                    else:
                        jx0 = jnp.clip(
                            (jnp.floor(x).astype(jnp.int32) // 128) * 128,
                            0, w - SX,
                        )
                        jx0 = pl.multiple_of(jx0, 128)
                    # the bilinear/nearest weights are separable, w[i,j] =
                    # wy[i] * wx[j]: build them as a column and a row vector
                    # and expand with ONE broadcast product instead of
                    # computing abs/max/compare over full (SY, SX) grids;
                    # each channel then costs one fused mul+reduce pass.
                    yv = (
                        jax.lax.broadcasted_iota(jnp.int32, (SY, 1), 0) + jy0
                    ).astype(jnp.float32)
                    xv = (
                        jax.lax.broadcasted_iota(jnp.int32, (1, SX), 1) + jx0
                    ).astype(jnp.float32)
                    need_bil = any(m == "bilinear" for m in modes)
                    need_near = any(m == "nearest" for m in modes)
                    if need_bil:
                        wb = jnp.maximum(0.0, 1.0 - jnp.abs(y - yv)) * (
                            jnp.maximum(0.0, 1.0 - jnp.abs(x - xv))
                        )
                    if need_near:
                        wn = (yv == jnp.round(y)).astype(jnp.float32) * (
                            xv == jnp.round(x)
                        ).astype(jnp.float32)
                    vals = []
                    for ci, mode in enumerate(modes):
                        wc = img_ref[ci, pl.ds(jy0, SY), pl.ds(jx0, SX)]
                        wsel = wb if mode == "bilinear" else wn
                        vals.append(jnp.sum(wc * wsel))
                    return jnp.stack(vals)

                # inactive pool slots skip their window loads/reduces
                # entirely (a real branch in Mosaic, not a masked select)
                outs.append(jax.lax.cond(
                    vv[f] > 0.0, tap, lambda: jnp.zeros((c,), jnp.float32)
                ))
            return jnp.stack(outs)

        # fully-dead blocks skip even the per-point branching
        out_ref[pl.ds(base, feat_block), :] = jax.lax.cond(
            jnp.max(vv) > 0.0, live_block, dead_block
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("modes", "feat_block", "interpret")
)
def point_sample(
    stack: jax.Array,        # (C, H, W) float32 channel stack
    uv: jax.Array,           # (N, 2) float (x, y)
    modes: tuple,            # per-channel "bilinear" | "nearest"
    valid: jax.Array | None = None,   # (N,) active mask; inactive rows -> 0
    feat_block: int = 8,
    interpret: bool = False,
) -> jax.Array:              # (N, C) float32
    c, h, w = stack.shape
    assert len(modes) == c
    n = uv.shape[0]
    if valid is None:
        vf = jnp.ones((n, 1), jnp.float32)
    else:
        vf = valid.astype(jnp.float32)[:, None]
    pad = (-n) % feat_block
    if pad:
        uv = jnp.pad(uv, ((0, pad), (0, 0)))
        vf = jnp.pad(vf, ((0, pad), (0, 0)))
    np_ = uv.shape[0]
    kernel = _make_kernel(c, h, w, feat_block, tuple(modes))
    out = pl.pallas_call(
        kernel,
        grid=(np_ // feat_block,),
        in_specs=[
            pl.BlockSpec((np_, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, h, w), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((np_, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(uv.astype(jnp.float32), vf, stack.astype(jnp.float32))
    return out[:n]
