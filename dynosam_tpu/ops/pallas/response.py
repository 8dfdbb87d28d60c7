"""Pallas TPU kernel: fused Shi-Tomasi corner response.

One pass over the image in VMEM: Sobel gradients, gradient products, 5x5
box sums and the 2x2 min-eigenvalue — all fused, one HBM read + one HBM
write per pixel.  The XLA formulations either lower 1-channel convs through
MXU-shaped conv machinery (~9 ms on a 384x1280 frame) or materialize
several intermediates (integral-image variant, ~1.1 ms); this kernel is
pure VPU arithmetic on VMEM-resident data.

A KITTI-sized f32 frame is ~2 MB, comfortably VMEM-resident, so the kernel
runs as a single program over the whole image (row-tiling with halo DMA is
the >16 MB fallback; until then `detect.shi_tomasi_response_fast` covers
huge frames).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift2d(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Edge-clamped shift (SAME-boundary behaviour, matches detect.py)."""
    h, w = x.shape
    if dy > 0:
        x = jnp.concatenate([x[dy:], jnp.broadcast_to(x[-1:], (dy, w))], 0)
    elif dy < 0:
        x = jnp.concatenate([jnp.broadcast_to(x[:1], (-dy, w)), x[:dy]], 0)
    if dx > 0:
        x = jnp.concatenate([x[:, dx:], jnp.broadcast_to(x[:, -1:], (h, dx))], 1)
    elif dx < 0:
        x = jnp.concatenate([jnp.broadcast_to(x[:, :1], (h, -dx)), x[:, :dx]], 1)
    return x


def _response_kernel(in_ref, out_ref):
    img = in_ref[:]

    tl = _shift2d(img, -1, -1)
    tc = _shift2d(img, -1, 0)
    tr = _shift2d(img, -1, 1)
    ml = _shift2d(img, 0, -1)
    mr = _shift2d(img, 0, 1)
    bl = _shift2d(img, 1, -1)
    bc = _shift2d(img, 1, 0)
    br = _shift2d(img, 1, 1)
    ix = ((tr + 2.0 * mr + br) - (tl + 2.0 * ml + bl)) * 0.125
    iy = ((bl + 2.0 * bc + br) - (tl + 2.0 * tc + tr)) * 0.125

    gxx = ix * ix
    gyy = iy * iy
    gxy = ix * iy

    def box5(a):
        ay = a
        for d in (-2, -1, 1, 2):
            ay = ay + _shift2d(a, d, 0)
        ax = ay
        for d in (-2, -1, 1, 2):
            ax = ax + _shift2d(ay, 0, d)
        return ax * (1.0 / 25.0)

    sxx = box5(gxx)
    syy = box5(gyy)
    sxy = box5(gxy)

    tr_ = sxx + syy
    rad = jnp.sqrt(jnp.maximum((sxx - syy) ** 2 + 4.0 * sxy * sxy, 0.0))
    out_ref[:] = 0.5 * (tr_ - rad)


# whole-image single program; beyond this, fall back to the XLA version
_VMEM_BUDGET_PX = 4 * 1024 * 1024 // 4  # ~1M f32 pixels (input tile)


@jax.jit
def shi_tomasi_response_pallas(gray: jax.Array) -> jax.Array:
    """(H, W) f32 -> (H, W) min-eigenvalue corner response."""
    return pl.pallas_call(
        _response_kernel,
        out_shape=jax.ShapeDtypeStruct(gray.shape, gray.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(gray)


def shi_tomasi_response_auto(gray: jax.Array) -> jax.Array:
    """Pallas kernel when the frame fits VMEM, XLA fallback otherwise."""
    h, w = gray.shape
    if h * w <= _VMEM_BUDGET_PX:
        return shi_tomasi_response_pallas(gray)
    from ...frontend.detect import shi_tomasi_response_fast

    return shi_tomasi_response_fast(gray)
