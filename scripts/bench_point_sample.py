#!/usr/bin/env python
"""A/B the Pallas point-sample kernel vs an exact one-hot MXU sampler.

Bilinear sampling as matmuls: split the f32 image into bf16 hi + lo
halves (img = hi + lo exactly, both exact in bf16), gather the x0 / x1
columns with 0/1 one-hot matrices (exact in bf16), recombine in f32 and
blend with the f32 fractional weights.  Four DEFAULT-precision MXU
passes reproduce the exact-f32 gather; the serialized per-point window
reductions disappear.

Usage: python scripts/bench_point_sample.py [n_points]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def onehot_bilinear(img, uv, valid):
    """Exact bilinear sample of (H, W) f32 at (N, 2) uv — MXU one-hots."""
    h, w = img.shape
    n = uv.shape[0]
    x = jnp.clip(uv[:, 0], 0.0, w - 1.0)
    y = jnp.clip(uv[:, 1], 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    a = (x - x0)[:, None]
    b = (y - y0)[:, None]
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    iw = jnp.arange(w, dtype=jnp.int32)
    ih = jnp.arange(h, dtype=jnp.int32)
    # 0/1 one-hots are exact in bf16; x1/y1 clamp to the border (clip
    # semantics of ops.klt.bilinear_sample)
    ex0 = (iw[None, :] == xi[:, None])
    ex1 = (iw[None, :] == jnp.minimum(xi + 1, w - 1)[:, None])
    ey0 = (ih[None, :] == yi[:, None])
    ey1 = (ih[None, :] == jnp.minimum(yi + 1, h - 1)[:, None])
    # CRITICAL: the hi/lo split must be built by BIT MASKING, not by
    # convert round-trips — XLA:TPU folds bf16(img - f32(bf16(img))) to
    # zero (convert-roundtrip simplification), silently degrading the
    # sampler to single-bf16 accuracy (measured 0.117 abs error).  The
    # masked top half is exact in bf16 by construction (sign + 8 exp +
    # 7 mantissa bits), the f32 residual rounds once to bf16 (~2^-16
    # relative total).
    ui = jax.lax.bitcast_convert_type(img, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        ui & jnp.uint32(0xFFFF0000), jnp.float32
    )
    lo = img - hi                       # exact f32, |lo| < 2^-8 |img|
    hilo = jnp.concatenate([hi, lo], axis=0)            # (2H, W) bf16

    def gcols(e):   # (N, W) one-hot -> (2H, N) exact f32 column gather
        return jnp.matmul(
            hilo, e.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )

    c0 = gcols(ex0)                     # (2H, N)
    c1 = gcols(ex1)
    col = c0.T * (1.0 - a) + c1.T * a   # (N, 2H) x-interpolated column
    ey0_2 = jnp.concatenate([ey0, ey0], axis=1)
    ey1_2 = jnp.concatenate([ey1, ey1], axis=1)
    r0 = jnp.sum(jnp.where(ey0_2, col, 0.0), axis=1)    # hi + lo folded in
    r1 = jnp.sum(jnp.where(ey1_2, col, 0.0), axis=1)
    out = r0 * (1.0 - b[:, 0]) + r1 * b[:, 0]
    return jnp.where(valid, out, 0.0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    h, w = 384, 1280
    r = np.random.default_rng(0)
    img = jnp.asarray(r.normal(size=(h, w)) * 10 + 30, jnp.float32)
    uv = jnp.asarray(
        np.stack([r.uniform(0, w - 1, n), r.uniform(0, h - 1, n)], -1),
        jnp.float32,
    )
    valid = jnp.asarray(r.uniform(size=n) > 0.1)

    from dynosam_tpu.ops.pallas.point_sample import point_sample

    f_pal = jax.jit(lambda im, p, v: point_sample(
        im[None], p, ("bilinear",), valid=v)[:, 0])
    f_mxu = jax.jit(onehot_bilinear)

    ref = np.asarray(f_pal(img, uv, valid))
    new = np.asarray(f_mxu(img, uv, valid))
    print("max |diff|:", np.abs(ref - new).max())

    # scan-bench: K chained reps with varying uv (defeat CSE), fetch barrier
    def bench(f, tag, k=60):
        @jax.jit
        def run(img, uv, valid):
            def step(carry, i):
                out = f(img, uv + (i % 3) * 1e-3, valid)
                return carry + jnp.sum(out), None
            s, _ = jax.lax.scan(
                step, jnp.asarray(0.0, jnp.float32),
                jnp.arange(k, dtype=jnp.float32),
            )
            return s
        float(np.asarray(run(img, uv, valid)))      # compile
        t0 = time.time()
        float(np.asarray(run(img, uv, valid)))
        dt = (time.time() - t0) / k * 1e3
        print(f"{tag}: {dt:.3f} ms per call (n={n})")
        return dt

    bench(f_pal, "pallas point_sample")
    bench(f_mxu, "one-hot MXU sampler")


if __name__ == "__main__":
    main()
