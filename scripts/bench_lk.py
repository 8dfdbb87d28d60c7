#!/usr/bin/env python
"""Microbenchmark for the Pallas LK kernel variants on the real TPU.

Times `klt_track_pallas` configurations with the fetch-barrier protocol
(chained reps whose inputs depend on the previous output, one scalar fetch
at the end — `jax.block_until_ready` does not wait under the axon tunnel).

Usage:  python scripts/bench_lk.py [n_feats] [feat_block]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=10, label=""):
    out = fn(*args)                       # compile
    float(np.asarray(out[0]).sum())       # fetch barrier

    @jax.jit
    def chained(args):
        o = None
        a = args
        for _ in range(reps):
            o = fn(*a)
            # serialize: next rep's uv depends on this rep's output
            a = (a[0], a[1], a[2] + 0.0 * o[0], a[3])
        return o

    o = chained(args)
    float(np.asarray(o[0]).sum())
    t0 = time.perf_counter()
    o = chained(args)
    s = float(np.asarray(o[0]).sum())
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:42s} {dt*1e3:8.2f} ms  (chk {s:.1f})")
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    fb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    h, w = 384, 1280
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (h + 8, w + 8)).astype(np.float32)
    # smooth correlated texture so LK iterations do real work
    img0 = jnp.asarray(base[:h, :w])
    img1 = jnp.asarray(base[3:3 + h, 2:2 + w])
    for _ in range(2):
        k = jnp.ones((5, 5), jnp.float32) / 25.0
        img0 = jax.scipy.signal.convolve2d(img0, k, mode="same")
        img1 = jax.scipy.signal.convolve2d(img1, k, mode="same")
    uv = jnp.asarray(
        rng.uniform([30, 30], [w - 30, h - 30], (n, 2)), jnp.float32
    )
    valid = jnp.ones((n,), bool)

    from dynosam_tpu.ops.pallas import lk

    # production path first (warm start, 1 level x 10 iters): one Mosaic
    # kernel compile instead of three
    g0 = jnp.zeros_like(uv) + jnp.asarray([2.0, 3.0], jnp.float32)

    def warm_fn(i0, i1, p, v):
        r = lk.klt_track_pallas(
            i0, i1, p, v, levels=1, iters=10, eps=0.01, g0=g0,
            feat_block=fb,
        )
        return (r.uv, r.error)

    timed(warm_fn, img0, img1, uv, valid,
          label=f"lk warm-start 1x10 eps=0.01 fb={fb}")

    def cold_fn(i0, i1, p, v):
        r = lk.klt_track_pallas(i0, i1, p, v, eps=0.01, feat_block=fb)
        return (r.uv, r.error)

    timed(cold_fn, img0, img1, uv, valid,
          label=f"lk cold 3x30 eps=0.01 fb={fb}")

    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
