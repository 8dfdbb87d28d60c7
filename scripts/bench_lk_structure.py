#!/usr/bin/env python
"""LK kernel STRUCTURE probe: where do the 5.4 ms/frame go?

Times `lk_level` (the production 1-level warm-start call) across
iteration budgets, eps gating, feat_block widths and variants, with the
fetch-barrier chained-reps protocol.  Answers, on real hardware:
  * does time scale with the iteration budget (loop-bound) or stay flat
    (template/load-bound)?
  * does the while early-exit (eps) actually save time vs a fixed fori?
  * does a wider unroll (feat_block) amortize per-program overhead?
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    h, w = 384, 1280
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (h + 8, w + 8)).astype(np.float32)
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
    # warm start ~0.5 px from the true shift (2, 3): production regime
    g0 = jnp.asarray([2.0, 3.0], jnp.float32) + jnp.asarray(
        rng.normal(0, 0.5, (n, 2)), jnp.float32
    )

    from dynosam_tpu.ops.pallas import lk

    def timed(label, reps=20, **kw):
        def fn(i0, i1, p, v, g):
            r = lk.klt_track_pallas(
                i0, i1, p, v, levels=1, g0=g, **kw
            )
            return (r.uv, r.error)

        out = fn(img0, img1, uv, valid, g0)
        float(np.asarray(out[0]).sum())

        @jax.jit
        def chained(i0, i1, p, v, g):
            o = None
            gg = g
            for _ in range(reps):
                o = fn(i0, i1, p, v, gg)
                gg = g + 0.0 * o[0]
            return o

        o = chained(img0, img1, uv, valid, g0)
        float(np.asarray(o[0]).sum())
        t0 = time.perf_counter()
        o = chained(img0, img1, uv, valid, g0)
        s = float(np.asarray(o[1]).sum())
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:52s} {dt*1e3:8.2f} ms  (err sum {s:.2f})", flush=True)

    timed("iters=10 eps=0.01 fb=8 reload (production)",
          iters=10, eps=0.01, variant="reload")
    timed("iters=3  eps=0.01 fb=8 reload", iters=3, eps=0.01,
          variant="reload")
    timed("iters=1  eps=0.0  fb=8 reload", iters=1, eps=0.0,
          variant="reload")
    timed("iters=10 eps=0.0  fb=8 reload (no early exit)",
          iters=10, eps=0.0, variant="reload")
    timed("iters=10 eps=0.01 fb=16 reload", iters=10, eps=0.01,
          feat_block=16, variant="reload")
    timed("iters=10 eps=0.01 fb=32 reload", iters=10, eps=0.01,
          feat_block=32, variant="reload")
    timed("iters=10 eps=0.01 fb=8 fma(roll)", iters=10, eps=0.01,
          variant="fma")
    timed("iters=10 eps=0.01 fb=32 fma(roll)", iters=10, eps=0.01,
          feat_block=32, variant="fma")
    timed("iters=10 eps=0.0  fb=8 fma(roll)", iters=10, eps=0.0,
          variant="fma")


if __name__ == "__main__":
    main()
