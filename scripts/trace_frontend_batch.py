#!/usr/bin/env python
"""Device trace of the BATCHED (x-nseq vmapped) frontend step.

VERDICT r4 weak #2: batching 8 sequences onto one chip gained only ~2%
aggregate fps at 0.9% MFU, contradicting a naive "the chip is idle" read.
This traces the vmapped step so the per-op times can be compared with the
single-sequence trace (scripts/trace_frontend.py): if every op's duration
scales ~nseq-fold, the step is WORK-proportional at the op level — the
per-op costs are serialized grid/lane work (Pallas grids execute blocks
sequentially on the single TensorCore; small VPU ops are bandwidth- or
op-count-bound, not occupancy-bound) — and batch-DP cannot fill anything
because nothing is idle *within* an op's execution.

Usage: python scripts/trace_frontend_batch.py [nseq] [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_traced(out_dir, nseq):
    import bench as benchmod
    from dynosam_tpu.frontend.frontend import FrontendState, frontend_step
    from dynosam_tpu.utils.config import FrontendConfig, TrackerConfig

    sc, frames = benchmod.rendered_frames()
    cam = sc.cam
    cfg = FrontendConfig(tracker=TrackerConfig(max_features_per_frame=1000))

    st0 = FrontendState.create(2048, 4096, 16)
    st0, *_ = frontend_step(
        st0, frames[0], frames[0], cam, cfg, jax.random.PRNGKey(0),
        use_klt=True, first_frame=True,
    )
    states0 = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (nseq, *a.shape)), st0
    )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    stackedN = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (nseq, *a.shape)), stacked
    )
    n_steps = len(frames) - 1
    keys = jax.random.split(jax.random.PRNGKey(7), nseq * n_steps).reshape(
        nseq, n_steps, -1
    )

    @jax.jit
    def run(states, stackedN, keys):
        prev = jax.tree.map(lambda a: a[:, :-1], stackedN)
        cur = jax.tree.map(lambda a: a[:, 1:], stackedN)

        def step(st, inp):
            pf, cf, key = inp
            st, pkt, _, _ = frontend_step(
                st, pf, cf, cam, cfg, key, use_klt=True, first_frame=False,
            )
            chk = sum(
                jnp.sum(x.astype(jnp.float32))
                for x in jax.tree.leaves(pkt)
            )
            return st, chk

        def seq_scan(st, prev_s, cur_s, keys_s):
            return jax.lax.scan(step, st, (prev_s, cur_s, keys_s))

        states, ts = jax.vmap(seq_scan)(states, prev, cur, keys)
        return states, ts

    states, ts = run(states0, stackedN, keys)   # compile
    float(np.asarray(ts[0, -1]))
    jax.profiler.start_trace(out_dir)
    states, ts = run(states, stackedN, keys)
    float(np.asarray(ts[0, -1]))                # fetch barrier inside trace
    jax.profiler.stop_trace()
    return n_steps


def main():
    nseq = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/trace_fe_batch"
    n = run_traced(out_dir, nseq)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from trace_frontend import parse

    parse(out_dir, n, top_individual=30)


if __name__ == "__main__":
    main()
