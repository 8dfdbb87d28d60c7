#!/usr/bin/env python
"""Device-trace profile of the scanned frontend step (TPU xplane).

Chained-reps microbenches are floor-dominated under the axon tunnel (a
single dispatch costs ~28 ms regardless of body — CLAUDE.md); the xplane
device trace is the only honest per-stage breakdown.  This runs N scanned
steps under `jax.profiler`, then aggregates device-plane op durations by
(fusion) name prefix and prints the top bins.

Usage: python scripts/trace_frontend.py [n_scan_steps] [out_dir]
"""

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_traced(out_dir, n_steps):
    import bench as benchmod
    from dynosam_tpu.frontend.frontend import FrontendState, frontend_step
    from dynosam_tpu.utils.config import FrontendConfig, TrackerConfig

    sc, frames = benchmod.rendered_frames()
    cam = sc.cam
    det = os.environ.get("DYNO_TRACE_DETECTOR", "shi_tomasi")
    cfg = FrontendConfig(tracker=TrackerConfig(
        max_features_per_frame=1000, feature_detector_type=det))

    state0 = FrontendState.create(2048, 4096, 16)
    state0, _, _, _ = frontend_step(
        state0, frames[0], frames[0], cam, cfg, jax.random.PRNGKey(0),
        use_klt=True, first_frame=True,
    )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    keys = jax.random.split(jax.random.PRNGKey(7), len(frames) - 1)

    @jax.jit
    def run(state, stacked, keys):
        prev = jax.tree.map(lambda a: a[:-1], stacked)
        cur = jax.tree.map(lambda a: a[1:], stacked)

        def step(st, inp):
            pf, cf, key = inp
            st, pkt, _, _ = frontend_step(
                st, pf, cf, cam, cfg, key, use_klt=True, first_frame=False,
            )
            chk = sum(
                jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pkt)
            )
            return st, chk

        return jax.lax.scan(step, state, (prev, cur, keys))

    state, ts = run(state0, stacked, keys)   # compile
    float(np.asarray(ts[-1]))
    jax.profiler.start_trace(out_dir)
    for _ in range(max(1, n_steps // (len(frames) - 1))):
        state, ts = run(state, stacked, keys)
    float(np.asarray(ts[-1]))                # fetch barrier INSIDE the trace
    jax.profiler.stop_trace()
    return len(frames) - 1


def parse(out_dir, n_frames_per_rep, top_individual=0):
    try:
        from xprof.protobuf import xplane_pb2
    except ImportError:
        try:
            from tensorboard_plugin_profile.protobuf import xplane_pb2
        except ImportError:
            from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = sorted(glob.glob(
        os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True
    ), key=os.path.getmtime)
    if not pbs:
        print("no xplane.pb found under", out_dir)
        return
    space = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        md = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        agg = collections.Counter()
        per_op = collections.Counter()
        per_op_n = collections.Counter()
        total = 0
        for line in plane.lines:
            # XLA Ops / XLA Modules lines both exist; use the op line
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                name = md.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                total += dur
                # bin by fusion-name prefix up to the first digit run
                base = name.split(".")[0]
                agg[base] += dur
                if top_individual:
                    key = name.split(" = ")[0]
                    per_op[key] += dur
                    per_op_n[key] += 1
        if not agg:
            continue
        print(f"\n== plane: {plane.name}  (XLA op time {total:.1f} ms, "
              f"{total / max(n_frames_per_rep, 1):.2f} ms/frame-ish)")
        for name, ms in agg.most_common(40):
            print(f"  {ms:9.2f} ms  {100*ms/total:5.1f}%  {name}")
        if top_individual:
            print(f"\n-- top {top_individual} individual ops "
                  f"(full metadata for the biggest)")
            for key, ms in per_op.most_common(top_individual):
                print(f"  {ms:9.2f} ms  x{per_op_n[key]:<5d} {key}")
            # dump the full text of the 12 biggest (includes shapes)
            full = {}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = md.get(ev.metadata_id, "?")
                    key = name.split(" = ")[0]
                    if len(name) > len(full.get(key, "")):
                        full[key] = name
            for key, ms in per_op.most_common(12):
                if key in full and "=" in full[key]:
                    print(f"  [{ms:8.2f} ms] {full[key][:400]}")


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dyno_trace"
    n = run_traced(out_dir, n_steps)
    parse(out_dir, n, top_individual=30)


if __name__ == "__main__":
    main()
