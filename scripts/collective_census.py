#!/usr/bin/env python
"""Count collectives in the compiled distributed Schur LM program.

VERDICT round-3 weak #5: the LM while-body executed O(100) GSPMD-inserted
collectives per iteration, which makes multi-host scaling latency-bound
regardless of byte volume.  This script compiles the 8-virtual-device
frame x track mesh solve on CPU, then reports collective ops (all-gather /
all-reduce / collective-permute / reduce-scatter / all-to-all) split into
"inside the LM while body" (cost is per iteration) and "outside" (one-off).

Usage: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
           XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/collective_census.py [--window 16]
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLLECTIVES = (
    "all-gather", "all-reduce", "collective-permute", "reduce-scatter",
    "all-to-all",
)

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8}


_SHAPE_RE = re.compile(r"=\s*(?:\(([^)]*)\)|([\w]+\[[\d,]*\]))")
_ELEM_RE = re.compile(r"(\w+?)\[([\d,]*)\]")


def _line_collective(line: str):
    """(op, result_bytes, shape_str) if the HLO line is a collective,
    else None."""
    s = line.strip()
    for op in COLLECTIVES:
        if f" {op}(" in s or f"{op}-start" in s or f" {op}." in s:
            m = _SHAPE_RE.search(s)
            if not m:
                return None
            shapes = m.group(1) if m.group(1) else m.group(2)
            total = 0
            for em in _ELEM_RE.finditer(shapes):
                dt, dims = em.group(1), em.group(2)
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                total += n * _DTYPE_BYTES.get(dt, 4)
            return (op, total, shapes[:120])
    return None


def collective_shapes(txt: str):
    """(op, result_bytes, shape_str) for every collective instruction —
    the guard against GSPMD quietly all-gathering a pool-sized (ND/NS)
    grid (a frame-axis shifted-add on a sharded tensor does exactly that;
    see CLAUDE.md d_mm note)."""
    out = []
    for line in txt.splitlines():
        c = _line_collective(line)
        if c is not None:
            out.append(c)
    return out


def census(txt: str):
    """Split the HLO module text into computations and count collective
    instruction OCCURRENCES per computation; attribute each computation to
    the while body (transitively) or not via the called-computation graph.

    HLO-text computations start at a column-0 (or ENTRY) header line ending
    in `{` and end at a column-0 `}`.  Headers contain nested parens (tuple
    param types), so the name is just the first token."""
    comps = {}
    name = None
    for line in txt.splitlines():
        if name is None:
            m = re.match(r"^(?:ENTRY\s+)?%?([\w\.\-]+)\s+\(", line)
            if m and line.rstrip().endswith("{"):
                name = m.group(1)
                comps[name] = []
        else:
            if line.startswith("}"):
                name = None
            else:
                comps[name].append(line)

    call_re = re.compile(
        r"(?:to_apply|body|condition|calls|true_computation|"
        r"false_computation)=%?([\w\.\-]+)"
        r"|branch_computations=\{([^}]*)\}"
    )
    calls = {}
    for c, lines in comps.items():
        refs = set()
        for m in call_re.finditer("\n".join(lines)):
            if m.group(1):
                refs.add(m.group(1))
            elif m.group(2):
                refs.update(
                    x.strip().lstrip("%") for x in m.group(2).split(",")
                )
        calls[c] = refs
    counts = {}
    comp_bytes = {}
    for c, lines in comps.items():
        ctr = collections.Counter()
        nb = 0
        for line in lines:
            for op in COLLECTIVES:
                if re.search(rf"=\s*[\w\.\[\]{{}},:\s/]*{op}", line) and (
                    f" {op}(" in line or f"{op}-start" in line or
                    f" {op}." in line
                ):
                    ctr[op] += 1
                    got = _line_collective(line)
                    if got is not None:
                        nb += got[1]
        counts[c] = ctr
        comp_bytes[c] = nb

    # find while bodies: computations referenced via body=
    body_roots = set()
    for c, lines in comps.items():
        for line in lines:
            m = re.search(r"body=%?([\w\.\-]+)", line)
            if m:
                body_roots.add(m.group(1))

    def closure(roots):
        seen = set(roots)
        stack = list(roots)
        while stack:
            c = stack.pop()
            for callee in calls.get(c, ()):
                if callee not in seen:
                    seen.add(callee)
                    stack.append(callee)
        return seen

    in_body = closure(body_roots)
    inside = collections.Counter()
    outside = collections.Counter()
    inside_bytes = 0
    for c, ctr in counts.items():
        (inside if c in in_body else outside).update(ctr)
        if c in in_body:
            inside_bytes += comp_bytes[c]
    return inside, outside, inside_bytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--assert-max", type=int, default=0,
                    help="exit 1 if in-body collectives exceed this")
    # the one legitimately-large collective is the packed SPIKE interface
    # all_gather (boundary spike rows x all RHS columns, ~2.4 MiB at the
    # census scale); the guard catches the ~10 MiB pool-grid class (e.g.
    # a frame-shifted add on a sharded (W, ND, ...) tensor making GSPMD
    # all-gather the whole grid — the round-3 d_mm bug)
    ap.add_argument("--assert-max-kib", type=int, default=4096,
                    help="exit 1 if any single collective result exceeds "
                         "this many KiB (0 disables)")
    a = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    import jax.numpy as jnp

    from dynosam_tpu.backend.map import MeasurementMap, update_map
    from dynosam_tpu.backend.solver import LMConfig
    from dynosam_tpu.parallel import schur_dist
    from dynosam_tpu.parallel.mesh import make_mesh, shard_map_data
    from dynosam_tpu.testing.simulator import Scenario, ScenarioConfig
    from dynosam_tpu.utils.config import BackendConfig

    window = a.window
    scfg = ScenarioConfig(
        n_frames=window, n_static=200, n_objects=2, pts_per_object=50,
        ns=256, nd=256, no=4,
    )
    sc = Scenario(scfg)
    m = MeasurementMap.create(window, 256, 256, 4)
    for k, pkt in enumerate(sc.frontend_outputs()):
        m = update_map(m, pkt, k)
    mesh = make_mesh()
    print(f"mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}",
          file=sys.stderr)
    m_sharded = shard_map_data(m, mesh, layout="compute")
    cfg = BackendConfig()
    lm_cfg = LMConfig(max_iterations=6)

    fn = jax.jit(
        lambda mm: schur_dist._optimize_schur_sharded(
            mm, window, cfg, lm_cfg, 0, mesh
        ).error
    )
    txt = fn.lower(m_sharded).compile().as_text()
    inside, outside, inside_bytes = census(txt)
    print("collectives INSIDE the LM while body (per-iteration cost):")
    for op, n in sorted(inside.items()):
        print(f"  {op:20s} {n}")
    print(f"  TOTAL {sum(inside.values())}")
    print("collectives outside (one-off):")
    for op, n in sorted(outside.items()):
        print(f"  {op:20s} {n}")
    print(f"  TOTAL {sum(outside.values())}")
    shapes = collective_shapes(txt)
    shapes.sort(key=lambda t: -t[1])
    print(f"in-body collective result bytes: {inside_bytes/1e6:.2f} MB/iter")
    print("largest collectives by result bytes:")
    for op, nb, sh in shapes[:6]:
        print(f"  {nb/1024:9.1f} KiB  {op:20s} {sh}")
    if a.assert_max_kib:
        big = [t for t in shapes if t[1] > a.assert_max_kib * 1024]
        if big:
            print(f"FAIL: {len(big)} collectives exceed "
                  f"{a.assert_max_kib} KiB (pool-sized grid leaked into "
                  f"a collective)")
            raise SystemExit(1)
    if a.assert_max and sum(inside.values()) > a.assert_max:
        print(f"FAIL: {sum(inside.values())} > {a.assert_max}")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
