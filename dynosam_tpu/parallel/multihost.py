"""Multi-host / multi-process distribution layer.

The reference is strictly single-process — its "communication backend" is a
shared-memory queue (`pipeline/ThreadSafeQueue.hpp:157`, SURVEY §2.31).  The
TPU-native replacement must span hosts (SURVEY §5.8): the `jax.distributed`
runtime, a DCN-aware device mesh (process axis x local-device axis), and
host-local measurement feeding via `jax.make_array_from_process_local_data`
so each host only materializes its own keyframe block.

Mesh layout policy: the FRAME axis is the cross-host (DCN) axis.  Each
process owns a contiguous keyframe block, so the SPIKE chain elimination's
halo exchange (`ppermute` of one 3x3 coupling block per chain,
`schur_dist.py`) crosses DCN exactly once per block boundary per LM
iteration, and the all-gathered per-chain interface system is the only
other DCN-crossing collective.  The TRACKS axis stays inside each host
(ICI), where chains are independent and never communicate at all.

Everything here runs identically in a single process (falls back to the
local `make_mesh` / plain `device_put`), so the same call sites serve the
1-chip, 1-host-N-chip, and N-host topologies.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import FRAME_AXIS, TRACK_AXIS, make_mesh, map_shardings


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the jax.distributed cluster (idempotent).

    Arguments default to the `DYNO_COORDINATOR` / `DYNO_NUM_PROCESSES` /
    `DYNO_PROCESS_ID` environment variables so launchers (mpirun-style
    wrappers, the multi-process tests) can configure workers uniformly.
    On managed TPU pods all three may be None — jax autodetects.
    """
    if jax.process_count() > 1:
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get(
        "DYNO_COORDINATOR"
    )
    if num_processes is None and "DYNO_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["DYNO_NUM_PROCESSES"])
    if process_id is None and "DYNO_PROCESS_ID" in os.environ:
        process_id = int(os.environ["DYNO_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single-process run, nothing to join
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(tracks: int = 1, devices=None) -> Mesh:
    """DCN-aware (frames x tracks) mesh over all processes.

    Single process: delegates to `make_mesh` (pure-ICI mesh).  Multi
    process: `mesh_utils.create_hybrid_device_mesh` with the process (DCN)
    axis stacked onto FRAMES — process p owns the p-th contiguous frame
    block — and `tracks` confined to each host's local (ICI) devices.
    """
    nproc = jax.process_count()
    if nproc == 1:
        return make_mesh(tracks=tracks)
    devs = list(devices or jax.devices())
    n_local = len(devs) // nproc
    if n_local * nproc != len(devs):
        raise ValueError(
            f"{len(devs)} devices do not split over {nproc} processes"
        )
    if tracks < 1 or n_local % tracks != 0:
        raise ValueError(
            f"tracks axis {tracks} must divide the {n_local} local devices"
        )
    ici = (n_local // tracks, tracks)
    dcn = (nproc, 1)
    mesh_devs = mesh_utils.create_hybrid_device_mesh(
        ici, dcn, devices=devs, process_is_granule=True
    )
    return Mesh(mesh_devs, (FRAME_AXIS, TRACK_AXIS))


def local_frame_range(mesh: Mesh, n_frames: int) -> tuple[int, int]:
    """[start, stop) of the frame rows THIS process's devices own under the
    canonical P(frames) sharding — the block a host must load/feed."""
    sh = NamedSharding(mesh, P(FRAME_AXIS))
    idx_map = sh.addressable_devices_indices_map((n_frames,))
    starts, stops = [], []
    for (sl,) in idx_map.values():
        starts.append(0 if sl.start is None else sl.start)
        stops.append(n_frames if sl.stop is None else sl.stop)
    return min(starts), max(stops)


def feed_measurement_map(m_local, mesh: Mesh):
    """Host-local data feeding (SURVEY §5.8): assemble the global
    MeasurementMap from each process's local frame block.

    `m_local` holds ONLY this process's `local_frame_range` rows of every
    (frame-leading) leaf.  Multi-process, each leaf becomes a global array
    via `jax.make_array_from_process_local_data`; single-process it is a
    plain sharded `device_put` (m_local is then the full map).
    """
    sh = map_shardings(mesh)

    def put(x, s):
        if jax.process_count() == 1:
            return jax.device_put(x, s)
        return jax.make_array_from_process_local_data(s, np.asarray(x))

    return jax.tree.map(
        put, m_local, sh,
        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
    )
