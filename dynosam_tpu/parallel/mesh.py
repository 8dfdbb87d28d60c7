"""Device mesh construction and sharding specs for distributed BA.

The trajectory (frame) axis is the natural data-parallel axis of dynamic
SLAM (SURVEY §5.7): keyframe blocks shard over ``frames``; the dynamic
track axis shards over ``tracks`` (the model-parallel analog — per-object
track blocks, SURVEY §2.31).  Static landmarks are replicated (they couple
every frame, like weights).  XLA/GSPMD then inserts the Schur-reduction
collectives (psum over ICI) automatically from these annotations — that is
the TPU-native replacement for the reference's shared-memory queues.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backend.map import MeasurementMap
from ..core.lie import SE3

FRAME_AXIS = "frames"
TRACK_AXIS = "tracks"


def make_mesh(
    n_devices: int | None = None, tracks: int | None = None
) -> Mesh:
    """2D (frames x tracks) mesh.

    `tracks` fixes the tracks-axis size explicitly (must divide the device
    count); by default it gets a factor of 2 when the device count allows —
    frames is the longer axis because the window/trajectory length is the
    dimension that grows with problem size, while the track pools are
    capacity-bounded.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if tracks is not None:
        if n % tracks != 0:
            raise ValueError(f"tracks axis {tracks} must divide {n} devices")
        shape = (n // tracks, tracks)
    elif n % 2 == 0 and n >= 4:
        shape = (n // 2, 2)
    else:
        shape = (n, 1)
    mesh_devs = mesh_utils.create_device_mesh(shape, devices=devs[:n])
    return Mesh(mesh_devs, (FRAME_AXIS, TRACK_AXIS))


def map_shardings(mesh: Mesh) -> "MeasurementMap":
    """A MeasurementMap-shaped pytree of NamedShardings.

    Frame-indexed arrays shard over `frames`; the dynamic-track axis over
    `tracks`; static landmark slots replicated (coupled to all frames).
    """
    f = lambda *spec: NamedSharding(mesh, P(*spec))
    FA, TA = FRAME_AXIS, TRACK_AXIS
    return MeasurementMap(
        static_xyz=f(FA, None, None),
        static_uv=f(FA, None, None),
        static_valid=f(FA, None),
        dyn_xyz=f(FA, TA, None),
        dyn_uv=f(FA, TA, None),
        dyn_obj=f(FA, TA),
        dyn_valid=f(FA, TA),
        X_init=SE3(f(FA, None, None), f(FA, None)),
        timestamps=f(FA),
        frame_ids=f(FA),
        frame_valid=f(FA),
        motion_init=SE3(f(FA, None, None, None), f(FA, None, None)),
        motion_valid=f(FA, None),
        obj_pose_init=SE3(f(FA, None, None, None), f(FA, None, None)),
        obj_label=f(FA, None),
    )


def map_compute_shardings(mesh: Mesh) -> "MeasurementMap":
    """The layout `_optimize_schur_explicit` consumes (its shard_map
    in_specs): static grids track-sharded and frame-REPLICATED (the static
    family couples every frame to the same landmark), dynamic grids
    (frames x tracks), pose-family and per-frame scalar arrays replicated.

    Placing the map arrays here BEFORE `distributed_schur_optimize` lets
    every input arrive in its consumed sharding; with the frame-fed layout
    (`map_shardings`) GSPMD logged "Involuntary full rematerialization"
    and replicated the static grids per dispatch (MULTICHIP r4)."""
    f = lambda *spec: NamedSharding(mesh, P(*spec))
    FA, TA = FRAME_AXIS, TRACK_AXIS
    return MeasurementMap(
        static_xyz=f(None, TA, None),
        static_uv=f(None, TA, None),
        static_valid=f(None, TA),
        dyn_xyz=f(FA, TA, None),
        dyn_uv=f(FA, TA, None),
        dyn_obj=f(FA, TA),
        dyn_valid=f(FA, TA),
        X_init=SE3(f(), f()),
        timestamps=f(),
        frame_ids=f(),
        frame_valid=f(),
        motion_init=SE3(f(), f()),
        motion_valid=f(),
        obj_pose_init=SE3(f(), f()),
        obj_label=f(),
    )


def values_shardings(mesh: Mesh, formulation: int = 0) -> dict:
    """Shardings for the optimization values pytree (WorldMotion layout)."""
    f = lambda *spec: NamedSharding(mesh, P(*spec))
    FA, TA = FRAME_AXIS, TRACK_AXIS
    pose_key = "H" if formulation == 0 else "L"
    return {
        "X": SE3(f(FA, None, None), f(FA, None)),
        pose_key: SE3(f(FA, None, None, None), f(FA, None, None)),
        "sp": f(None, None),               # replicated: couples all frames
        "dp": f(FA, TA, None),
    }


def shard_map_data(
    m: MeasurementMap, mesh: Mesh, layout: str = "feed"
) -> MeasurementMap:
    """Place a measurement map onto the mesh with the canonical shardings.

    `layout="feed"` uses the frame-major feeding layout (`map_shardings`);
    `layout="compute"` uses the explicit Schur path's consumed layout
    (`map_compute_shardings`).  Arrays that are already multi-process
    global (fed per-host via `multihost.feed_measurement_map`) pass
    through untouched — device_put cannot re-place a non-addressable
    array (GSPMD inserts the one necessary resharding for those).
    """
    sh = map_shardings(mesh) if layout == "feed" else map_compute_shardings(mesh)

    def put(x, s):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x
        return jax.device_put(x, s)

    return jax.tree.map(
        put, m, sh,
        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
    )


def host_local_to_global(local_arrays, mesh: Mesh, axis: str = FRAME_AXIS):
    """Assemble per-process local shards into a global array (multi-host
    data feeding, `jax.make_array_from_process_local_data` — SURVEY §5.8).

    On a single-process mesh this is just a device_put with the sharding;
    on a multi-host pod each process passes its local frame block.
    """
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, local_arrays)
