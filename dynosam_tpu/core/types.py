"""Struct-of-array measurement & packet types.

TPU-native replacement for the reference's status-wrapped measurement
containers (`common/Types.hpp:173,354` — `TrackedValueStatus`,
`GenericTrackedStatusVector`) and the frontend output packet
(`frontend/RGBDInstance-Definitions.hpp:49-105`).

Design: every per-feature quantity lives in a fixed-capacity slot array with
a validity mask.  **Tracklet ids are dense pool-slot indices** allocated by
the frontend (recycled like the reference's tracklet recycling,
`FeatureTracker.cc:227-231`), so the backend indexes landmarks directly by
(frame, slot) — this replaces the reference's Cantor-paired
`DynamicPointSymbol` (`backend/DynamicPointSymbol.hpp:39-110`) with plain 2D
array indexing.  Object ids are likewise dense slots in [0, O); the global
(dataset) instance label is carried alongside for logging.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .lie import SE3, se3_identity

# Background / invalid labels (reference: background label == 0).
BACKGROUND = 0
INVALID_ID = -1


class StaticObs(NamedTuple):
    """Static-feature observations for one frame (or a stacked (F, ...) batch).

    Slot-indexed by static tracklet pool id, capacity NS.
    """

    uv: jax.Array        # (NS, 2) pixel keypoint
    xyz: jax.Array       # (NS, 3) camera-frame backprojection
    valid: jax.Array     # (NS,) bool — observation present & depth valid

    @staticmethod
    def empty(ns: int, dtype=jnp.float32) -> "StaticObs":
        return StaticObs(
            uv=jnp.zeros((ns, 2), dtype),
            xyz=jnp.zeros((ns, 3), dtype),
            valid=jnp.zeros((ns,), bool),
        )


class DynamicObs(NamedTuple):
    """Dynamic-feature observations for one frame; slot capacity ND."""

    uv: jax.Array        # (ND, 2)
    xyz: jax.Array       # (ND, 3) camera-frame
    obj: jax.Array       # (ND,) int32 object slot in [0, O), INVALID_ID if none
    valid: jax.Array     # (ND,) bool

    @staticmethod
    def empty(nd: int, dtype=jnp.float32) -> "DynamicObs":
        return DynamicObs(
            uv=jnp.zeros((nd, 2), dtype),
            xyz=jnp.zeros((nd, 3), dtype),
            obj=jnp.full((nd,), INVALID_ID, jnp.int32),
            valid=jnp.zeros((nd,), bool),
        )


class ObjectObs(NamedTuple):
    """Per-object frontend estimates for one frame; slot capacity O."""

    motion: SE3          # (O,) ^w H_k  (world-centric motion k-1 -> k)
    motion_valid: jax.Array  # (O,) bool
    pose: SE3            # (O,) ^w L_k  (propagated object pose)
    pose_valid: jax.Array    # (O,) bool
    label: jax.Array     # (O,) int32 global instance label (for logging)

    @staticmethod
    def empty(no: int, dtype=jnp.float32) -> "ObjectObs":
        return ObjectObs(
            motion=se3_identity((no,), dtype),
            motion_valid=jnp.zeros((no,), bool),
            pose=se3_identity((no,), dtype),
            pose_valid=jnp.zeros((no,), bool),
            label=jnp.full((no,), INVALID_ID, jnp.int32),
        )


class FrontendOutput(NamedTuple):
    """One frame of frontend output — the analog of
    `RGBDInstanceOutputPacket` (`frontend/RGBDInstance-Definitions.hpp:49`).
    """

    frame_id: jax.Array      # () int32
    timestamp: jax.Array     # () float
    X_world: SE3             # () camera pose estimate ^w X_k
    static_obs: StaticObs
    dynamic_obs: DynamicObs
    objects: ObjectObs

    @staticmethod
    def empty(ns: int, nd: int, no: int, dtype=jnp.float32) -> "FrontendOutput":
        return FrontendOutput(
            frame_id=jnp.asarray(INVALID_ID, jnp.int32),
            timestamp=jnp.asarray(0.0, dtype),
            X_world=se3_identity((), dtype),
            static_obs=StaticObs.empty(ns, dtype),
            dynamic_obs=DynamicObs.empty(nd, dtype),
            objects=ObjectObs.empty(no, dtype),
        )


def stack_outputs(outputs: list) -> "FrontendOutput":
    """Stack per-frame FrontendOutputs into (F, ...) arrays."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *outputs)
