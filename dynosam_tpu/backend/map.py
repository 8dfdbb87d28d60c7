"""Device-resident measurement map.

Replaces the reference's pointer-graph `Map<MEASUREMENT>` of
FrameNode/ObjectNode/LandmarkNode (`common/Map.hpp:68-447`,
`common/MapNodes.hpp`) with fixed-capacity struct-of-arrays indexed by
``(frame, slot)``:

  * static observations:   (F, NS)  — NS = static tracklet pool size
  * dynamic observations:  (F, ND)  — ND = dynamic tracklet pool size
  * per-object estimates:  (F, O)

Because the frontend allocates tracklet/object slots densely (see
`core/types.py`), every query the reference answers by graph traversal
(seen-frames of a landmark, landmarks-of-object-at-frame, ...) is a masked
reduction here — one fused XLA op instead of pointer chasing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.lie import SE3, se3_identity
from ..core.types import INVALID_ID, FrontendOutput


class MeasurementMap(NamedTuple):
    """All measurements observed so far, device-resident, static shapes."""

    # --- static observations (F, NS) ---
    static_xyz: jax.Array      # (F, NS, 3) camera-frame point measurement
    static_uv: jax.Array       # (F, NS, 2)
    static_valid: jax.Array    # (F, NS) bool

    # --- dynamic observations (F, ND) ---
    dyn_xyz: jax.Array         # (F, ND, 3)
    dyn_uv: jax.Array          # (F, ND, 2)
    dyn_obj: jax.Array         # (F, ND) int32 object slot, -1 if none
    dyn_valid: jax.Array       # (F, ND) bool

    # --- per-frame frontend initial values ---
    X_init: SE3                # (F,) frontend camera pose ^w X_k
    timestamps: jax.Array      # (F,)
    frame_ids: jax.Array       # (F,) int32 dataset frame id
    frame_valid: jax.Array     # (F,) bool

    # --- per-object frontend initial values (F, O) ---
    motion_init: SE3           # (F, O) frontend ^w H_k
    motion_valid: jax.Array    # (F, O) bool
    obj_pose_init: SE3         # (F, O) propagated ^w L_k
    obj_label: jax.Array       # (F, O) int32 global instance label

    @property
    def capacity(self):
        f, ns = self.static_valid.shape
        nd = self.dyn_valid.shape[1]
        no = self.motion_valid.shape[1]
        return f, ns, nd, no

    @staticmethod
    def create(max_frames: int, ns: int, nd: int, no: int, dtype=jnp.float32):
        f = max_frames
        return MeasurementMap(
            static_xyz=jnp.zeros((f, ns, 3), dtype),
            static_uv=jnp.zeros((f, ns, 2), dtype),
            static_valid=jnp.zeros((f, ns), bool),
            dyn_xyz=jnp.zeros((f, nd, 3), dtype),
            dyn_uv=jnp.zeros((f, nd, 2), dtype),
            dyn_obj=jnp.full((f, nd), INVALID_ID, jnp.int32),
            dyn_valid=jnp.zeros((f, nd), bool),
            X_init=se3_identity((f,), dtype),
            timestamps=jnp.zeros((f,), dtype),
            frame_ids=jnp.full((f,), INVALID_ID, jnp.int32),
            frame_valid=jnp.zeros((f,), bool),
            motion_init=se3_identity((f, no), dtype),
            motion_valid=jnp.zeros((f, no), bool),
            obj_pose_init=se3_identity((f, no), dtype),
            obj_label=jnp.full((f, no), INVALID_ID, jnp.int32),
        )


def update_map(m: MeasurementMap, out: FrontendOutput, k) -> MeasurementMap:
    """Insert one frontend packet at frame index ``k`` (traced or static).

    The analog of `Map::updateObservations` + the initial-value caches
    (`common/Map.hpp:111-144`); a pure functional scatter.
    """
    set_row = lambda arr, row: arr.at[k].set(row)
    return MeasurementMap(
        static_xyz=set_row(m.static_xyz, out.static_obs.xyz),
        static_uv=set_row(m.static_uv, out.static_obs.uv),
        static_valid=set_row(m.static_valid, out.static_obs.valid),
        dyn_xyz=set_row(m.dyn_xyz, out.dynamic_obs.xyz),
        dyn_uv=set_row(m.dyn_uv, out.dynamic_obs.uv),
        dyn_obj=set_row(m.dyn_obj, out.dynamic_obs.obj),
        dyn_valid=set_row(m.dyn_valid, out.dynamic_obs.valid),
        X_init=SE3(
            set_row(m.X_init.R, out.X_world.R), set_row(m.X_init.t, out.X_world.t)
        ),
        timestamps=set_row(m.timestamps, out.timestamp),
        frame_ids=set_row(m.frame_ids, out.frame_id),
        frame_valid=m.frame_valid.at[k].set(True),
        motion_init=SE3(
            set_row(m.motion_init.R, out.objects.motion.R),
            set_row(m.motion_init.t, out.objects.motion.t),
        ),
        motion_valid=set_row(m.motion_valid, out.objects.motion_valid),
        obj_pose_init=SE3(
            set_row(m.obj_pose_init.R, out.objects.pose.R),
            set_row(m.obj_pose_init.t, out.objects.pose.t),
        ),
        obj_label=set_row(m.obj_label, out.objects.label),
    )


class WindowData(NamedTuple):
    """A contiguous frame window gathered from the map (static shapes)."""

    static_xyz: jax.Array    # (W, NS, 3)
    static_valid: jax.Array  # (W, NS)
    dyn_xyz: jax.Array       # (W, ND, 3)
    dyn_obj: jax.Array       # (W, ND)
    dyn_valid: jax.Array     # (W, ND)
    X_init: SE3              # (W,)
    motion_init: SE3         # (W, O)
    motion_valid: jax.Array  # (W, O)
    obj_pose_init: SE3       # (W, O)
    frame_valid: jax.Array   # (W,)
    start: jax.Array         # () int32 — first frame index in the map


def compact_window(w: WindowData, ns_win: int, nd_win: int, no_win: int):
    """Gather the window's most-observed track/object slots into a smaller
    fixed-capacity WindowData, so the solve cost depends on the window's
    content, not the global pool capacities.

    Reference analog: `constructGraph(from, to)` rebuilds each window graph
    from only the map nodes observed in range
    (`src/backend/RGBDBackendModule.cc:280-341`) — a window never sees the
    whole landmark store.  Selection is top-k by in-window observation
    count (ties resolve to the lower slot, so selection is deterministic);
    dropped tracks keep their estimates untouched on write-back.

    Returns ``(w_c, sp_idx, dp_idx, obj_idx)`` — the compacted window plus
    the selected slot indices for scattering results back to pool coords.
    """
    W, NS = w.static_valid.shape
    ND = w.dyn_valid.shape[1]
    O = w.motion_valid.shape[1]

    s_score = jnp.sum(w.static_valid, axis=0).astype(jnp.float32)
    _, sp_idx = jax.lax.top_k(s_score, ns_win)
    d_score = jnp.sum(w.dyn_valid, axis=0).astype(jnp.float32)
    _, dp_idx = jax.lax.top_k(d_score, nd_win)
    # object score: dynamic observations per object slot + frontend motion
    # validity (keeps objects the frontend solved even if thinly observed)
    oh_all = jax.nn.one_hot(w.dyn_obj, O, dtype=jnp.float32)  # -1 -> zeros
    o_score = jnp.einsum("wn,wno->o", w.dyn_valid.astype(jnp.float32), oh_all)
    o_score = o_score + jnp.sum(w.motion_valid, axis=0).astype(jnp.float32)
    _, obj_idx = jax.lax.top_k(o_score, no_win)

    take1 = lambda a, idx: jnp.take(a, idx, axis=1)
    take1_se3 = lambda p, idx: SE3(take1(p.R, idx), take1(p.t, idx))

    # remap dyn_obj to compacted object slots with a one-hot matvec (a
    # small-table gather would serialize per element on TPU); objects that
    # fell outside the top-k become INVALID_ID, which disables their
    # factors in build_masks exactly like an unlabeled observation
    inv = jnp.zeros((O,), jnp.float32).at[obj_idx].set(
        jnp.arange(no_win, dtype=jnp.float32)
    )
    sel = jnp.zeros((O,), jnp.float32).at[obj_idx].set(1.0)
    dyn_obj_c = take1(w.dyn_obj, dp_idx)
    oh_c = jax.nn.one_hot(dyn_obj_c, O, dtype=jnp.float32)
    new_obj = jnp.einsum("wno,o->wn", oh_c, inv)
    kept = jnp.einsum("wno,o->wn", oh_c, sel) > 0.5
    dyn_obj_new = jnp.where(
        (dyn_obj_c >= 0) & kept, new_obj.astype(jnp.int32), INVALID_ID
    )

    w_c = WindowData(
        static_xyz=take1(w.static_xyz, sp_idx),
        static_valid=take1(w.static_valid, sp_idx),
        dyn_xyz=take1(w.dyn_xyz, dp_idx),
        dyn_obj=dyn_obj_new,
        dyn_valid=take1(w.dyn_valid, dp_idx),
        X_init=w.X_init,
        motion_init=take1_se3(w.motion_init, obj_idx),
        motion_valid=take1(w.motion_valid, obj_idx),
        obj_pose_init=take1_se3(w.obj_pose_init, obj_idx),
        frame_valid=w.frame_valid,
        start=w.start,
    )
    return w_c, sp_idx, dp_idx, obj_idx


def slice_window(m: MeasurementMap, start, window: int) -> WindowData:
    """Gather frames [start, start+window) with dynamic_slice (start traced)."""
    ds = lambda a: jax.lax.dynamic_slice_in_dim(a, start, window, axis=0)
    ds_se3 = lambda p: SE3(ds(p.R), ds(p.t))
    return WindowData(
        static_xyz=ds(m.static_xyz),
        static_valid=ds(m.static_valid),
        dyn_xyz=ds(m.dyn_xyz),
        dyn_obj=ds(m.dyn_obj),
        dyn_valid=ds(m.dyn_valid),
        X_init=ds_se3(m.X_init),
        motion_init=ds_se3(m.motion_init),
        motion_valid=ds(m.motion_valid),
        obj_pose_init=ds_se3(m.obj_pose_init),
        frame_valid=ds(m.frame_valid),
        start=jnp.asarray(start, jnp.int32),
    )
