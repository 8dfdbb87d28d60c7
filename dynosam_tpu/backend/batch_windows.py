"""Batched sliding-window optimization: all windows of a sequence at once.

The sequential sliding-window mode (reference semantics) solves one
window-10 graph every `size - overlap` frames; at TPU window scale each
solve is op-latency bound (~570 ms regardless of caps, BENCH_NOTES).  For
*offline* processing the windows are independent given their frontend
initializations (the reference likewise reconstructs every window graph
from the map, `RGBDBackendModule::constructGraph`), so we `vmap` the whole
LM solve over the window axis: one XLA program optimizes every window of
the trajectory simultaneously, converting the latency-bound regime into
the compute-bound one (near-linear cost in total work).

Stitching: windows are written back in order; overlap frames take the
*later* window's estimate (it has seen more context), matching the
sequential mode's effective behaviour.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.lie import SE3
from ..utils.config import BackendConfig
from . import formulation as fm
from .map import MeasurementMap, WindowData, slice_window
from .solver import LMConfig, lm_optimize


def window_starts(n_frames: int, size: int, overlap: int):
    """Window start indices covering [0, n_frames) (SlidingWindow logic)."""
    stride = size - overlap
    starts = list(range(0, max(n_frames - size, 0) + 1, stride))
    if not starts:
        starts = [0]
    # ensure the tail is covered
    if starts[-1] + size < n_frames:
        starts.append(max(n_frames - size, 0))
    return starts


@functools.partial(jax.jit, static_argnames=("window", "cfg"))
def _solve_windows(m: MeasurementMap, starts: jax.Array, window: int,
                   cfg: BackendConfig, lm_cfg: LMConfig):
    """vmapped window solves; starts (S,) int32."""

    def solve_one(start):
        w = slice_window(m, start, window)
        masks = fm.build_masks(w, cfg)
        values = fm.init_values(w, masks, cfg)
        if cfg.use_schur and window <= cfg.schur_max_window:
            # direct reduced solver vmaps over windows like everything else:
            # the block-Thomas scans and the dense Cholesky simply gain a
            # leading window axis (see backend/schur.py)
            from .schur import lm_optimize_schur

            res = lm_optimize_schur(
                values, w, masks, cfg, lm_cfg, w.X_init[0]
            )
            return res.values, res.error, res.initial_error, masks
        spec = fm.world_motion_families(cfg)
        resid = lambda v: fm.world_motion_residuals(v, w, masks, cfg)
        gn_diag = lambda v, sw: fm.world_motion_gn_diag(v, sw, w, masks, cfg)
        res = lm_optimize(resid, spec.robust, values, lm_cfg,
                          gn_diag_fn=gn_diag)
        return res.values, res.error, res.initial_error, masks

    return jax.vmap(solve_one)(starts)


def solve_all_windows(
    m: MeasurementMap,
    n_frames: int,
    cfg: BackendConfig,
    lm_cfg: LMConfig | None = None,
):
    """Solve every window of the sequence in one batched program.

    Returns (stitched estimates dict, per-window errors):
      X (F,) SE3 + valid, H (F, O) SE3 + valid, per-window LM errors.
    """
    lm_cfg = lm_cfg or LMConfig(
        max_iterations=cfg.lm_max_iterations,
        cg_max_iterations=cfg.cg_max_iterations,
    )
    size = cfg.opt_window_size
    starts = window_starts(n_frames, size, cfg.opt_window_overlap)
    starts_arr = jnp.asarray(starts, jnp.int32)
    values, errors, init_errors, masks = _solve_windows(
        m, starts_arr, size, cfg, lm_cfg
    )

    # ---- stitch: later windows overwrite overlaps
    F = m.frame_valid.shape[0]
    O = values["H"].R.shape[2]
    X_R = np.tile(np.eye(3, dtype=np.float32), (F, 1, 1))
    X_t = np.zeros((F, 3), np.float32)
    X_valid = np.zeros((F,), bool)
    H_R = np.tile(np.eye(3, dtype=np.float32), (F, O, 1, 1))
    H_t = np.zeros((F, O, 3), np.float32)
    H_valid = np.zeros((F, O), bool)

    vX_R = np.asarray(values["X"].R)
    vX_t = np.asarray(values["X"].t)
    vH_R = np.asarray(values["H"].R)
    vH_t = np.asarray(values["H"].t)
    mfr = np.asarray(masks.frame)
    mact = np.asarray(masks.motion_active)
    for si, s in enumerate(starts):
        e = min(s + size, F)
        n = e - s
        sel = mfr[si, :n]
        X_R[s:e][sel] = vX_R[si, :n][sel]
        X_t[s:e][sel] = vX_t[si, :n][sel]
        X_valid[s:e] |= sel
        actm = mact[si, :n]
        H_R[s:e][actm] = vH_R[si, :n][actm]
        H_t[s:e][actm] = vH_t[si, :n][actm]
        H_valid[s:e] |= actm

    est = {
        "X": SE3(jnp.asarray(X_R), jnp.asarray(X_t)),
        "X_valid": jnp.asarray(X_valid),
        "H": SE3(jnp.asarray(H_R), jnp.asarray(H_t)),
        "H_valid": jnp.asarray(H_valid),
    }
    return est, np.asarray(errors), np.asarray(init_errors), starts
