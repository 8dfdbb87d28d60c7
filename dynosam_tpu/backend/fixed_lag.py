"""Fixed-lag smoothing via boundary marginalization.

The reference links gtsam's `IncrementalFixedLagSmoother`
(`backend/RGBDBackendModule.hpp:45`) as an alternative to its
fresh-rebuild sliding-window LM.  The TPU-native analog implemented here:
when the window slides from [s, s+W) to [s+stride, s+stride+W), the
leaving frames' information is MARGINALIZED onto the boundary camera pose
X_{s+stride} and carried into the next window as a full-covariance prior
that replaces the isotropic gauge anchor
(`schur.lm_optimize_schur(anchor_prior_L=...)`).

Construction per slide:
  1. build the sub-window [s, s+stride+1) normal system at the CURRENT
     estimates, with the boundary frame's own point observations masked
     out (those factors are rebuilt inside the next window — masking
     prevents double counting; the odometry/ternary/smoothing factors
     whose support lies in the leaving frames are exactly the ones that
     will never be rebuilt);
  2. reduce it with the production landmark elimination
     (`schur_step(with_reduced=True)`) to the {X, P} system;
  3. Schur-complement everything except the boundary X block:
         Lam = H_bb - H_bm H_mm^-1 H_mb   (6 x 6)
  4. hand the next window (L = chol(Lam), xbar = X_est[boundary]).

Approximations (standard for marginalization-based fixed-lag smoothers —
the same ones gtsam's fixed-lag marginals make, plus one more):
  * the marginal is formed at the current linearization point and never
    relinearized;
  * landmarks observed by leaving frames are marginalized even when they
    are re-observed later (their later observations enter as fresh
    factors — the VINS/OKVIS treatment);
  * object motions/poses at the boundary are marginalized rather than
    kept in the prior state (camera-only prior), and the sub-window's own
    gauge anchor contributes its (soft) information to the marginal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.lie import SE3
from ..utils.config import BackendConfig
from . import formulation as fm
from .map import MeasurementMap, compact_window, slice_window
from .schur import (build_normal_system, build_normal_system_pose,
                    schur_step)
from .solver import robust_sqrt_weights


def boundary_prior(
    m: MeasurementMap,
    start,
    n_sub: int,
    cfg: BackendConfig,
    est_values: dict,
    updater: int = 0,
    anchor: SE3 | None = None,
    prev_prior_L: jax.Array | None = None,
):
    """(L, xbar): Cholesky factor of the 6x6 boundary marginal information
    and the boundary pose estimate.

    `est_values` holds the CURRENT estimates over the sub-window frames
    [start, start+n_sub): {"X": SE3 (n_sub,), "H"|"L": SE3 (n_sub, O),
    "sp": (NS, 3), "dp": (n_sub, ND, 3)} — from the backend's estimate
    store (falling back to frontend initials where never optimized).
    `prev_prior_L` chains the previous slide's marginal through the
    sub-window's own anchor so absolute (gauge) information propagates.
    """
    w = slice_window(m, start, n_sub)
    NS = w.static_xyz.shape[1]
    ND = w.dyn_xyz.shape[1]
    O = w.motion_init.batch_shape[1]
    ns_win = min(NS, cfg.window_max_static or NS)
    nd_win = min(ND, cfg.window_max_dynamic or ND)
    no_win = min(O, cfg.window_max_objects or O)
    vals = dict(est_values)
    pose_key = "H" if updater == 0 else "L"
    if ns_win < NS or nd_win < ND or no_win < O:
        w, sp_idx, dp_idx, obj_idx = compact_window(
            w, ns_win, nd_win, no_win
        )
        take1 = lambda a, idx: jnp.take(a, idx, axis=1)
        vals = {
            "X": vals["X"],
            pose_key: SE3(take1(vals[pose_key].R, obj_idx),
                          take1(vals[pose_key].t, obj_idx)),
            "sp": jnp.take(vals["sp"], sp_idx, axis=0),
            "dp": take1(vals["dp"], dp_idx),
        }
    masks = fm.build_masks(w, cfg)
    # boundary frame keeps only its COUPLING factors (odometry/ternary/
    # smoothing into the leaving frames); its unary point observations are
    # rebuilt by the next window
    masks = masks._replace(
        static_obs=masks.static_obs.at[-1].set(False),
        dyn_obs=masks.dyn_obs.at[-1].set(False),
    )
    anchor_pose = anchor if anchor is not None else w.X_init[0]

    if updater == 0:
        spec = fm.world_motion_families(cfg)
        res = fm.world_motion_residuals(
            vals, w, masks, cfg, anchor_pose, anchor_prior_L=prev_prior_L
        )
        build_fn = build_normal_system
    else:
        spec = fm.world_pose_families(cfg)
        res = fm.world_pose_residuals(
            vals, w, masks, cfg, anchor_pose, anchor_prior_L=prev_prior_L
        )
        build_fn = build_normal_system_pose
    sqrt_w = [
        robust_sqrt_weights(r, s.k, s.kind) if s.kind != "none"
        else jnp.ones(r.shape[:-1], r.dtype)
        for r, s in zip(res, spec.robust)
    ]
    sys = build_fn(vals, sqrt_w, w, masks, cfg, anchor_pose, res,
                   anchor_prior_L=prev_prior_L)
    lam = jnp.asarray(1e-8, w.static_xyz.dtype)
    _, (Hred, _) = schur_step(
        sys, lam, 1e-8, formulation=updater, with_reduced=True
    )
    nc = 6 * n_sub
    b0 = 6 * (n_sub - 1)
    keep = jnp.arange(b0, nc)
    drop = jnp.concatenate(
        [jnp.arange(b0), jnp.arange(nc, Hred.shape[0])]
    )
    Hbb = Hred[jnp.ix_(keep, keep)]
    Hbm = Hred[jnp.ix_(keep, drop)]
    Hmm = Hred[jnp.ix_(drop, drop)]
    sol = jnp.linalg.solve(Hmm, Hbm.T)                     # (m, 6)
    Lam = Hbb - Hbm @ sol
    Lam = 0.5 * (Lam + Lam.T)
    # PSD floor: relative + tiny absolute so structurally-weak directions
    # keep the Cholesky finite without drowning the marginal (an absolute
    # 1/sigma^2-scale floor would just re-create the hard anchor)
    dmax = jnp.max(jnp.abs(jnp.diagonal(Lam)))
    Lam = Lam + (1e-6 * dmax + 1e-4) * jnp.eye(6, dtype=Lam.dtype)
    L = jnp.linalg.cholesky(Lam)
    xbar = vals["X"][n_sub - 1]
    return L, xbar
