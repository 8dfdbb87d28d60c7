"""Fixed-lag smoothing (boundary marginalization) tests.

The analog of the reference's `IncrementalFixedLagSmoother` option
(`backend/RGBDBackendModule.hpp:45`) — `backend/fixed_lag.py` +
`schur.lm_optimize_schur(anchor_prior_L=...)`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.backend.backend import RGBDBackend
from dynosam_tpu.testing.simulator import Scenario, ScenarioConfig
from dynosam_tpu.utils.config import BackendConfig, CapacityConfig


def _run(cfg_kwargs, scfg):
    sc = Scenario(scfg)
    be = RGBDBackend(
        BackendConfig(**cfg_kwargs),
        CapacityConfig(
            max_static_tracks=scfg.ns, max_dynamic_tracks=scfg.nd,
            max_objects=scfg.no, max_frames=scfg.n_frames,
        ),
    )
    for p in sc.frontend_outputs():
        be.spin(p)
    be.finish()
    X, xv = be.camera_poses()
    return sc, be, X, np.asarray(xv)


def test_anchor_prior_L_isotropic_equivalence():
    """With L = I/sigma the full-covariance anchor whitening reproduces the
    isotropic anchor bit-for-bit (same residual, same build), so the
    fixed-lag machinery degrades exactly to the default on the first
    window."""
    from dynosam_tpu.backend import formulation as fm
    from dynosam_tpu.backend.map import MeasurementMap, slice_window, update_map

    scfg = ScenarioConfig(n_frames=6, n_static=30, n_objects=1,
                          pts_per_object=10, ns=40, nd=16, no=2)
    sc = Scenario(scfg)
    m = MeasurementMap.create(6, 40, 16, 2)
    for k, pkt in enumerate(sc.frontend_outputs()):
        m = update_map(m, pkt, k)
    cfg = BackendConfig()
    w = slice_window(m, 0, 6)
    masks = fm.build_masks(w, cfg)
    vals = fm.init_values(w, masks, cfg)
    anchor = w.X_init[0]
    iso_L = jnp.eye(6) / cfg.initial_pose_prior_sigma
    r_plain = fm.world_motion_residuals(vals, w, masks, cfg, anchor)
    r_L = fm.world_motion_residuals(
        vals, w, masks, cfg, anchor, anchor_prior_L=iso_L
    )
    for a, b in zip(r_plain, r_L):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_boundary_marginal_matches_dense():
    """The Schur-complement boundary marginal == the same complement taken
    on the DENSE GN Hessian of the identical (masked) residuals (f64)."""
    jax.config.update("jax_enable_x64", True)
    try:
        from dynosam_tpu.backend import formulation as fm
        from dynosam_tpu.backend import schur
        from dynosam_tpu.backend.fixed_lag import boundary_prior
        from dynosam_tpu.backend.map import (MeasurementMap, slice_window,
                                             update_map)
        from dynosam_tpu.backend.solver import robust_sqrt_weights
        from dynosam_tpu.core.lie import SE3, se3_retract

        def cast(t):
            return jax.tree.map(
                lambda a: a.astype(jnp.float64)
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                else a, t,
            )

        scfg = ScenarioConfig(n_frames=5, n_static=24, n_objects=1,
                              pts_per_object=8, ns=30, nd=12, no=2,
                              point_noise=0.01)
        sc = Scenario(scfg)
        m = MeasurementMap.create(5, 30, 12, 2)
        for k, pkt in enumerate(sc.frontend_outputs()):
            m = update_map(m, pkt, k)
        m = cast(m)
        cfg = BackendConfig(window_max_static=0, window_max_dynamic=0,
                            window_max_objects=0)
        n_sub = 5
        w = slice_window(m, 0, n_sub)
        masks = fm.build_masks(w, cfg)
        masks = masks._replace(
            static_obs=masks.static_obs.at[-1].set(False),
            dyn_obs=masks.dyn_obs.at[-1].set(False),
        )
        vals = fm.init_values(w, masks, cfg)
        anchor = w.X_init[0]

        # our marginal
        L, xbar = boundary_prior(m, 0, n_sub, cfg, vals, 0, anchor)
        Lam = np.asarray(L @ L.T)

        # dense GN Hessian of the identical residuals via jacfwd over a
        # global tangent, then the same two-stage complement
        spec = fm.world_motion_families(cfg)
        res0 = fm.world_motion_residuals(vals, w, masks, cfg, anchor)
        sqrt_w = [
            robust_sqrt_weights(r, s.k, s.kind) if s.kind != "none"
            else jnp.ones(r.shape[:-1], r.dtype)
            for r, s in zip(res0, spec.robust)
        ]

        sizes = {
            "X": 6 * n_sub, "H": 6 * n_sub * 2, "sp": 30 * 3,
            "dp": n_sub * 12 * 3,
        }
        ntot = sum(sizes.values())

        def apply_tangent(z):
            o = 0
            dX = z[o:o + sizes["X"]].reshape(n_sub, 6); o += sizes["X"]
            dH = z[o:o + sizes["H"]].reshape(n_sub, 2, 6); o += sizes["H"]
            dsp = z[o:o + sizes["sp"]].reshape(30, 3); o += sizes["sp"]
            ddp = z[o:].reshape(n_sub, 12, 3)
            X = jax.vmap(se3_retract)(vals["X"], dX)
            H = jax.vmap(jax.vmap(se3_retract))(vals["H"], dH)
            v = {"X": X, "H": H, "sp": vals["sp"] + dsp,
                 "dp": vals["dp"] + ddp}
            res = fm.world_motion_residuals(v, w, masks, cfg, anchor)
            return jnp.concatenate([
                (r * sw[..., None]).reshape(-1)
                for r, sw in zip(res, sqrt_w)
            ])

        J = jax.jacfwd(apply_tangent)(jnp.zeros(ntot, jnp.float64))
        Hd = np.asarray(J.T @ J)
        # identical tiny damping as schur_step's call in boundary_prior:
        # lam * max(diag-block) floors are applied per-family inside the
        # elimination — at 1e-8 they are negligible vs the marginal scale
        b0 = 6 * (n_sub - 1)
        keep = np.arange(b0, b0 + 6)
        drop = np.concatenate([np.arange(b0), np.arange(b0 + 6, ntot)])
        Hbb = Hd[np.ix_(keep, keep)]
        Hbm = Hd[np.ix_(keep, drop)]
        Hmm = Hd[np.ix_(drop, drop)] + 1e-10 * np.eye(len(drop))
        want = Hbb - Hbm @ np.linalg.solve(Hmm, Hbm.T)

        scale = max(np.abs(want).max(), 1.0)
        assert np.abs(Lam - want).max() / scale < 5e-4, (
            np.abs(Lam - want).max() / scale
        )
    finally:
        jax.config.update("jax_enable_x64", False)


def test_fixed_lag_e2e_accuracy():
    """Sliding-window run with the fixed-lag prior: converges, and the
    camera ATE stays within a small factor of (or beats) the fresh-rebuild
    default on the same scenario."""
    scfg = ScenarioConfig(n_frames=14, n_static=60, n_objects=2,
                          pts_per_object=14, ns=80, nd=48, no=4,
                          point_noise=0.02)
    cap = dict(opt_window_size=6, opt_window_overlap=2)
    sc0, be0, X0, xv0 = _run(cap, scfg)
    sc1, be1, X1, xv1 = _run({**cap, "use_fixed_lag_prior": True}, scfg)
    assert xv1.all() and xv0.all()

    def ate(X, sc):
        err = []
        for k in range(scfg.n_frames):
            gt = sc.X_gt[k]
            err.append(np.linalg.norm(np.asarray(X.t[k]) - np.asarray(gt.t)))
        return float(np.sqrt(np.mean(np.square(err))))

    a0 = ate(X0, sc0)
    a1 = ate(X1, sc1)
    assert np.isfinite(a1)
    # must not blow up vs the fresh rebuild; typically improves boundaries
    assert a1 < max(2.0 * a0, a0 + 0.02), (a0, a1)
