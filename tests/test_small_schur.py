"""Direct block-eliminated LM (`backend/small_schur.py`): step-vs-dense
cross-check, PCG equivalence, masked-track safety, refine-stage parity."""

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.backend import small_schur, solver
from dynosam_tpu.core import lie


def _make_problem(rng, n=24):
    """N point blocks + one global pose: r_i = X^-1 p_i - meas_i."""
    gt_pts = jnp.asarray(rng.uniform(-4, 4, size=(n, 3)), jnp.float32)
    gt_X = lie.se3_exp(jnp.asarray(rng.normal(size=(6,)) * 0.2, jnp.float32))
    meas = lie.se3_apply(lie.se3_inverse(gt_X), gt_pts)
    meas = meas + jnp.asarray(rng.normal(size=(n, 3)) * 0.001, jnp.float32)
    init = {
        "p": gt_pts + jnp.asarray(rng.normal(size=(n, 3)) * 0.05, jnp.float32),
        "X": lie.se3_retract(
            gt_X, jnp.asarray(rng.normal(size=(6,)) * 0.05, jnp.float32)
        ),
    }

    def residual_fn(values):
        p, X = values["p"], values["X"]
        r = lie.se3_apply(lie.se3_inverse(X), p) - meas
        # prior on the points pins the gauge (every block observed twice)
        r_prior = (p - gt_pts) / 5.0
        return [r / 0.01, r_prior]

    return residual_fn, init, gt_X, gt_pts


def test_eliminated_step_matches_dense(rng):
    residual_fn, init, _, _ = _make_problem(rng)
    specs = [solver.RobustSpec(), solver.RobustSpec()]
    dense_vals, _ = solver.dense_normal_solve(residual_fn, specs, init)
    cfg = solver.LMConfig(max_iterations=1, initial_lambda=0.0)
    res = small_schur.lm_optimize_eliminated(
        residual_fn, specs, init, cfg, block_keys=("p",), glob_keys=("X",)
    )
    # both solvers are f32 with slightly different Tikhonov epsilons
    # (1e-8 vs 1e-10 on the diagonal) and the 1/0.01 whitening puts the
    # normal system near kappa ~ 1e6, so f32 agreement is ~2.5 digits
    # (the lane-major contraction order shifts rounding; the formulas are
    # verified exactly equivalent in f64 — BENCH_NOTES session 5)
    np.testing.assert_allclose(
        np.asarray(res.values["p"]), np.asarray(dense_vals["p"]), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(res.values["X"].t), np.asarray(dense_vals["X"].t),
        atol=2e-2,
    )


def test_eliminated_converges_and_matches_pcg(rng):
    residual_fn, init, gt_X, gt_pts = _make_problem(rng)
    specs = [solver.RobustSpec("huber", 5.0), solver.RobustSpec()]
    cfg = solver.LMConfig(max_iterations=15)
    res = jax.jit(
        lambda v: small_schur.lm_optimize_eliminated(
            residual_fn, specs, v, cfg, block_keys=("p",), glob_keys=("X",)
        )
    )(init)
    assert float(res.error) < 0.05 * float(res.initial_error)
    pcg = solver.lm_optimize(
        residual_fn, specs, init,
        solver.LMConfig(max_iterations=15, cg_max_iterations=200),
    )
    # both reach the same optimum
    np.testing.assert_allclose(
        np.asarray(res.values["X"].t), np.asarray(pcg.values["X"].t),
        atol=1e-3,
    )
    err = np.linalg.norm(
        np.asarray(lie.se3_local(res.values["X"], gt_X))
    )
    assert err < 0.01


def test_eliminated_masked_tracks_are_inert(rng):
    """Fully zero-masked blocks must stay finite and not move the global."""
    residual_fn, init, _, _ = _make_problem(rng, n=16)
    mask = jnp.asarray(rng.uniform(size=16) < 0.5)

    def masked_fn(values):
        rs = residual_fn(values)
        return [jnp.where(mask[:, None], r, 0.0) for r in rs]

    specs = [solver.RobustSpec(), solver.RobustSpec()]
    cfg = solver.LMConfig(max_iterations=10)
    res = small_schur.lm_optimize_eliminated(
        masked_fn, specs, init, cfg, block_keys=("p",), glob_keys=("X",)
    )
    assert np.isfinite(np.asarray(res.values["p"])).all()
    assert np.isfinite(np.asarray(res.values["X"].t)).all()
    # masked blocks keep their initial values
    moved = np.abs(
        np.asarray(res.values["p"]) - np.asarray(init["p"])
    ).max(axis=-1)
    np.testing.assert_allclose(moved[~np.asarray(mask)], 0.0, atol=1e-6)


def test_eliminated_six_dim_blocks(rng):
    """(mp, mc) landmark-pair blocks (b=6) through the 3x3 block-Schur
    inverse: refine-style motion problem converges to the true H."""
    n = 40
    gt_H = lie.se3_exp(jnp.asarray(rng.normal(size=(6,)) * 0.3, jnp.float32))
    mp_gt = jnp.asarray(rng.uniform(-3, 3, size=(n, 3)), jnp.float32)
    mc_gt = lie.se3_apply(gt_H, mp_gt)

    def residual_fn(values):
        mp, mc, H = values["mp"], values["mc"], values["H"]
        r_tern = (mc - lie.se3_apply(H, mp)) / 0.001
        r_p = (mp - mp_gt) / 0.02
        r_c = (mc - mc_gt) / 0.02
        return [r_tern, r_p, r_c]

    init = {
        "mp": mp_gt + jnp.asarray(rng.normal(size=(n, 3)) * 0.02, jnp.float32),
        "mc": mc_gt + jnp.asarray(rng.normal(size=(n, 3)) * 0.02, jnp.float32),
        "H": lie.se3_retract(
            gt_H, jnp.asarray(rng.normal(size=(6,)) * 0.05, jnp.float32)
        ),
    }
    specs = [solver.RobustSpec()] * 3
    res = small_schur.lm_optimize_eliminated(
        residual_fn, specs, init, solver.LMConfig(max_iterations=15),
        block_keys=("mp", "mc"), glob_keys=("H",),
    )
    h_err = np.linalg.norm(np.asarray(lie.se3_local(res.values["H"], gt_H)))
    assert h_err < 5e-3
    assert float(res.error) < 0.05 * float(res.initial_error)


def test_inv_spd_blocks(rng):
    for b in (1, 2, 3, 6):
        M = rng.normal(size=(7, b, b)).astype(np.float32)
        spd = jnp.asarray(M @ np.swapaxes(M, -1, -2) + 3.0 * np.eye(b, dtype=np.float32))
        inv = small_schur._inv_spd(spd)
        prod = np.asarray(jnp.einsum("nij,njk->nik", spd, inv))
        np.testing.assert_allclose(
            prod, np.broadcast_to(np.eye(b), prod.shape), atol=2e-3
        )


def _refine_problem(rng, n=64):
    """A realistic joint flow+pose instance for the analytic-Jacobian A/B."""
    from dynosam_tpu.core.camera import CameraParams
    from dynosam_tpu.core.lie import SE3, se3_exp

    cam = CameraParams(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480
    )
    kp = jnp.asarray(
        rng.uniform([40, 40], [600, 440], (n, 2)), jnp.float32
    )
    depth = jnp.asarray(rng.uniform(4.0, 20.0, (n,)), jnp.float32)
    X_prev = se3_exp(jnp.asarray(rng.normal(0, 0.05, (6,)), jnp.float32))
    X_true = se3_exp(jnp.asarray(rng.normal(0, 0.05, (6,)), jnp.float32))
    X_init = se3_exp(jnp.asarray(rng.normal(0, 0.02, (6,)), jnp.float32))
    valid = jnp.asarray(rng.uniform(size=n) > 0.2)
    return cam, kp, depth, X_prev, X_true, X_init, valid


def test_flow_pose_analytic_jacobians_match_probing(rng):
    """refine.optimize_flow_and_pose with analytic Jacobians must follow the
    same LM trajectory as the jax.linearize probing path (identical normal
    systems => identical accepted steps)."""
    from dynosam_tpu.backend import small_schur as ss
    from dynosam_tpu.frontend import refine
    from dynosam_tpu.core.camera import backproject
    from dynosam_tpu.core.lie import se3_apply

    r = np.random.default_rng(3)
    cam, kp, depth, X_prev, X_true, X_init, valid = _refine_problem(r)
    p_w = se3_apply(X_prev, backproject(cam, kp, depth))
    from dynosam_tpu.core.camera import project

    uv_true, _ = project(cam, X_true, p_w)
    flow = uv_true - kp + jnp.asarray(
        r.normal(0, 0.3, kp.shape), jnp.float32
    )

    out_analytic = refine.optimize_flow_and_pose(
        cam, X_init, X_prev, kp, depth, flow, valid
    )

    orig = ss.lm_optimize_eliminated

    def no_jac(*args, **kwargs):
        kwargs.pop("jacobian_fn", None)
        return orig(*args, **kwargs)

    ss_mod = refine.lm_optimize_eliminated
    try:
        refine.lm_optimize_eliminated = no_jac
        out_probed = refine.optimize_flow_and_pose(
            cam, X_init, X_prev, kp, depth, flow, valid
        )
    finally:
        refine.lm_optimize_eliminated = ss_mod

    np.testing.assert_allclose(
        np.asarray(out_analytic.pose.t), np.asarray(out_probed.pose.t),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_analytic.pose.R), np.asarray(out_probed.pose.R),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_analytic.flow), np.asarray(out_probed.flow),
        atol=2e-3,
    )
    assert (
        np.asarray(out_analytic.inliers) == np.asarray(out_probed.inliers)
    ).all()


def test_motion_only_analytic_jacobians_match_probing(rng):
    from dynosam_tpu.frontend import refine
    from dynosam_tpu.core.lie import SE3, se3_apply, se3_exp
    from dynosam_tpu.core.camera import project

    r = np.random.default_rng(5)
    cam, kp, depth, X_prev, X_cur, _, valid = _refine_problem(r)
    n = kp.shape[0]
    m_prev = jnp.asarray(
        np.stack(
            [
                r.uniform(-4, 4, n),
                r.uniform(-2, 2, n),
                r.uniform(6, 18, n),
            ],
            axis=-1,
        ),
        jnp.float32,
    )
    H_true = se3_exp(jnp.asarray(r.normal(0, 0.05, (6,)), jnp.float32))
    H_init = se3_exp(jnp.asarray(r.normal(0, 0.04, (6,)), jnp.float32))
    m_cur = se3_apply(H_true, m_prev)
    uv_prev, _ = project(cam, X_prev, m_prev)
    uv_cur, _ = project(cam, X_cur, m_cur)
    uv_prev = uv_prev + jnp.asarray(r.normal(0, 0.3, (n, 2)), jnp.float32)
    uv_cur = uv_cur + jnp.asarray(r.normal(0, 0.3, (n, 2)), jnp.float32)

    out_analytic = refine.optimize_motion_only(
        cam, H_init, X_prev, X_cur, m_prev, uv_prev, uv_cur, valid
    )

    from dynosam_tpu.backend import small_schur as ss

    orig = ss.lm_optimize_eliminated

    def no_jac(*args, **kwargs):
        kwargs.pop("jacobian_fn", None)
        return orig(*args, **kwargs)

    saved = refine.lm_optimize_eliminated
    try:
        refine.lm_optimize_eliminated = no_jac
        out_probed = refine.optimize_motion_only(
            cam, H_init, X_prev, X_cur, m_prev, uv_prev, uv_cur, valid
        )
    finally:
        refine.lm_optimize_eliminated = saved

    np.testing.assert_allclose(
        np.asarray(out_analytic.motion.t), np.asarray(out_probed.motion.t),
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_analytic.motion.R), np.asarray(out_probed.motion.R),
        atol=5e-4,
    )
    assert (
        np.asarray(out_analytic.inliers) == np.asarray(out_probed.inliers)
    ).all()
