"""Direct reduced (Schur) solver tests.

The damped step from landmark elimination + dense Cholesky must equal the
dense reference solve of the SAME damped normal equations; and the Schur LM
driver must converge on the simulator scenario like the PCG path does
(analog of reference `test_rgbd_backend.cc` convergence checks).
"""

import jax.numpy as jnp
import numpy as np

from dynosam_tpu.backend import formulation as fm
from dynosam_tpu.backend import schur
from dynosam_tpu.backend.backend import RGBDBackend
from dynosam_tpu.backend.map import MeasurementMap, slice_window, update_map
from dynosam_tpu.backend.solver import dense_normal_solve, retract_tree
from dynosam_tpu.core import lie
from dynosam_tpu.ops.robust import robust_sqrt_weights
from dynosam_tpu.testing.simulator import Scenario, ScenarioConfig
from dynosam_tpu.utils.config import BackendConfig, CapacityConfig

from test_backend import motion_errors, small_caps


def make_problem(**cfg_kw):
    scfg = ScenarioConfig(
        n_frames=8, n_static=30, n_objects=2, pts_per_object=10,
        ns=40, nd=32, no=4, point_noise=0.02,
    )
    sc = Scenario(scfg)
    m = MeasurementMap.create(8, 40, 32, 4)
    for k, pkt in enumerate(sc.frontend_outputs()):
        m = update_map(m, pkt, k)
    w = slice_window(m, 0, 8)
    # soften the ternary sigma so the f32 weight cap is INACTIVE and the
    # Schur step is algebraically identical to the dense reference
    cfg = BackendConfig(motion_ternary_factor_noise_sigma=0.05, **cfg_kw)
    masks = fm.build_masks(w, cfg)
    return sc, scfg, w, masks, cfg


def test_schur_step_matches_dense():
    sc, scfg, w, masks, cfg = make_problem()
    anchor = w.X_init[0]
    vals = fm.init_values(w, masks, cfg)
    spec = fm.world_motion_families(cfg)

    def resid(v):
        return fm.world_motion_residuals(v, w, masks, cfg, anchor)

    lam = 1e-3
    res0 = resid(vals)
    sqrt_w = [
        robust_sqrt_weights(r, s.k, s.kind) if s.kind != "none"
        else jnp.ones(r.shape[:-1], r.dtype)
        for r, s in zip(res0, spec.robust)
    ]
    sys = schur.build_normal_system(vals, sqrt_w, w, masks, cfg, anchor, res0)
    delta = schur.schur_step(sys, jnp.asarray(lam, jnp.float32), 1e-6,
                             formulation=0)
    delta = {"X": delta["X"], "H": delta["P"], "sp": delta["sp"], "dp": delta["dp"]}
    got = retract_tree(vals, delta)
    want, _ = dense_normal_solve(resid, spec.robust, vals, lam)

    np.testing.assert_allclose(
        np.asarray(got["X"].t), np.asarray(want["X"].t), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["X"].R), np.asarray(want["X"].R), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["H"].t), np.asarray(want["H"].t), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["sp"]), np.asarray(want["sp"]), atol=2e-3
    )
    # only compare dynamic points that participate in the problem
    ok = np.asarray(masks.dyn_obs)[..., None]
    np.testing.assert_allclose(
        np.asarray(got["dp"]) * ok, np.asarray(want["dp"]) * ok, atol=5e-3
    )


def test_schur_step_reduces_cost():
    """With the reference's true (tiny) ternary sigma the weight cap IS
    active; the step must still decrease the true robust cost."""
    sc, scfg, w, masks, cfg = make_problem()
    cfg = BackendConfig()  # true sigmas, cap active
    masks = fm.build_masks(w, cfg)
    anchor = w.X_init[0]
    vals = fm.init_values(w, masks, cfg)
    spec = fm.world_motion_families(cfg)

    def resid(v):
        return fm.world_motion_residuals(v, w, masks, cfg, anchor)

    from dynosam_tpu.backend.solver import total_error

    res0 = resid(vals)
    err0 = float(total_error(res0, spec.robust))
    sqrt_w = [
        robust_sqrt_weights(r, s.k, s.kind) if s.kind != "none"
        else jnp.ones(r.shape[:-1], r.dtype)
        for r, s in zip(res0, spec.robust)
    ]
    sys = schur.build_normal_system(vals, sqrt_w, w, masks, cfg, anchor, res0)
    delta = schur.schur_step(sys, jnp.asarray(1e-4, jnp.float32), 1e-6,
                             formulation=0)
    delta = {"X": delta["X"], "H": delta["P"], "sp": delta["sp"], "dp": delta["dp"]}
    new_vals = retract_tree(vals, delta)
    err1 = float(total_error(resid(new_vals), spec.robust))
    assert np.isfinite(err1)
    assert err1 < err0, (err0, err1)


def test_backend_schur_converges():
    scfg = ScenarioConfig(n_frames=12)
    scenario = Scenario(scfg)
    cfg = BackendConfig(
        use_full_batch_opt=True,
        use_schur=True,
        lm_max_iterations=25,
    )
    backend = RGBDBackend(cfg, small_caps(scfg))
    for pkt in scenario.frontend_outputs():
        backend.spin(pkt)
    backend.finish()

    res = backend.last_result
    assert res is not None
    assert float(res.error) < float(res.initial_error)

    X_est, xvalid = backend.camera_poses()
    assert bool(np.asarray(xvalid)[: scfg.n_frames].all())
    rel_est = lie.se3_between(X_est[0], X_est[scfg.n_frames - 1])
    rel_gt = lie.se3_between(
        scenario.X_gt[0], scenario.X_gt[scfg.n_frames - 1]
    )
    drift = np.asarray(lie.se3_local(rel_gt, rel_est))
    assert np.linalg.norm(drift[3:]) < 0.15, drift

    errs = motion_errors(backend, scenario, scfg)
    assert errs.shape[0] > 0
    assert np.median(errs) < 0.08, errs


def test_chain_solve_matches_dense():
    """Block-Thomas with matrix RHS == dense solve of the assembled
    block-tridiagonal system, for every track at once."""
    rng = np.random.default_rng(0)
    W, N, M = 5, 3, 4
    # SPD block-tridiagonal per track: G = C C^T + I with C block-bidiagonal
    A = np.zeros((W, N, 3, 3), np.float32)
    B = np.zeros((W, N, 3, 3), np.float32)
    rhs = rng.normal(size=(W, N, 3, M)).astype(np.float32)
    dense = np.zeros((N, 3 * W, 3 * W), np.float32)
    for n in range(N):
        C = np.zeros((3 * W, 3 * W))
        for k in range(W):
            C[3 * k : 3 * k + 3, 3 * k : 3 * k + 3] = rng.normal(size=(3, 3))
            if k > 0:
                C[3 * k : 3 * k + 3, 3 * k - 3 : 3 * k] = rng.normal(
                    size=(3, 3)
                )
        G = C @ C.T + np.eye(3 * W)
        dense[n] = G
        for k in range(W):
            A[k, n] = G[3 * k : 3 * k + 3, 3 * k : 3 * k + 3]
            if k > 0:
                # B[k] is the (row k-1, col k) block
                B[k, n] = G[3 * k - 3 : 3 * k, 3 * k : 3 * k + 3]
    got = np.asarray(
        schur.chain_solve(jnp.asarray(A), jnp.asarray(B), jnp.asarray(rhs))
    )
    for n in range(N):
        want = np.linalg.solve(
            dense[n], rhs[:, n].reshape(3 * W, M)
        ).reshape(W, 3, M)
        np.testing.assert_allclose(got[:, n], want, rtol=2e-4, atol=2e-4)


def test_schur_step_matches_dense_world_pose():
    """WorldPose (LLWorld) direct reduced step == dense solve of the same
    damped normal equations (validates the hand-derived LandmarkMotionPose
    Jacobians and the 4-coupling chain layout)."""
    sc, scfg, w, masks, cfg = make_problem()
    anchor = w.X_init[0]
    vals = fm.init_values_world_pose(w, masks, cfg)
    spec = fm.world_pose_families(cfg)

    def resid(v):
        return fm.world_pose_residuals(v, w, masks, cfg, anchor)

    lam = 1e-3
    res0 = resid(vals)
    sqrt_w = [
        robust_sqrt_weights(r, s.k, s.kind) if s.kind != "none"
        else jnp.ones(r.shape[:-1], r.dtype)
        for r, s in zip(res0, spec.robust)
    ]
    sys = schur.build_normal_system_pose(
        vals, sqrt_w, w, masks, cfg, anchor, res0
    )
    delta = schur.schur_step(sys, jnp.asarray(lam, jnp.float32), 1e-6,
                             formulation=1)
    delta = {"X": delta["X"], "L": delta["P"], "sp": delta["sp"], "dp": delta["dp"]}
    got = retract_tree(vals, delta)
    want, _ = dense_normal_solve(resid, spec.robust, vals, lam)

    np.testing.assert_allclose(
        np.asarray(got["X"].t), np.asarray(want["X"].t), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["X"].R), np.asarray(want["X"].R), atol=2e-3
    )
    # L tolerance is looser: the dense AD reference linearizes through the
    # slightly non-orthonormal f32 rotations (R^T R = I + ~1e-6) while the
    # closed forms assume exact orthonormality; the ill-conditioned L block
    # amplifies that into ~1e-2 step differences (verified block-by-block:
    # direct Hessian/gradient blocks agree to <1e-6 in f64)
    np.testing.assert_allclose(
        np.asarray(got["L"].t), np.asarray(want["L"].t), atol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(got["sp"]), np.asarray(want["sp"]), atol=2e-3
    )
    ok = np.asarray(masks.dyn_obs)[..., None]
    np.testing.assert_allclose(
        np.asarray(got["dp"]) * ok, np.asarray(want["dp"]) * ok, atol=5e-3
    )
    # both steps must decrease the true cost comparably
    from dynosam_tpu.backend.solver import total_error

    err0 = float(total_error(res0, spec.robust))
    err_got = float(total_error(resid(got), spec.robust))
    err_want = float(total_error(resid(want), spec.robust))
    assert err_got < err0
    assert err_got < 1.05 * err_want + 1e-6, (err_got, err_want)


def test_backend_schur_world_pose_converges():
    """Updater-1 sliding windows with the direct solver + warm start."""
    scfg = ScenarioConfig(n_frames=12)
    scenario = Scenario(scfg)
    cfg = BackendConfig(
        backend_updater_enum=1,
        use_schur=True,
        opt_window_size=8,
        opt_window_overlap=3,
        lm_max_iterations=20,
    )
    backend = RGBDBackend(cfg, small_caps(scfg))
    for pkt in scenario.frontend_outputs():
        backend.spin(pkt)
    backend.finish()

    res = backend.last_result
    assert res is not None
    assert float(res.error) < float(res.initial_error)
    X_est, xvalid = backend.camera_poses()
    assert bool(np.asarray(xvalid)[: scfg.n_frames].all())
    rel_est = lie.se3_between(X_est[0], X_est[scfg.n_frames - 1])
    rel_gt = lie.se3_between(
        scenario.X_gt[0], scenario.X_gt[scfg.n_frames - 1]
    )
    drift = np.asarray(lie.se3_local(rel_gt, rel_est))
    assert np.linalg.norm(drift[3:]) < 0.2, drift


def test_schur_step_world_pose_kinematic():
    """With the optional ObjectKinematicFactor enabled the WorldPose step
    still matches the dense solve (validates the extra pose-pair blocks)."""
    sc, scfg, w, masks, _ = make_problem()
    cfg = BackendConfig(
        motion_ternary_factor_noise_sigma=0.05,
        use_object_kinematic_factor=True,
        object_kinematic_sigma=0.05,
    )
    masks = fm.build_masks(w, cfg)
    anchor = w.X_init[0]
    vals = fm.init_values_world_pose(w, masks, cfg)
    spec = fm.world_pose_families(cfg)
    assert spec.names[-1] == "kinematic"

    def resid(v):
        return fm.world_pose_residuals(v, w, masks, cfg, anchor)

    res0 = resid(vals)
    assert len(res0) == 7
    sqrt_w = [
        robust_sqrt_weights(r, s.k, s.kind) if s.kind != "none"
        else jnp.ones(r.shape[:-1], r.dtype)
        for r, s in zip(res0, spec.robust)
    ]
    sys = schur.build_normal_system_pose(
        vals, sqrt_w, w, masks, cfg, anchor, res0
    )
    delta = schur.schur_step(sys, jnp.asarray(1e-3, jnp.float32), 1e-6,
                             formulation=1)
    delta = {"X": delta["X"], "L": delta["P"], "sp": delta["sp"], "dp": delta["dp"]}
    got = retract_tree(vals, delta)
    want, _ = dense_normal_solve(resid, spec.robust, vals, 1e-3)
    np.testing.assert_allclose(
        np.asarray(got["X"].t), np.asarray(want["X"].t), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["L"].t), np.asarray(want["L"].t), atol=3e-2
    )


def test_chain_solve_lanes_matches_block_major(rng):
    """Lane-major chain solve == block-major on random SPD chains."""
    W, N, M = 8, 12, 7
    A = np.zeros((W, N, 3, 3), np.float32)
    B = np.zeros((W, N, 3, 3), np.float32)
    rhs = rng.normal(size=(W, N, 3, M)).astype(np.float32)
    for n in range(N):
        C = np.zeros((3 * W, 3 * W))
        for k in range(W):
            C[3 * k:3 * k + 3, 3 * k:3 * k + 3] = rng.normal(size=(3, 3))
            if k > 0:
                C[3 * k:3 * k + 3, 3 * k - 3:3 * k] = rng.normal(size=(3, 3))
        G = C @ C.T + np.eye(3 * W)
        for k in range(W):
            A[k, n] = G[3 * k:3 * k + 3, 3 * k:3 * k + 3]
            if k > 0:
                B[k, n] = G[3 * k - 3:3 * k, 3 * k:3 * k + 3]
    want = np.asarray(
        schur.chain_solve(jnp.asarray(A), jnp.asarray(B), jnp.asarray(rhs))
    )
    got = np.asarray(
        schur.chain_solve_lanes(
            jnp.asarray(A), jnp.asarray(B), jnp.asarray(rhs)
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_chain_solve_ternary_and_scalar_match_generic(rng):
    """`chain_solve_ternary` (gamma-form, cancellation-free) and
    `chain_solve_scalar` (explicit-alpha Thomas) == the generic block
    solver on scalar-diagonal / scaled-rotation chains (the structure both
    backend formulations build — schur.py session-9 notes)."""
    import scipy.spatial.transform as sst

    W, N, M = 7, 6, 4
    c = jnp.asarray(rng.uniform(0.5, 2.0, (W, N)), jnp.float32)
    T = jnp.asarray(rng.uniform(0.1, 5.0, (W, N)), jnp.float32)
    T = T.at[0].set(0.0)
    # a chain cut mid-way (factor mask edge)
    T = T.at[4, :2].set(0.0)
    R = jnp.asarray(
        sst.Rotation.random(W * N, random_state=3).as_matrix().reshape(
            W, N, 3, 3
        ),
        jnp.float32,
    )
    B = -T[..., None, None] * jnp.swapaxes(R, -1, -2)
    Tn = jnp.concatenate([T[1:], jnp.zeros_like(T[:1])], axis=0)
    alpha = c + T + Tn
    eye3 = jnp.eye(3, dtype=jnp.float32)
    A = alpha[..., None, None] * eye3
    rhs = jnp.asarray(rng.normal(0, 1, (W, N, 3, M)), jnp.float32)

    want = schur.chain_solve(A, B, rhs)
    got_t = schur.chain_solve_ternary(c, T, B, rhs)
    got_s = schur.chain_solve_scalar(alpha, B, rhs)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
