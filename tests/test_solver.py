"""LM/PCG solver tests: convergence on synthetic pose-graph + BA problems,
matrix-free vs dense cross-check."""

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.backend import solver
from dynosam_tpu.core import lie
from dynosam_tpu.ops import factors


def test_pcg_solves_spd_system(rng):
    n = 40
    M = rng.normal(size=(n, n))
    A = jnp.asarray(M @ M.T + n * np.eye(n), jnp.float32)
    b = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    diag = jnp.diag(A)
    x, iters, rn = solver.pcg(
        lambda v: A @ v, b, lambda r: r / diag, jnp.zeros(n, jnp.float32),
        max_iters=200, tol=1e-6,
    )
    np.testing.assert_allclose(A @ x, b, atol=1e-2)


def test_lm_pose_graph(rng):
    """Chain of 10 poses with odometry + loop closure; noisy init must
    converge to ground truth."""
    F = 10
    gt_xi = jnp.asarray(rng.normal(size=(F, 6)) * 0.3, jnp.float32)
    gt = lie.se3_exp(jnp.cumsum(gt_xi, axis=0) * 0.3)

    odo = lie.se3_between(gt[:-1], gt[1:])
    prior_pose = gt[0]

    noisy = lie.se3_retract(
        gt, jnp.asarray(rng.normal(size=(F, 6)) * 0.1, jnp.float32)
    )

    def residual_fn(values):
        X = values["X"]
        r_odo = factors.between_residual(X[:-1], X[1:], odo) / 0.01
        r_prior = factors.prior_residual(X[0], prior_pose)[None] / 1e-3
        return [r_odo, r_prior]

    specs = [solver.RobustSpec(), solver.RobustSpec()]
    cfg = solver.LMConfig(max_iterations=20, cg_max_iterations=100)
    res = jax.jit(
        lambda v: solver.lm_optimize(residual_fn, specs, v, cfg)
    )({"X": noisy})
    X = res.values["X"]
    err = np.asarray(jax.vmap(lie.se3_local)(X, gt))
    assert res.error < 1e-2 * res.initial_error
    np.testing.assert_allclose(err, 0.0, atol=5e-3)


def test_lm_small_ba(rng):
    """Mini bundle adjustment: 5 poses, 50 points, pose-to-point factors."""
    F, N = 5, 50
    gt_pts = jnp.asarray(rng.uniform(-5, 5, size=(N, 3)), jnp.float32)
    gt_X = lie.se3_exp(
        jnp.asarray(rng.normal(size=(F, 6)) * 0.2, jnp.float32)
    )
    # measurements: local points (camera frame), tiny noise
    meas = jax.vmap(
        lambda X: lie.se3_apply(lie.se3_inverse(X), gt_pts)
    )(gt_X) + jnp.asarray(rng.normal(size=(F, N, 3)) * 0.001, jnp.float32)

    init = {
        "X": lie.se3_retract(
            gt_X, jnp.asarray(rng.normal(size=(F, 6)) * 0.05, jnp.float32)
        ),
        "p": gt_pts + jnp.asarray(rng.normal(size=(N, 3)) * 0.1, jnp.float32),
    }

    def residual_fn(values):
        X, p = values["X"], values["p"]
        # broadcast: X (F,), p (N,3) -> residual (F, N, 3)
        r = jax.vmap(lambda Xk: factors.pose_to_point_residual(Xk, p, jnp.zeros(3)))(X)
        r = r - meas
        # gauge: prior on first pose + first point
        r_prior = factors.prior_residual(X[0], gt_X[0])[None] / 1e-4
        return [r / 0.01, r_prior]

    specs = [solver.RobustSpec("huber", 5.0), solver.RobustSpec()]
    cfg = solver.LMConfig(max_iterations=15, cg_max_iterations=150)
    res = solver.lm_optimize(residual_fn, specs, init, cfg)
    assert float(res.error) < 0.02 * float(res.initial_error)
    pose_err = np.linalg.norm(
        np.asarray(jax.vmap(lie.se3_local)(res.values["X"], gt_X)), axis=-1
    )
    assert pose_err.max() < 0.01


def test_matrix_free_matches_dense(rng):
    """One GN step: matrix-free PCG result ~= dense normal-equation solve."""
    F = 4
    gt = lie.se3_exp(jnp.asarray(rng.normal(size=(F, 6)) * 0.2, jnp.float32))
    odo = lie.se3_between(gt[:-1], gt[1:])
    noisy = lie.se3_retract(gt, jnp.asarray(rng.normal(size=(F, 6)) * 0.05, jnp.float32))

    def residual_fn(values):
        X = values["X"]
        return [
            factors.between_residual(X[:-1], X[1:], odo) / 0.01,
            factors.prior_residual(X[0], gt[0])[None] / 1e-3,
        ]

    specs = [solver.RobustSpec(), solver.RobustSpec()]
    dense_vals, J = solver.dense_normal_solve(residual_fn, specs, {"X": noisy})

    cfg = solver.LMConfig(
        max_iterations=1, cg_max_iterations=400, cg_tol=1e-10,
        initial_lambda=0.0,
    )
    mf = solver.lm_optimize(residual_fn, specs, {"X": noisy}, cfg)
    np.testing.assert_allclose(
        np.asarray(mf.values["X"].t), np.asarray(dense_vals["X"].t), atol=1e-3
    )


def test_masked_residuals_do_not_affect_solution(rng):
    """Zero-masked residual rows must not alter the result."""
    gt = lie.se3_exp(jnp.asarray(rng.normal(size=(3, 6)) * 0.2, jnp.float32))
    odo = lie.se3_between(gt[:-1], gt[1:])
    noisy = lie.se3_retract(gt, jnp.asarray(rng.normal(size=(3, 6)) * 0.05, jnp.float32))

    def make_resfn(with_garbage):
        def residual_fn(values):
            X = values["X"]
            rs = [
                factors.between_residual(X[:-1], X[1:], odo) / 0.01,
                factors.prior_residual(X[0], gt[0])[None] / 1e-3,
            ]
            if with_garbage:
                # a fully masked family of bogus factors
                bogus = factors.between_residual(X[:-1], X[1:], lie.se3_exp(
                    jnp.ones((2, 6), jnp.float32)
                ))
                rs.append(bogus * 0.0)
            return rs
        return residual_fn

    cfg = solver.LMConfig(max_iterations=10)
    specs2 = [solver.RobustSpec()] * 2
    specs3 = [solver.RobustSpec()] * 3
    r1 = solver.lm_optimize(make_resfn(False), specs2, {"X": noisy}, cfg)
    r2 = solver.lm_optimize(make_resfn(True), specs3, {"X": noisy}, cfg)
    np.testing.assert_allclose(
        np.asarray(r1.values["X"].t), np.asarray(r2.values["X"].t), atol=1e-4
    )
