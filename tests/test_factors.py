"""Factor residual tests — semantic checks mirroring reference
`test/test_factors.cc` (zero at ground truth, AD-vs-finite-difference
Jacobians, batched evaluation)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.core import camera as cam
from dynosam_tpu.core import lie
from dynosam_tpu.ops import factors


def rand_pose(rng, n=(), scale=0.5):
    shape = (*n, 6) if isinstance(n, tuple) else (n, 6)
    return lie.se3_exp(jnp.asarray(rng.normal(size=shape) * scale, jnp.float32))


def test_pose_to_point_zero_at_truth(rng):
    X = rand_pose(rng, (16,))
    p_w = jnp.asarray(rng.normal(size=(16, 3)) * 5, jnp.float32)
    measured = lie.se3_apply(lie.se3_inverse(X), p_w)
    r = factors.pose_to_point_residual(X, p_w, measured)
    np.testing.assert_allclose(r, 0.0, atol=1e-5)


def test_landmark_motion_ternary_zero_at_truth(rng):
    """m_k = H m_{k-1}  =>  e = m_{k-1} - H^-1 m_k = 0."""
    H = rand_pose(rng, (16,))
    m_prev = jnp.asarray(rng.normal(size=(16, 3)) * 3, jnp.float32)
    m_cur = lie.se3_apply(H, m_prev)
    r = factors.landmark_motion_ternary_residual(m_prev, m_cur, H)
    np.testing.assert_allclose(r, 0.0, atol=1e-5)


def test_landmark_motion_ternary_value(rng):
    """Against the reference formula e = m_{k-1} - H^-1 m_k
    (`LandmarkMotionTernaryFactor.cc:44-46`) computed with numpy."""
    H = rand_pose(rng)
    m_prev = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    m_cur = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    Hm = np.asarray(lie.se3_matrix(H))
    expected = np.asarray(m_prev) - (Hm[:3, :3].T @ (np.asarray(m_cur) - Hm[:3, 3]))
    r = factors.landmark_motion_ternary_residual(m_prev, m_cur, H)
    np.testing.assert_allclose(r, expected, atol=1e-5)


def test_landmark_motion_pose_zero_and_equivalence(rng):
    """If H = L_k L_{k-1}^-1 then motion-pose residual equals ternary."""
    L_prev = rand_pose(rng, (8,))
    L_cur = rand_pose(rng, (8,))
    m_prev = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    H = lie.se3_compose(L_cur, lie.se3_inverse(L_prev))
    m_cur = lie.se3_apply(H, m_prev)
    r = factors.landmark_motion_pose_residual(m_prev, m_cur, L_prev, L_cur)
    np.testing.assert_allclose(r, 0.0, atol=1e-5)


def test_object_kinematic_zero_at_truth(rng):
    L_prev = rand_pose(rng, (8,))
    H = rand_pose(rng, (8,))
    L_cur = lie.se3_compose(H, L_prev)
    r = factors.object_kinematic_residual(H, L_prev, L_cur)
    np.testing.assert_allclose(r, 0.0, atol=1e-4)


def test_smoothing_zero_for_constant_motion(rng):
    """Constant motion => smoothing residual is zero."""
    L0 = rand_pose(rng)
    H = rand_pose(rng)
    L1 = lie.se3_compose(H, L0)
    L2 = lie.se3_compose(H, L1)
    r = factors.landmark_pose_smoothing_residual(L0, L1, L2)
    np.testing.assert_allclose(r, 0.0, atol=1e-4)
    # motion smoothing equivalent for H-chains
    r2 = factors.motion_smoothing_residual(H, H)
    np.testing.assert_allclose(r2, 0.0, atol=1e-5)


def test_between_residual_semantics(rng):
    a = rand_pose(rng)
    b = rand_pose(rng)
    z = lie.se3_between(a, b)
    np.testing.assert_allclose(factors.between_residual(a, b, z), 0.0, atol=1e-5)
    # perturbation recovers local coords
    xi = jnp.asarray(rng.normal(size=(6,)) * 0.1, jnp.float32)
    b2 = lie.se3_retract(b, xi)
    np.testing.assert_allclose(
        factors.between_residual(a, b2, z), xi, atol=1e-4
    )


def test_flow_projection_zero_at_truth(rng):
    params = cam.CameraParams.create(320.0, 320.0, 320.0, 240.0, 640, 480)
    X_prev = rand_pose(rng, scale=0.2)
    X_cur = lie.se3_retract(X_prev, jnp.asarray([0.01, 0, 0, 0.2, 0, 0.1], jnp.float32))
    kp = jnp.asarray(rng.uniform(100, [500, 380], size=(32, 2)), jnp.float32)
    depth = jnp.asarray(rng.uniform(3, 20, size=(32,)), jnp.float32)
    # ground-truth flow: project world point into current frame
    p_w = lie.se3_apply(X_prev, cam.backproject(params, kp, depth))
    uv_cur, _ = cam.project(params, X_cur, p_w)
    flow = uv_cur - kp
    r, z = factors.flow_projection_residual(flow, X_cur, kp, depth, X_prev, params)
    np.testing.assert_allclose(r, 0.0, atol=1e-2)
    assert np.all(np.asarray(z) > 0)


def test_factor_jacobians_finite_and_match_fd(rng):
    """AD jacobians of every pose-factor vs central finite differences."""
    H = rand_pose(rng)
    Lp = rand_pose(rng)
    Lc = rand_pose(rng)

    def f(xi):
        return factors.object_kinematic_residual(lie.se3_retract(H, xi), Lp, Lc)

    J = jax.jacfwd(f)(jnp.zeros(6, jnp.float32))
    eps = 1e-3
    for d in range(6):
        e = jnp.zeros(6, jnp.float32).at[d].set(eps)
        fd = (f(e) - f(-e)) / (2 * eps)
        np.testing.assert_allclose(J[:, d], fd, atol=2e-2)
