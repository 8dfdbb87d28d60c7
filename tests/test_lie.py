"""SO(3)/SE(3) correctness: round-trips, group laws, Jacobian identities.

Mirrors the role of the reference's geometry unit tests
(`dynosam/test/test_camera.cc`, `test_numerical.cc`) for our Lie layer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.core import lie


def random_xi(rng, n=64, scale=1.0):
    """Random tangents with rotation magnitude bounded below pi (the
    principal log is only unique for |omega| < pi)."""
    xi = rng.normal(size=(n, 6)) * scale
    wn = np.linalg.norm(xi[:, :3], axis=-1, keepdims=True)
    xi[:, :3] *= np.where(wn > 2.8, 2.8 / wn, 1.0)
    return jnp.asarray(xi, jnp.float32)


def test_so3_exp_log_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(128, 3)), jnp.float32)
    R = lie.so3_exp(w)
    # orthonormality
    should_eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(should_eye, np.tile(np.eye(3), (128, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    w2 = lie.so3_log(R)
    R2 = lie.so3_exp(w2)
    np.testing.assert_allclose(R, R2, atol=1e-4)


def test_so3_log_small_and_near_pi(rng):
    for scale in [1e-6, 1e-3]:
        w = jnp.asarray(rng.normal(size=(32, 3)) * scale, jnp.float32)
        np.testing.assert_allclose(lie.so3_log(lie.so3_exp(w)), w, atol=1e-6)
    # near pi
    axis = rng.normal(size=(32, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    w = jnp.asarray(axis * (np.pi - 1e-4), jnp.float32)
    R = lie.so3_exp(w)
    R2 = lie.so3_exp(lie.so3_log(R))
    np.testing.assert_allclose(R, R2, atol=2e-3)


def test_se3_exp_log_roundtrip(rng):
    xi = random_xi(rng)
    g = lie.se3_exp(xi)
    xi2 = lie.se3_log(g)
    np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_se3_group_laws(rng):
    a = lie.se3_exp(random_xi(rng))
    b = lie.se3_exp(random_xi(rng))
    ab = lie.se3_compose(a, b)
    # (ab) b^-1 == a
    a2 = lie.se3_compose(ab, lie.se3_inverse(b))
    np.testing.assert_allclose(a.R, a2.R, atol=1e-5)
    np.testing.assert_allclose(a.t, a2.t, atol=1e-5)
    # between: a.between(b) == a^-1 b
    btw = lie.se3_between(a, b)
    np.testing.assert_allclose(
        lie.se3_compose(a, btw).t, b.t, atol=1e-5
    )


def test_se3_local_retract_inverse(rng):
    a = lie.se3_exp(random_xi(rng))
    xi = random_xi(rng, scale=0.3)
    b = lie.se3_retract(a, xi)
    np.testing.assert_allclose(lie.se3_local(a, b), xi, atol=1e-4)


def test_se3_apply_matches_matrix(rng):
    g = lie.se3_exp(random_xi(rng, n=8))
    pts = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    T = lie.se3_matrix(g)
    hom = jnp.concatenate([pts, jnp.ones((8, 1), jnp.float32)], axis=-1)
    expected = jnp.einsum("nij,nj->ni", T, hom)[:, :3]
    np.testing.assert_allclose(lie.se3_apply(g, pts), expected, atol=1e-5)


def test_se3_adjoint_identity(rng):
    """Ad_g xi == Log(g Exp(xi) g^-1)."""
    g = lie.se3_exp(random_xi(rng, n=16, scale=0.5))
    xi = random_xi(rng, n=16, scale=0.05)
    lhs = jnp.einsum("nij,nj->ni", lie.se3_adjoint(g), xi)
    rhs = lie.se3_log(
        lie.se3_compose(lie.se3_compose(g, lie.se3_exp(xi)), lie.se3_inverse(g))
    )
    np.testing.assert_allclose(lhs, rhs, atol=2e-3)


def test_left_jacobian_inverse(rng):
    w = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    V = lie.so3_left_jacobian(w)
    Vinv = lie.so3_left_jacobian_inv(w)
    np.testing.assert_allclose(
        V @ Vinv, np.tile(np.eye(3), (64, 1, 1)), atol=1e-4
    )


def test_grad_through_log(rng):
    """log must be differentiable (incl. near identity)."""
    def f(xi):
        return jnp.sum(lie.se3_log(lie.se3_exp(xi)) ** 2)

    xi = random_xi(rng, n=4, scale=0.2)
    g = jax.grad(lambda x: f(x))(xi)
    assert np.all(np.isfinite(g))
    np.testing.assert_allclose(g, 2 * xi, atol=1e-3)


def test_jit_vmap_compat(rng):
    xi = random_xi(rng, n=32)
    f = jax.jit(jax.vmap(lambda x: lie.se3_log(lie.se3_exp(x))))
    np.testing.assert_allclose(f(xi), xi, atol=1e-4)


def test_grad_nan_free_at_identity():
    """Regression: Log-based residuals at exactly zero (identity between
    poses) must have finite gradients — this previously NaN-poisoned the
    whole backend linearization."""
    def f(xi):
        a = lie.se3_exp(xi)
        return jnp.sum(lie.se3_local(a, a) ** 2) + jnp.sum(
            lie.se3_log(lie.se3_exp(xi * 0.0)) ** 2
        )

    g = jax.grad(f)(jnp.zeros(6, jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))

    # jacobian of between at identical poses
    J = jax.jacfwd(
        lambda xi: lie.se3_local(lie.se3_exp(xi), lie.se3_identity())
    )(jnp.zeros(6, jnp.float32))
    assert np.all(np.isfinite(np.asarray(J)))
