"""Robust loss weighting (IRLS) for the nonlinear solvers.

Matches gtsam's m-estimator semantics used by the reference backend
(`RGBDBackendModule` builds Huber(k) robust noise models; the frontend
refiners use Huber(k=0.5/0.0001) — `MotionSolver-inl.hpp`).  Weights are
computed on the *whitened* residual norm and applied as sqrt-weights onto
whitened residuals, exactly the reweighting gtsam performs per iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def huber_weight(r_norm: jax.Array, k: float) -> jax.Array:
    """gtsam Huber: w = 1 if |r|<=k else k/|r| (weight on squared error)."""
    safe = jnp.maximum(r_norm, 1e-30)
    return jnp.where(r_norm <= k, 1.0, k / safe)


def tukey_weight(r_norm: jax.Array, c: float) -> jax.Array:
    x = r_norm / c
    w = jnp.square(1.0 - jnp.square(x))
    return jnp.where(r_norm <= c, w, 0.0)


def cauchy_weight(r_norm: jax.Array, k: float) -> jax.Array:
    return 1.0 / (1.0 + jnp.square(r_norm / k))


def whiten(residual: jax.Array, sigma) -> jax.Array:
    """Isotropic whitening: r / sigma (last axis is the residual dim)."""
    return residual / sigma


def robust_sqrt_weights(
    residual_whitened: jax.Array, k: float, kind: str = "huber"
) -> jax.Array:
    """Per-factor sqrt(weight) from the whitened residual block norm.

    residual_whitened: (..., D).  Returns (...,) sqrt-weights; multiply onto
    the whitened residual rows before forming normal equations.
    """
    norm = jnp.linalg.norm(residual_whitened, axis=-1)
    if kind == "huber":
        w = huber_weight(norm, k)
    elif kind == "tukey":
        w = tukey_weight(norm, k)
    elif kind == "cauchy":
        w = cauchy_weight(norm, k)
    elif kind == "none":
        w = jnp.ones_like(norm)
    else:
        raise ValueError(f"unknown robust kind {kind}")
    return jnp.sqrt(w)
