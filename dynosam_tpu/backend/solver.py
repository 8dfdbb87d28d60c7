"""Matrix-free Levenberg-Marquardt over manifold pytrees.

This replaces the reference's `gtsam::LevenbergMarquardtOptimizer`
(`src/backend/RGBDBackendModule.cc:201-234`) with a TPU-native design:

* Variables live in a pytree whose leaves are either :class:`SE3` batches
  (retracted on the manifold with 6-dof tangents, gtsam Pose3 convention) or
  plain point arrays (vector addition).
* Residuals are evaluated as a *list of dense masked families* — each family
  is one factor type over a (frame x slot) grid — so the whole graph
  evaluates as a handful of fused batched kernels instead of per-factor
  virtual calls.
* The normal equations ``(J^T W J + lam D) dx = -J^T W r`` are solved by
  preconditioned conjugate gradients with **matrix-free** products:
  ``J v`` via `jax.linearize` (JVP) and ``J^T u`` via `jax.linear_transpose`
  (VJP).  No Jacobian or Hessian is ever materialized — every product is a
  batch of small einsums that XLA fuses and tiles onto the MXU.
* Robust (Huber) weights are frozen at each linearization point (IRLS),
  matching gtsam's m-estimator reweighting.

The whole LM loop is a `lax.while_loop`, so an entire optimization — any
number of outer iterations, each with an inner CG solve — is ONE XLA
computation with zero host round-trips.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.flatten_util
import jax.numpy as jnp

from ..core.lie import SE3, se3_retract
from ..ops.robust import robust_sqrt_weights

# --------------------------------------------------------------------------
# Manifold pytree helpers
# --------------------------------------------------------------------------


def _is_se3(x) -> bool:
    return isinstance(x, SE3)


def zero_delta(values):
    """Tangent pytree of zeros mirroring `values` (SE3 -> (...,6))."""
    def make(v):
        if _is_se3(v):
            return jnp.zeros((*v.batch_shape, 6), v.dtype)
        return jnp.zeros_like(v)

    return jax.tree.map(make, values, is_leaf=_is_se3)


def retract_tree(values, delta):
    """Apply tangent pytree: SE3 leaves retract, arrays add."""
    def r(v, d):
        if _is_se3(v):
            return se3_retract(v, d)
        return v + d

    return jax.tree.map(r, values, delta, is_leaf=_is_se3)


def tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def tree_sub(a, b):
    return jax.tree.map(jnp.subtract, a, b)


def tree_scale(a, s):
    return jax.tree.map(lambda x: x * s, a)


def tree_mul(a, b):
    return jax.tree.map(jnp.multiply, a, b)


def tree_dot(a, b):
    leaves = jax.tree.leaves(jax.tree.map(lambda x, y: jnp.sum(x * y), a, b))
    return functools.reduce(jnp.add, leaves)


# --------------------------------------------------------------------------
# Residual families
# --------------------------------------------------------------------------


class RobustSpec(NamedTuple):
    """Robust kernel spec for one residual family."""

    kind: str = "none"   # none | huber | tukey | cauchy
    k: float = 1.0


def robust_loss(r: jax.Array, spec: RobustSpec) -> jax.Array:
    """rho(|r|) per factor block (...,): the quantity gtsam sums as `error`."""
    sq = jnp.sum(r * r, axis=-1)
    if spec.kind == "none":
        return 0.5 * sq
    norm = jnp.sqrt(jnp.maximum(sq, 1e-30))
    if spec.kind == "huber":
        k = spec.k
        return jnp.where(norm <= k, 0.5 * sq, k * norm - 0.5 * k * k)
    if spec.kind == "cauchy":
        k2 = spec.k * spec.k
        return 0.5 * k2 * jnp.log1p(sq / k2)
    if spec.kind == "tukey":
        c2 = spec.k * spec.k
        inside = (c2 / 6.0) * (1.0 - (1.0 - sq / c2) ** 3)
        return jnp.where(norm <= spec.k, inside, c2 / 6.0)
    raise ValueError(spec.kind)


def total_error(residuals: Sequence[jax.Array], specs: Sequence[RobustSpec]):
    """Sum of robust losses over all families (gtsam `graph.error(theta)`)."""
    return functools.reduce(
        jnp.add, [jnp.sum(robust_loss(r, s)) for r, s in zip(residuals, specs)]
    )


# --------------------------------------------------------------------------
# PCG
# --------------------------------------------------------------------------


def pcg(A_mv, b, M_inv_mv, x0, max_iters: int, tol: float):
    """Preconditioned CG on pytrees.  Returns (x, n_iters, final_rnorm2)."""
    r0 = tree_sub(b, A_mv(x0))
    z0 = M_inv_mv(r0)
    gamma0 = tree_dot(r0, z0)
    bnorm2 = tree_dot(b, b)
    threshold = tol * tol * jnp.maximum(bnorm2, 1e-30)

    def cond(state):
        _, r, _, _, gamma, i = state
        return (i < max_iters) & (tree_dot(r, r) > threshold) & (gamma > 0)

    def body(state):
        x, r, z, p, gamma, i = state
        Ap = A_mv(p)
        pAp = tree_dot(p, Ap)
        alpha = gamma / jnp.maximum(pAp, 1e-30)
        x = tree_add(x, tree_scale(p, alpha))
        r = tree_sub(r, tree_scale(Ap, alpha))
        z = M_inv_mv(r)
        gamma_new = tree_dot(r, z)
        beta = gamma_new / jnp.maximum(gamma, 1e-30)
        p = tree_add(z, tree_scale(p, beta))
        return (x, r, z, p, gamma_new, i + 1)

    x, r, _, _, _, iters = jax.lax.while_loop(
        cond, body, (x0, r0, z0, z0, gamma0, jnp.asarray(0, jnp.int32))
    )
    return x, iters, tree_dot(r, r)


def hutchinson_diag(A_mv, template, key, n_samples: int = 8):
    """Stochastic estimate of diag(A): E[z * Az] with Rademacher z."""
    leaves, treedef = jax.tree.flatten(template)
    keys = jax.random.split(key, n_samples)

    def one(k):
        ks = jax.random.split(k, len(leaves))
        z = jax.tree.unflatten(
            treedef,
            [
                jax.random.rademacher(ki, l.shape, dtype=l.dtype)
                for ki, l in zip(ks, leaves)
            ],
        )
        return tree_mul(z, A_mv(z))

    acc = one(keys[0])
    for k in keys[1:]:
        acc = tree_add(acc, one(k))
    return tree_scale(acc, 1.0 / n_samples)


# --------------------------------------------------------------------------
# Levenberg-Marquardt
# --------------------------------------------------------------------------


class LMConfig(NamedTuple):
    max_iterations: int = 30
    initial_lambda: float = 1e-5
    lambda_factor: float = 10.0
    max_lambda: float = 1e7
    min_lambda: float = 1e-10
    rel_error_tol: float = 1e-5
    abs_error_tol: float = 1e-5
    cg_max_iterations: int = 200
    cg_tol: float = 1e-6
    diag_floor: float = 1e-6


class LMResult(NamedTuple):
    values: object
    error: jax.Array
    initial_error: jax.Array
    iterations: jax.Array
    lam: jax.Array
    converged: jax.Array


def lm_optimize(
    residual_fn: Callable,
    specs: Sequence[RobustSpec],
    values,
    cfg: LMConfig,
    gn_diag_fn: Optional[Callable] = None,
    seed: int = 0,
) -> LMResult:
    """Minimize  sum_f rho_f(||r_f(x)||)  over the manifold pytree `values`.

    residual_fn(values) -> list of (..., D) whitened, mask-zeroed residual
    arrays, one per family in `specs`.  gn_diag_fn(values, sqrt_weights) may
    return an exact diag(J^T W J) tangent pytree; otherwise a Hutchinson
    estimate is used for damping/preconditioning.
    """
    specs = tuple(specs)
    base_key = jax.random.PRNGKey(seed)

    def linearize_at(vals):
        res0 = residual_fn(vals)
        sqrt_w = [
            robust_sqrt_weights(r, s.k, s.kind) if s.kind != "none"
            else jnp.ones(r.shape[:-1], r.dtype)
            for r, s in zip(res0, specs)
        ]

        def f(delta):
            rs = residual_fn(retract_tree(vals, delta))
            return [w[..., None] * r for w, r in zip(sqrt_w, rs)]

        d0 = zero_delta(vals)
        wr0, jvp = jax.linearize(f, d0)
        vjp = jax.linear_transpose(jvp, d0)

        def JtJ_mv(d):
            return vjp(jvp(d))[0]

        # gradient g = J^T W r0
        g = vjp(wr0)[0]
        return res0, sqrt_w, JtJ_mv, g, d0

    # Initial error
    res_init = residual_fn(values)
    err_init = total_error(res_init, specs)

    def cond(state):
        vals, lam, err, prev_err, it, done = state
        return (it < cfg.max_iterations) & (~done)

    def body(state):
        vals, lam, err, prev_err, it, done = state
        res0, sqrt_w, JtJ_mv, g, d0 = linearize_at(vals)

        if gn_diag_fn is not None:
            diag = gn_diag_fn(vals, sqrt_w)
        else:
            key = jax.random.fold_in(base_key, it)
            diag = hutchinson_diag(JtJ_mv, d0, key)
        diag = jax.tree.map(
            lambda x: jnp.maximum(jnp.abs(x), cfg.diag_floor), diag
        )

        def A_mv(d):
            return tree_add(JtJ_mv(d), tree_scale(tree_mul(diag, d), lam))

        def M_inv_mv(r):
            return jax.tree.map(
                lambda ri, di: ri / (di * (1.0 + lam)), r, diag
            )

        b = tree_scale(g, -1.0)
        delta, cg_iters, _ = pcg(
            A_mv, b, M_inv_mv, d0, cfg.cg_max_iterations, cfg.cg_tol
        )

        new_vals = retract_tree(vals, delta)
        new_err = total_error(residual_fn(new_vals), specs)
        accept = new_err < err

        vals_out = jax.tree.map(
            lambda a, b_: jnp.where(accept, a, b_),
            new_vals,
            vals,
        )
        err_out = jnp.where(accept, new_err, err)
        lam_out = jnp.where(
            accept,
            jnp.maximum(lam / cfg.lambda_factor, cfg.min_lambda),
            jnp.minimum(lam * cfg.lambda_factor, cfg.max_lambda),
        )
        # gtsam-style convergence: absolute or relative error decrease small.
        rel_ok = jnp.abs(err - err_out) < cfg.rel_error_tol * jnp.maximum(err, 1e-30)
        abs_ok = jnp.abs(err - err_out) < cfg.abs_error_tol
        done_out = (accept & (rel_ok | abs_ok)) | (lam_out >= cfg.max_lambda)
        return (vals_out, lam_out, err_out, err, it + 1, done_out)

    lam0 = jnp.asarray(cfg.initial_lambda, jnp.float32)
    state = (
        values,
        lam0,
        err_init,
        err_init,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    vals, lam, err, _, iters, done = jax.lax.while_loop(cond, body, state)
    return LMResult(
        values=vals,
        error=err,
        initial_error=err_init,
        iterations=iters,
        lam=lam,
        converged=done,
    )


# --------------------------------------------------------------------------
# Dense reference solver (tests / tiny problems)
# --------------------------------------------------------------------------


def dense_normal_solve(residual_fn, specs, values, lam: float = 0.0):
    """Materialize J with jacfwd, solve one damped GN step densely.

    Used by tests to cross-check the matrix-free path; O(n^2) memory.
    """
    res0 = residual_fn(values)
    sqrt_w = [
        robust_sqrt_weights(r, s.k, s.kind) if s.kind != "none"
        else jnp.ones(r.shape[:-1], r.dtype)
        for r, s in zip(res0, specs)
    ]

    def f_flat(dflat, unravel):
        delta = unravel(dflat)
        rs = residual_fn(retract_tree(values, delta))
        rows = [
            (w[..., None] * r).reshape(-1) for w, r in zip(sqrt_w, rs)
        ]
        return jnp.concatenate(rows)

    d0 = zero_delta(values)
    dflat0, unravel = jax.flatten_util.ravel_pytree(d0)
    J = jax.jacfwd(lambda d: f_flat(d, unravel))(dflat0)
    r = f_flat(dflat0, unravel)
    A = J.T @ J
    A = A + lam * jnp.diag(jnp.maximum(jnp.diag(A), 1e-6))
    g = J.T @ r
    dx = jnp.linalg.solve(A + 1e-10 * jnp.eye(A.shape[0], dtype=A.dtype), -g)
    return retract_tree(values, unravel(dx)), J


# NOTE on LM retry cost: on a rejected step the next while_loop iteration
# re-evaluates residuals/diag at the unchanged linearization point before
# re-solving with the larger lambda.  The runtime waste is one residual
# evaluation + one diag build per rejection (the CG solve dominates), so we
# keep the simpler single-phase loop rather than carrying linearization
# products through the carry.
