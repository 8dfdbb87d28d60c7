"""Direct block-eliminated LM for "N small blocks + one global" problems.

The frontend's two refinement optimizers (`frontend/refine.py`, replacing
the reference's `OpticalFlowAndPoseOptimizer` / `MotionOnlyRefinementOptimizer`,
`frontend/vision/MotionSolver-inl.hpp:89-491`) have the classic bundle
structure: every residual couples ONE per-track variable block (flow (2,)
or a landmark pair (6,)) with ONE small global variable (a pose / motion,
6-dof).  gtsam solves these directly (sparse elimination); the round-1 port
ran them through the matrix-free LM-PCG engine (`solver.lm_optimize`),
whose 60 *sequential* CG iterations per LM step dominate frontend latency
on TPU (each CG step is a jvp+vjp round trip of the whole residual).

This module solves the damped normal equations EXACTLY per LM iteration by
per-track block elimination — the same reduced-Schur idea as
`backend/schur.py`, specialized to blocks with no inter-track coupling:

    [ diag(U_i)   W_i ] [db_i]   [gb_i]         U_i: (b, b)  per track
    [  W_i^T       V  ] [ dg ] = [ gg ]         V:   (g, g)  global

    S  = V - sum_i W_i^T U_i^{-1} W_i            (g <= 12: tiny, replicated)
    dg = S^{-1} (gg - sum_i W_i^T U_i^{-1} gb_i)
    db_i = U_i^{-1} (gb_i - W_i dg)

Everything is batched einsums over the track axis (MXU-friendly) plus one
g x g Cholesky; the sequential depth per LM iteration drops from 60 CG
steps to 1.  Jacobian blocks come from `jax.linearize` probed with the
b + g tangent basis directions — a residual JVP perturbing ALL tracks in
the same basis direction yields that column of every per-track block at
once (residual i depends only on block i), so the full Jacobian costs
b + g batched JVPs, all vmapped into one program.

Per-track inverses use closed-form adjugates (batched LU `linalg.inv` is
serialization-bound on TPU — see `schur._inv3`); 6x6 blocks go through a
3x3 block-Schur of adjugates.

All contractions here are TINY (block dims b <= 6, global dim g <= 12,
residual dim D <= 7): they run as broadcast multiply+reduce on the VPU in
exact f32, NOT as einsums — a K<=7 dot_general occupies the 128-deep MXU
at ~5% utilization and the HIGHEST-precision rule sextuples it with 6
bf16 passes (see `core/lie.py`'s header note; the refiner while loops are
iteration-latency-bound, so per-op fixed costs dominate).  The g x g
Schur solve likewise uses the closed-form `ops.linalg.inv_spd` instead of
`cho_factor` — under `vmap` (the per-object refiners) a batched Cholesky
is a serialized LAPACK-style TPU kernel.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.flatten_util
import jax.numpy as jnp

from ..ops.linalg import inv_spd as _inv_spd
from ..ops.linalg import inv_spd_lanes as _inv_spd_lanes
from ..ops.robust import robust_sqrt_weights
from .solver import (
    LMConfig,
    LMResult,
    RobustSpec,
    retract_tree,
    total_error,
    zero_delta,
)

# Broadcast mul+reduce forms of the solver's contractions (VPU, exact f32;
# see module docstring).  Per-track quantities are kept LANE-MAJOR (the
# track axis N minor): the tiny b x b / b x g block minors tile at ~b/128
# lane utilization and force XLA to interleave relayout copies, while
# (..., b, c, N) keeps every op at full 128-lane occupancy (the frontend
# motion-only refiner's LM iteration measured ~950us/iter block-major vs
# ~60us for the equivalently-sized flow+pose problem — BENCH_NOTES
# session 5).  Shapes use negative axes so the same code traces unbatched
# (ego refiner) and under vmap (per-object refiners).


def _gram_lanes(A, B):
    """(..., D, b, N) x (..., D, c, N) -> (..., b, c, N)."""
    return jnp.sum(A[..., :, :, None, :] * B[..., :, None, :, :], axis=-4)


def _mv(A, x):
    """einsum("...bc,...c->...b")."""
    return jnp.sum(A * x[..., None, :], axis=-1)


def lm_optimize_eliminated(
    residual_fn: Callable,
    specs: Sequence[RobustSpec],
    values: dict,
    cfg: LMConfig,
    block_keys: Sequence[str],
    glob_keys: Sequence[str],
    jacobian_fn: Callable | None = None,
) -> LMResult:
    """Drop-in for `solver.lm_optimize` on block-plus-global problems.

    `values[k]` for k in `block_keys` must be plain arrays of shape
    (N, d_k) (vector retraction); `values[k]` for k in `glob_keys` may be
    any manifold leaves (SE3 retracts).  Every residual row i may depend
    only on track i's blocks and the globals.  Identical outer LM loop to
    `lm_optimize` / `schur.lm_optimize_schur` (IRLS weights frozen per
    linearization, accept/reject on the true robust cost, linearization
    cached across rejected steps, NaN-step rejection).

    `jacobian_fn(values) -> (B_list, G_list)` optionally supplies analytic
    Jacobians of `residual_fn`'s outputs (UNwhitened, but with the same
    masks/sigmas the residuals bake in): B_list[r] of shape (N, d_r, b)
    w.r.t. the concatenated block tangent (block_keys order) and G_list[r]
    of shape (N, d_r, g) w.r.t. the raveled global tangent.  Without it
    the Jacobians come from `jax.linearize` probed with the b + g tangent
    basis — b + g extra residual sweeps per linearization that dominate
    the frontend refiners' TPU latency.
    """
    specs = tuple(specs)
    block_keys = tuple(block_keys)
    glob_keys = tuple(glob_keys)
    blocks0 = {k: values[k] for k in block_keys}
    glob0 = {k: values[k] for k in glob_keys}
    n = next(iter(blocks0.values())).shape[0]
    dims = [blocks0[k].shape[-1] for k in block_keys]
    b = sum(dims)
    dg0_tree = zero_delta(glob0)
    dg_flat0, unravel_g = jax.flatten_util.ravel_pytree(dg0_tree)
    g = dg_flat0.shape[0]
    dtype = dg_flat0.dtype

    def split_db(db):
        out, o = {}, 0
        for k, d in zip(block_keys, dims):
            out[k] = db[:, o:o + d]
            o += d
        return out

    def res_of(blocks, glob):
        return residual_fn({**blocks, **glob})

    def linearize(blocks, glob, res0):
        # res0 = residual_fn at (blocks, glob), carried by the LM loop so an
        # accepted step's trial sweep doubles as the next linearization's
        # residual evaluation (1 sweep per iteration instead of 2)
        sqrt_w = [
            robust_sqrt_weights(r, s.k, s.kind) if s.kind != "none"
            else jnp.ones(r.shape[:-1], r.dtype)
            for r, s in zip(res0, specs)
        ]

        if jacobian_fn is not None:
            # analytic path: one residual sweep + closed-form blocks
            B_list, G_list = jacobian_fn({**blocks, **glob})
            wr0 = jnp.concatenate(
                [w[..., None] * r for w, r in zip(sqrt_w, res0)], axis=-1
            )
            B = jnp.concatenate(
                [w[..., None, None] * jb
                 for w, jb in zip(sqrt_w, B_list)], axis=1
            )                                            # (N, D, b)
            G = jnp.concatenate(
                [w[..., None, None] * jg
                 for w, jg in zip(sqrt_w, G_list)], axis=1
            )                                            # (N, D, g)
        else:
            def f(db, dgf):
                nb = {k: blocks[k] + v for k, v in split_db(db).items()}
                ng = retract_tree(glob, unravel_g(dgf))
                rs = res_of(nb, ng)
                return jnp.concatenate(
                    [w[..., None] * r for w, r in zip(sqrt_w, rs)], axis=-1
                )

            wr0, jvp = jax.linearize(
                f, jnp.zeros((n, b), dtype), jnp.zeros((g,), dtype)
            )
            # Jacobian columns by basis probing: one JVP per tangent
            # direction, vmapped into a single batched program (see module
            # docstring).
            zb = jnp.zeros((n, b), dtype)
            zg = jnp.zeros((g,), dtype)
            Bc = jax.vmap(
                lambda e: jvp(jnp.broadcast_to(e, (n, b)), zg)
            )(jnp.eye(b, dtype=dtype))                   # (b, N, D)
            Gc = jax.vmap(lambda e: jvp(zb, e))(jnp.eye(g, dtype=dtype))
            B = jnp.transpose(Bc, (1, 2, 0))             # (N, D, b)
            G = jnp.transpose(Gc, (1, 2, 0))             # (N, D, g)
        # -> lane-major: track axis minor for every per-track quantity
        Bl = jnp.moveaxis(B, -3, -1)                     # (..., D, b, N)
        Gl = jnp.moveaxis(G, -3, -1)                     # (..., D, g, N)
        wl = jnp.moveaxis(wr0, -2, -1)                   # (..., D, N)
        U = _gram_lanes(Bl, Bl)                          # (..., b, b, N)
        Wm = _gram_lanes(Bl, Gl)                         # (..., b, g, N)
        V = jnp.sum(
            Gl[..., :, :, None, :] * Gl[..., :, None, :, :], axis=(-4, -1)
        )                                                # (..., g, g)
        gb = jnp.sum(Bl * wl[..., :, None, :], axis=-3)  # (..., b, N)
        gg = jnp.sum(Gl * wl[..., :, None, :], axis=(-3, -1))
        return U, Wm, V, gb, gg

    def step(lin, lam, floor):
        U, Wm, V, gb, gg = lin
        # absolute epsilon keeps fully-masked (all-zero) track blocks
        # invertible without NaN adjugates; 1e-8 is far below any active
        # block's whitened curvature
        du = jnp.einsum("...iin->...in", U)              # (..., b, N)
        U_d = U + (
            lam * jnp.maximum(du, floor) + 1e-8
        )[..., :, None, :] * jnp.eye(b, dtype=U.dtype)[..., :, :, None]
        dv = jnp.diagonal(V)
        V_d = V + jnp.diag(lam * jnp.maximum(dv, floor) + 1e-8)
        Ui = _inv_spd_lanes(U_d)                         # (..., b, b, N)
        # WtUi[g, c, n] = sum_b Wm[b, g, n] Ui[b, c, n]
        WtUi = jnp.sum(
            Wm[..., :, :, None, :] * Ui[..., :, None, :, :], axis=-4
        )                                                # (..., g, b, N)
        # S[g, h] = V_d[g, h] - sum_{b, n} WtUi[g, b, n] Wm[b, h, n]
        S = V_d - jnp.sum(
            WtUi[..., :, :, None, :] * Wm[..., None, :, :, :],
            axis=(-3, -1),
        )
        rhs = gg - jnp.sum(WtUi * gb[..., None, :, :], axis=(-2, -1))
        dg = -_mv(_inv_spd(S), rhs)
        # t1[b, n] = gb[b, n] + sum_h Wm[b, h, n] dg[h]
        t1 = gb + jnp.sum(Wm * dg[..., None, :, None], axis=-2)
        dbl = -jnp.sum(Ui * t1[..., None, :, :], axis=-2)
        db = jnp.moveaxis(dbl, -1, -2)                   # (..., N, b)
        return db, dg

    res_init = res_of(blocks0, glob0)
    err_init = total_error(res_init, specs)
    lin0 = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(linearize, blocks0, glob0, res_init),
    )

    def cond(state):
        _, _, _, _, _, lam, err, it, done = state
        return (it < cfg.max_iterations) & (~done)

    def body(state):
        blocks, glob, res_c, lin_c, rebuild, lam, err, it, done = state
        lin = jax.lax.cond(
            rebuild, lambda: linearize(blocks, glob, res_c), lambda: lin_c
        )
        db, dg = step(lin, lam, cfg.diag_floor)
        new_blocks = {k: blocks[k] + v for k, v in split_db(db).items()}
        new_glob = retract_tree(glob, unravel_g(dg))
        new_res = res_of(new_blocks, new_glob)
        new_err = total_error(new_res, specs)
        new_err = jnp.where(jnp.isfinite(new_err), new_err, jnp.inf)
        accept = new_err < err

        sel = lambda a, b_: jnp.where(accept, a, b_)
        blocks_out = jax.tree.map(sel, new_blocks, blocks)
        glob_out = jax.tree.map(sel, new_glob, glob)
        res_out = [sel(a, b_) for a, b_ in zip(new_res, res_c)]
        err_out = jnp.where(accept, new_err, err)
        lam_out = jnp.where(
            accept,
            jnp.maximum(lam / cfg.lambda_factor, cfg.min_lambda),
            jnp.minimum(lam * cfg.lambda_factor, cfg.max_lambda),
        )
        rel_ok = jnp.abs(err - err_out) < cfg.rel_error_tol * jnp.maximum(
            err, 1e-30
        )
        abs_ok = jnp.abs(err - err_out) < cfg.abs_error_tol
        done_out = (accept & (rel_ok | abs_ok)) | (lam_out >= cfg.max_lambda)
        return (
            blocks_out, glob_out, res_out, lin, accept, lam_out, err_out,
            it + 1, done_out,
        )

    lam0 = jnp.asarray(cfg.initial_lambda, jnp.float32)
    state = (
        blocks0, glob0, list(res_init), lin0, jnp.asarray(True), lam0,
        err_init, jnp.asarray(0, jnp.int32), jnp.asarray(False),
    )
    blocks, glob, _, _, _, lam, err, iters, done = jax.lax.while_loop(
        cond, body, state
    )
    return LMResult(
        values={**blocks, **glob},
        error=err,
        initial_error=err_init,
        iterations=iters,
        lam=lam,
        converged=done,
    )
