"""Variable-projection (Schur-eliminated) WorldMotion formulation.

The SURVEY §7 "Schur complement reduction of landmark blocks": instead of
carrying every 3D landmark through the CG solve, landmarks are eliminated
in *closed form* given the poses/motions, and the outer LM optimizes only
{X_k, H_k^j} — for a 10-frame window this shrinks the CG space from
~16k dims to a few hundred, with matching conditioning gains.

  * Static points couple only camera poses through `e = X_k^-1 p - z`;
    since rotations are orthonormal, the per-point normal matrix is
    (sum_k w_k) I and the optimum is the weighted mean of the per-frame
    world back-projections.
  * Dynamic points form chains along frames through the ternary motion
    factor `e = m_{k-1} - H_k^-1 m_k`; per tracklet the normal system is
    block-tridiagonal with scalar-diagonal blocks and rotation off-diagonal
    blocks.  We solve all ND chains simultaneously with a vmapped
    block-Thomas elimination (`lax.scan` over the frame axis — the TPU
    shape of gtsam's elimination ordering).

Gradients of the outer reduced problem flow through the closed forms by
AD (true variable projection).  Robust (Huber) weighting applies to the
outer residuals; the inner elimination is least-squares (the frontend has
already rejected gross outliers).

STATUS: the elimination primitives are exact (unit-tested against ground
truth); the end-to-end reduced LM (`use_varpro=True`) is experimental and
default-OFF: from an identity-H init the eliminated points zero the
informative ternary residuals and the Huber-crushed observation gradients
converge slowly, and differentiating through the scan-based tridiagonal
solve makes CG products expensive.  The direct reduced-system solver this
pointed at now exists as `backend/schur.py` (explicit landmark elimination
per LM iteration + dense Cholesky over {X, H}) and is the default window
solver; this module remains as the closed-form elimination primitives and
the experimental true-VarPro outer problem.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.lie import SE3, se3_apply
from ..ops import factors
from ..utils.config import BackendConfig
from .formulation import FamilySpec, WindowMasks, world_motion_families
from .map import WindowData


def optimal_static_points(X: SE3, w: WindowData, masks: WindowMasks):
    """sp*_i = weighted mean over frames of X_k(z_{k,i})  (NS, 3)."""
    world = jax.vmap(se3_apply)(X, w.static_xyz)            # (W, NS, 3)
    wgt = masks.static_obs.astype(world.dtype)              # (W, NS)
    num = jnp.einsum("kn,knd->nd", wgt, world)
    den = jnp.maximum(jnp.einsum("kn->n", wgt), 1e-9)
    return num / den[:, None]


def _chain_blocks(X: SE3, H_all: SE3, w: WindowData, masks: WindowMasks,
                  cfg: BackendConfig):
    """Per-tracklet block-tridiagonal normal system.

    Returns (A (W, ND, 3, 3), B (W, ND, 3, 3), rhs (W, ND, 3)) where B[k]
    couples (m_{k-1}, m_k) (B[0] unused).
    """
    dtype = w.dyn_xyz.dtype
    W_, ND = masks.dyn_obs.shape
    a = masks.dyn_obs.astype(dtype) / cfg.dynamic_point_noise_sigma**2
    # f32 guard: the true ternary weight (sigma 1e-5 -> 1e10) swamps the
    # observation weight and makes the chain system numerically singular
    # in f32.  Cap the ratio at 1e3 — the chain is still effectively rigid
    # (elimination error << point noise) while the obs terms keep anchoring
    # the gauge.  The OUTER residuals use the true sigmas; LM only accepts
    # true-cost-decreasing steps, so the approximation cannot diverge.
    b_true = 1.0 / cfg.motion_ternary_factor_noise_sigma**2
    b_cap = 1e3 / cfg.dynamic_point_noise_sigma**2
    b_val = jnp.minimum(b_true, b_cap).astype(dtype)
    b = jnp.concatenate(
        [jnp.zeros((1, ND), dtype), masks.ternary[1:].astype(dtype)], axis=0
    ) * b_val                                                # (W, ND)

    eye = jnp.eye(3, dtype=dtype)
    # obs: e = R_k^T (m - t_k) - z  => J = R_k^T, JtJ = I, Jt r0 ...
    # normal contribution: a_k I ; rhs_obs = a_k * (X_k z in world)
    world_obs = jax.vmap(se3_apply)(X, w.dyn_xyz)           # (W, ND, 3)
    rhs = a[..., None] * world_obs

    # ternary k: e = m_{k-1} - S_k^T m_k + S_k^T t_k, S = R_H; J_{m_{k-1}}=I,
    # J_{m_k} = -S_k^T; constant c_k = S_k^T t_k
    S = H_all.R                                             # (W, ND, 3, 3)
    St = jnp.swapaxes(S, -1, -2)
    c = jnp.einsum("knij,knj->kni", St, H_all.t)            # S^T t (W, ND, 3)

    A = a[..., None, None] * eye
    A = A + b[..., None, None] * eye                        # from e_k wrt m_k: S S^T = I
    b_next = jnp.concatenate([b[1:], jnp.zeros((1, ND), dtype)], axis=0)
    A = A + b_next[..., None, None] * eye                   # from e_{k+1} wrt m_k
    # rhs from ternary constants: factor e_k = [I, -S^T][m_{k-1}; m_k] + c_k
    # normal rhs -= J^T c:  m_{k-1} slot: -c_k * b_k ; m_k slot: +S_k c_k * b_k
    rhs = rhs.at[:-1].add(-(b[1:, :, None] * c[1:]))
    rhs = rhs + b[..., None] * jnp.einsum("knij,knj->kni", S, c)
    # off-diagonal block (m_{k-1}, m_k): -b_k S_k^T
    B = -(b[..., None, None] * St)

    # regularize fully-unobserved slots so the solve stays SPD
    A = A + 1e-8 * eye
    return A, B, rhs


def optimal_dynamic_points(
    X: SE3, H_all: SE3, w: WindowData, masks: WindowMasks, cfg: BackendConfig
):
    """Solve all per-tracklet chains: returns dp* (W, ND, 3).

    Block-Thomas: forward elimination over frames (scan), back substitution
    (reverse scan); every step is a batch of ND 3x3 solves.
    """
    A, B, rhs = _chain_blocks(X, H_all, w, masks, cfg)

    def fwd(carry, inp):
        D_prev, y_prev = carry                         # (ND,3,3), (ND,3)
        A_k, B_k, r_k = inp
        # Schur update: D_k = A_k - B_k^T D_{k-1}^-1 B_k ; y similarly
        sol_B = jnp.linalg.solve(D_prev, B_k)          # D^-1 B
        sol_y = jnp.linalg.solve(
            D_prev, y_prev[..., None]
        )[..., 0]
        Bt = jnp.swapaxes(B_k, -1, -2)
        D_k = A_k - Bt @ sol_B
        y_k = r_k - jnp.einsum("nij,nj->ni", Bt, sol_y)
        return (D_k, y_k), (D_k, y_k, B_k)

    ND = A.shape[1]
    eye = jnp.eye(3, dtype=A.dtype)
    init = (jnp.broadcast_to(eye, (ND, 3, 3)) * 1e12, jnp.zeros((ND, 3), A.dtype))
    (_, _), (D_all, y_all, B_all) = jax.lax.scan(fwd, init, (A, B, rhs))

    def bwd(m_next, inp):
        D_k, y_k, B_next = inp                         # B_next couples (k, k+1)
        rhs_k = y_k - jnp.einsum("nij,nj->ni", B_next, m_next)
        m_k = jnp.linalg.solve(D_k, rhs_k[..., None])[..., 0]
        return m_k, m_k

    B_shift = jnp.concatenate([B_all[1:], jnp.zeros_like(B_all[:1])], axis=0)
    m_last_init = jnp.zeros((ND, 3), A.dtype)
    _, dp_rev = jax.lax.scan(
        bwd, m_last_init, (D_all, y_all, B_shift), reverse=True
    )
    return dp_rev


def world_motion_varpro_residuals(
    values: dict, w: WindowData, masks: WindowMasks, cfg: BackendConfig,
    anchor: SE3 | None = None,
):
    """Reduced residuals over {X, H} with landmarks eliminated in-line."""
    from .formulation import world_motion_residuals

    X: SE3 = values["X"]
    H: SE3 = values["H"]
    # select per-(frame, tracklet) motions via one-hot einsum (dense VJP;
    # take_along_axis's VJP is a serialized TPU scatter)
    no_ = H.batch_shape[1]
    onehot_obj = jax.nn.one_hot(
        jnp.where(masks.ternary | masks.dyn_obs, w.dyn_obj, -1), no_,
        dtype=H.t.dtype,
    )
    eye3 = jnp.eye(3, dtype=H.t.dtype)
    H_all = SE3(
        jnp.einsum("wno,woij->wnij", onehot_obj, H.R, precision="highest"),
        jnp.einsum("wno,woj->wnj", onehot_obj, H.t, precision="highest"),
    )
    sel = jnp.any(onehot_obj > 0, axis=-1)[..., None, None]
    H_all = SE3(jnp.where(sel, H_all.R, eye3), H_all.t)
    sp = optimal_static_points(X, w, masks)
    dp = optimal_dynamic_points(X, H_all, w, masks, cfg)
    full = {"X": X, "H": H, "sp": sp, "dp": dp}
    return world_motion_residuals(full, w, masks, cfg, anchor)


def varpro_gn_diag(values: dict, sqrt_w: list, w: WindowData,
                   masks: WindowMasks, cfg: BackendConfig) -> dict:
    """Jacobi diagonal for the reduced {X, H} problem.

    Uses the full-problem analytic diagonals for the pose/motion blocks —
    with elimination the true reduced diagonal is smaller (Schur subtracts
    positive terms), so this over-damps slightly; safe for LM + precond.
    """
    from .formulation import world_motion_gn_diag

    obj_idx = jnp.clip(w.dyn_obj, 0, values["H"].batch_shape[1] - 1)
    H_all = SE3(
        jnp.take_along_axis(values["H"].R, obj_idx[..., None, None], axis=1),
        jnp.take_along_axis(values["H"].t, obj_idx[..., None], axis=1),
    )
    sp = optimal_static_points(values["X"], w, masks)
    dp = optimal_dynamic_points(values["X"], H_all, w, masks, cfg)
    full_vals = {"X": values["X"], "H": values["H"], "sp": sp, "dp": dp}
    d = world_motion_gn_diag(full_vals, sqrt_w, w, masks, cfg)
    return {"X": d["X"], "H": d["H"]}
