"""Direct reduced (Schur-complement) solver for backend windows.

The round-1 matrix-free LM runs preconditioned CG over the FULL variable set
{X, H|L, sp, dp} (~16k dims for a 10-frame window at capacity).  This module
implements the classical bundle-adjustment alternative the reference gets
from gtsam's sparse elimination (`gtsam::LevenbergMarquardtOptimizer` with
COLAMD ordering, `src/backend/RGBDBackendModule.cc:201-234`): eliminate the
landmark blocks in closed form and solve the small dense reduced system over
the poses/motions only.  Both reference formulations are supported:

  * **WorldMotion** (updater 0, `src/backend/rgbd/WorldMotionEstimator.cc`)
    — reduced variables {X_k, H_k^j}.
  * **WorldPose** (updater 1, `src/backend/rgbd/WorldPoseEstimator.cc:84-286`)
    — reduced variables {X_k, L_k^j}; the LandmarkMotionPose factor couples
    each dynamic-point chain row to TWO object poses (L_{k-1}, L_k), and the
    LandmarkPoseSmoothing triplet adds bandwidth-2 pose-pose blocks.

TPU shape of the elimination (no sparse matrices, no orderings):

  * Per-factor Jacobian blocks of the POINT families (the large grids) are
    hand-derived closed forms — e.g. pose-to-point wrt the pose tangent is
    ``[hat(y) | -I]`` with ``y`` the point in the camera frame — consistent
    with the `se3_retract` right-perturbation used by the solver.  (They
    were verified against per-factor `jax.jacfwd`, which they replaced: the
    vmapped AD builds dominated compile time, BENCH_NOTES.)  Only the tiny
    pose-pose families (odometry / anchor / smoothing grids) keep `jacfwd`.
  * Static points have independent 3x3 normal blocks -> a batched 3x3 solve
    eliminates all NS of them at once.
  * Dynamic tracklets are block-tridiagonal chains along frames (pose-to-
    point on the diagonal, the motion factor coupling consecutive frames)
    -> one vmapped block-Thomas `lax.scan` with a multi-column RHS
    (all 6W camera + 6W motion coupling columns AND the gradient column)
    eliminates every chain simultaneously.
  * The reduced 6x6-block Hessian over {X_k (W), H_k^j / L_k^j (W x O)} — a
    few hundred dims — is assembled with dense masked einsums (object
    scatter by one-hot) and solved by ONE dense Cholesky on the MXU.
  * Landmark updates are recovered by back-substitution through the same
    chain solves.

Levenberg damping is applied to the FULL system diagonal before reduction
(damp-then-reduce == Schur complement of the damped system), so each LM
iteration is an exact damped Gauss-Newton step of the IRLS-weighted problem.
The normal system is CACHED across rejected LM steps: only lambda changes on
a rejection, so the expensive build is skipped until a step is accepted.

WorldMotion's dynamic elimination defaults to the STABLE (Woodbury) form
(`_SCHUR_STABLE`): the ~1e10-scale ternary normal blocks are never formed —
their f32 representation error alone (~1e3 absolute) exceeds the
observation-bounded motion marginal that survives the reduction, which made
the reduced system indefinite at lambda <= 1e-7 and NaN-rejected 4/10 LM
iterations (even an f64 solve of the f32-BUILT system NaNs; session 9).
The ternary factor stays in square-root form (st_* fields, ~1e5 scale) and
every reduced term is a product through the capacitance chain
M = I + A~ Klam^-1 A~^T — see `schur_step`'s stable branch for the
identities.  With it, all iterations accept and lambda rides to 1e-10.

All contractions run at `precision="highest"` — bf16-class accumulation in
the normal equations visibly corrupts the recovered rotations on TPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.lie import SE3, se3_compose, se3_inverse, se3_retract, so3_hat
from ..ops import factors
from ..ops.robust import robust_sqrt_weights
from ..utils.config import BackendConfig
from .formulation import (
    WindowMasks,
    world_motion_families,
    world_motion_residuals,
    world_pose_families,
    world_pose_residuals,
)
from .map import WindowData
from .solver import LMConfig, LMResult, retract_tree, total_error

_es = functools.partial(jnp.einsum, precision="highest")
_mm = functools.partial(jnp.matmul, precision="highest")

# lane-major chain solve default ON: TPU A/B (2026-08-19, window-10 with
# the coupling-dot assembly) measured 39.6 ms (lanes) vs 56.2 ms
# (block-major) per solve; DYNO_SCHUR_LANES=0 reverts
import os as _os

_CHAIN_LANES = _os.environ.get("DYNO_SCHUR_LANES", "1") == "1"

# ternary-structured scalar chain elimination (chain_solve_ternary) default
# ON: cancellation-free, cheaper than the generic block-Thomas, and removes
# the low-lambda NaN-rejected iterations at the root.
# DYNO_SCHUR_TERNARY=0 reverts to the generic lane-major solve.
_TERNARY_CHAIN = _os.environ.get("DYNO_SCHUR_TERNARY", "1") == "1"

# STABLE (Woodbury) dynamic elimination for WorldMotion: never forms the
# ~1e10-scale ternary normal blocks whose f32 representation error makes
# the reduced system indefinite at lambda <= 1e-7 (the NaN-rejected LM
# iterations).  See `schur_step`'s stable branch.  DYNO_SCHUR_STABLE=0
# reverts to the subtractive elimination.
_SCHUR_STABLE = _os.environ.get("DYNO_SCHUR_STABLE", "1") == "1"

# NaN-ratchet on lambda (default ON): at lambda <= 1e-7 the f32 chain
# elimination of the ~1e10-weight ternary blocks cancels catastrophically
# and the reduced system comes back indefinite -> the Cholesky NaNs and the
# iteration is a pure reject.  Measured schedule (window-10): after ONE
# successful 1e-7 step early on, every later low-lambda retry NaNs — 4/10
# iterations wasted re-probing the same failing lambda.  The ratchet
# remembers the largest lambda that ever produced a NaN step and never
# lets the schedule go below factor x that again, converting the repeat
# rejects into accepted (1e-6-quality) steps.  The FIRST low-lambda
# attempt still happens, so the occasional GN-quality step that final
# accuracy depends on is preserved (an f64 retry branch was tried instead
# and rejected: under vmap `lax.cond` lowers to `select`, so the emulated
# -f64 elimination would execute on EVERY iteration of EVERY window).
# DYNO_SCHUR_NAN_RATCHET=0 reverts to the plain NaN-reject schedule.
_NAN_RATCHET = _os.environ.get("DYNO_SCHUR_NAN_RATCHET", "1") == "1"


# --------------------------------------------------------------------------
# Block-tridiagonal chain solve (matrix RHS)
# --------------------------------------------------------------------------


def _floor_consts(dtype):
    """(relative, absolute) diagonal floors keeping structurally-empty rows
    SPD.  Scaled to the dtype: the f32 values are production; the f64 values
    are small enough that the f64 cross-check (`tests/f64_check.py`) pins
    the elimination algebra against the dense solve at ~1e-6 instead of
    hiding divergence behind f32-sized regularizers."""
    if jnp.finfo(dtype).eps > 1e-10:  # f32 family
        return 1e-7, 1e-8
    return 1e-15, 1e-16


def _inv3(M: jax.Array) -> jax.Array:
    """Closed-form (adjugate) inverse of batched 3x3 SPD blocks.

    Inside the block-Thomas scan an LU `linalg.solve` per step is
    dispatch-bound on TPU; the adjugate turns each step into a handful of
    fused elementwise ops.  The chain blocks carry the TRUE ternary weight
    (~1e10; the Hessian cap is intentionally disengaged — see the NEGATIVE
    RESULT note in `world_motion_blocks`), so low-lambda eliminations can
    go near-singular; the LM loop's NaN-step reject handles that case.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def chain_solve_lanes(A: jax.Array, B: jax.Array, rhs: jax.Array) -> jax.Array:
    """Lane-major `chain_solve`: same block-Thomas elimination with every
    per-track quantity stored track-MINOR — A, B (W, 3, 3, N) and
    rhs (W, 3, M, N) — so each scan step is broadcast mul+reduce at full
    128-lane VPU occupancy instead of (N, 3, 3) batched matmuls whose tiles
    use 3/128 lanes (the layout disease measured 50x in small_schur,
    BENCH_NOTES session 5).  Accepts/returns the chain_solve block-major
    layout; the two transposes at the boundary are single relayout copies.
    """
    from ..ops.linalg import _mm_lanes, inv3_lanes

    N = A.shape[1]
    m = rhs.shape[-1]
    A_l = jnp.transpose(A, (0, 2, 3, 1))
    B_l = jnp.transpose(B, (0, 2, 3, 1))
    rhs_l = jnp.transpose(rhs, (0, 2, 3, 1))

    def fwd(carry, inp):
        D_prev_inv, y_prev = carry
        A_k, B_k, r_k = inp
        sol_B = _mm_lanes(D_prev_inv, B_k)
        sol_y = _mm_lanes(D_prev_inv, y_prev)
        Bt = jnp.swapaxes(B_k, -3, -2)
        D_k = A_k - _mm_lanes(Bt, sol_B)
        y_k = r_k - _mm_lanes(Bt, sol_y)
        Dinv = inv3_lanes(D_k)
        return (Dinv, y_k), (Dinv, y_k, B_k)

    eye = jnp.broadcast_to(
        jnp.eye(3, dtype=A.dtype)[..., None], (3, 3, N)
    )
    init = (eye, jnp.zeros((3, m, N), A.dtype))
    (_, _), (Dinv_all, y_all, B_all) = jax.lax.scan(
        fwd, init, (A_l, B_l, rhs_l)
    )

    def bwd(x_next, inp):
        Dinv_k, y_k, B_next = inp
        x_k = _mm_lanes(Dinv_k, y_k - _mm_lanes(B_next, x_next))
        return x_k, x_k

    B_shift = jnp.concatenate([B_all[1:], jnp.zeros_like(B_all[:1])], axis=0)
    _, x = jax.lax.scan(
        bwd, jnp.zeros((3, m, N), A.dtype), (Dinv_all, y_all, B_shift),
        reverse=True,
    )
    return jnp.transpose(x, (0, 3, 1, 2))


def chain_solve(A: jax.Array, B: jax.Array, rhs: jax.Array) -> jax.Array:
    """Solve all per-tracklet block-tridiagonal systems with matrix RHS.

    A: (W, N, 3, 3) diagonal blocks; B: (W, N, 3, 3) with B[k] the
    (row k-1, col k) coupling block (B[0] MUST be zero); rhs: (W, N, 3, M).
    The system is symmetric: block (k, k-1) = B[k]^T.  Block-Thomas
    forward elimination + back substitution, each a `lax.scan` over frames
    whose steps are batched adjugate 3x3 inverses + (3, M) matmuls.
    """

    def fwd(carry, inp):
        D_prev_inv, y_prev = carry
        A_k, B_k, r_k = inp
        sol_B = _mm(D_prev_inv, B_k)
        sol_y = _mm(D_prev_inv, y_prev)
        Bt = jnp.swapaxes(B_k, -1, -2)
        D_k = A_k - _mm(Bt, sol_B)
        y_k = r_k - _mm(Bt, sol_y)
        return (_inv3(D_k), y_k), (_inv3(D_k), y_k, B_k)

    n = A.shape[1]
    m = rhs.shape[-1]
    eye = jnp.eye(3, dtype=A.dtype)
    # B[0] == 0, so the initial D^-1 never contributes
    init = (
        jnp.broadcast_to(eye, (n, 3, 3)),
        jnp.zeros((n, 3, m), A.dtype),
    )
    (_, _), (Dinv_all, y_all, B_all) = jax.lax.scan(fwd, init, (A, B, rhs))

    def bwd(x_next, inp):
        Dinv_k, y_k, B_next = inp
        x_k = _mm(Dinv_k, y_k - _mm(B_next, x_next))
        return x_k, x_k

    B_shift = jnp.concatenate([B_all[1:], jnp.zeros_like(B_all[:1])], axis=0)
    _, x = jax.lax.scan(
        bwd, jnp.zeros((n, 3, m), A.dtype), (Dinv_all, y_all, B_shift),
        reverse=True,
    )
    return x


def chain_solve_ternary(c, T, B, rhs):
    """Chain solve exploiting the WorldMotion ternary structure — the ROOT
    FIX for the low-lambda NaN-rejected LM iterations (round-3 weak #3).

    The WorldMotion dynamic-point chain blocks are EXACTLY
        A_k = alpha_k I,        alpha_k = c_k + T_k + T_{k+1}
        B_k = -T_k R_k^T,       R_k the selected motion rotation (orthogonal)
    with c_k = observation weight / sigma_d^2 (+ damping + tiny floor) and
    T_k = ternary weight / sigma_t^2 (~1e10; zero at chain cuts).  The
    block-Thomas diagonal therefore stays SCALAR:
        D_k = delta_k I,   delta_k = alpha_k - T_k^2 / delta_{k-1},
    and because delta_{k-1} = T_k + gamma_{k-1}, the recursion rewrites
    WITHOUT SUBTRACTION as
        delta_k = T_{k+1} + gamma_k,
        gamma_k = c_k + T_k * gamma_{k-1} / (T_k + gamma_{k-1}).
    Every term is nonnegative (harmonic composition of information), so the
    f32 elimination can no longer cancel catastrophically — previously
    `alpha - T^2/delta` subtracted near-equal ~1e10 quantities and went
    INDEFINITE at lambda <= 1e-7, NaN-rejecting 4/10 window-10 LM
    iterations (BENCH_NOTES session 8).  It is also CHEAPER than the
    generic block solve: no 3x3 inverses, one (3,3)@(3,M) product per scan
    step instead of two plus an adjugate.

    c, T: (W, N) with T[0] == 0 (or B[0] zeroed by the SPIKE caller, which
    must then fold the cross coupling via c[0] += T[0] and T[0] = 0);
    B: (W, N, 3, 3) = -T_k R_k^T as built; rhs: (W, N, 3, M).
    """
    N = c.shape[1]
    dtype = rhs.dtype
    T_next = jnp.concatenate([T[1:], jnp.zeros_like(T[:1])], axis=0)

    def gscan(g_prev, inp):
        c_k, T_k = inp
        g = c_k + T_k * g_prev / (T_k + g_prev)
        return g, g

    _, gam = jax.lax.scan(gscan, jnp.ones((N,), dtype), (c, T))
    delta = T_next + gam                             # (W, N)
    return _chain_scalar_core(delta, B, rhs)


def chain_solve_scalar(alpha, B, rhs):
    """Chain solve for scalar-diagonal / scaled-orthogonal-coupling systems
    given the diagonal scalars directly: A_k = alpha_k I, B_k = b_k Q_k
    (Q orthogonal).  Used for the Woodbury capacitance chain M = I +
    A~ Kobs^-1 A~^T of the stable elimination, whose diagonal does not
    decompose into the `chain_solve_ternary` gamma form.  The scalar Thomas
    recursion delta_k = alpha_k - b_k^2/delta_{k-1} DOES subtract, but for
    M the survivor scale is ~sqrt(x) of the x-scale operands (x = s^2/c),
    so f32 keeps ~1e-3 relative accuracy and positivity — unlike the raw
    normal-equation chain where the survivor was ~1e-6 of the operands."""
    b2 = jnp.sum(B[:, :, 0, :] ** 2, axis=-1)        # (W, N): |b Q row|^2

    def dscan(d_prev, inp):
        a_k, b2_k = inp
        d = a_k - b2_k / d_prev
        return d, d

    N = alpha.shape[1]
    _, delta = jax.lax.scan(
        dscan, jnp.ones((N,), alpha.dtype), (alpha, b2)
    )
    return _chain_scalar_core(delta, B, rhs)


def _chain_scalar_core(delta, B, rhs):
    """Forward/backward substitution of the scalar-diagonal block-Thomas
    given precomputed pivots `delta` (W, N): one (3,3)@(3,M) rotation apply
    per scan step, no 3x3 inverses (lane-major layouts)."""
    from ..ops.linalg import _mm_lanes

    N = delta.shape[1]
    m = rhs.shape[-1]
    dtype = rhs.dtype
    B_l = jnp.transpose(B, (0, 2, 3, 1))            # (W, 3, 3, N)
    Bt_l = jnp.swapaxes(B_l, 1, 2)
    rhs_l = jnp.transpose(rhs, (0, 2, 3, 1))        # (W, 3, M, N)

    def fwd(carry, inp):
        y_prev, d_prev = carry
        Bt_k, r_k, d_k = inp
        y_k = r_k - _mm_lanes(Bt_k, y_prev / d_prev[None, None, :])
        return (y_k, d_k), y_k

    init = (jnp.zeros((3, m, N), dtype), jnp.ones((N,), dtype))
    (_, _), y_all = jax.lax.scan(fwd, init, (Bt_l, rhs_l, delta))

    B_shift = jnp.concatenate([B_l[1:], jnp.zeros_like(B_l[:1])], axis=0)

    def bwd(x_next, inp):
        y_k, Bn_k, d_k = inp
        x_k = (y_k - _mm_lanes(Bn_k, x_next)) / d_k[None, None, :]
        return x_k, x_k

    _, x = jax.lax.scan(
        bwd, jnp.zeros((3, m, N), dtype), (y_all, B_shift, delta),
        reverse=True,
    )
    return jnp.transpose(x, (0, 3, 1, 2))


# --------------------------------------------------------------------------
# Normal system (hand-derived Jacobian blocks + IRLS weights)
# --------------------------------------------------------------------------


class NormalSystem(NamedTuple):
    """All blocks of J^T W J and -J^T W r for one backend window.

    "Pose" below means the per-object reduced variable: H_k^j for
    WorldMotion, L_k^j for WorldPose.  The chain-row -> pose-column
    couplings of the per-frame-pair motion factor j (frames j, j+1) are
    stored as four (W-1, ND, 3, 6) arrays indexed (chain row, pose col):
    Rpp (j, j), Rpc (j, j+1), Rcp (j+1, j), Rcc (j+1, j+1).  WorldMotion
    only populates Rpc/Rcc (its ternary factor references one motion H_{j+1}).
    """

    Hcc: jax.Array      # (W, 6, W, 6) direct camera-camera
    Dmm: jax.Array      # (W, O, 6, 6) direct pose diag blocks
    Omm1: jax.Array     # (W-1, O, 6, 6) pose (k, k+1) coupling
    Omm2: jax.Array     # (W-2, O, 6, 6) pose (k, k+2) coupling (triplets)
    b_cam: jax.Array    # (W, 6)
    b_mot: jax.Array    # (W, O, 6)
    Hll_s: jax.Array    # (NS, 3, 3) static point blocks (undamped)
    Us: jax.Array       # (W, NS, 6, 3) camera-static couplings
    b_sp: jax.Array     # (NS, 3)
    Ad: jax.Array       # (W, ND, 3, 3) chain diag blocks (undamped)
    Bd: jax.Array       # (W, ND, 3, 3) chain (k-1, k) coupling
    Rc: jax.Array       # (W, ND, 3, 6)  chain-row k -> camera k
    Rpp: jax.Array      # (W-1, ND, 3, 6)
    Rpc: jax.Array      # (W-1, ND, 3, 6)
    Rcp: jax.Array      # (W-1, ND, 3, 6)
    Rcc: jax.Array      # (W-1, ND, 3, 6)
    b_dp: jax.Array     # (W, ND, 3)
    onehot: jax.Array   # (W, ND, O) object one-hot per (frame, track)
    # WorldMotion scalar chain structure (chain_solve_ternary): Ad =
    # (chain_c + chain_T + chain_T[next]) I, Bd = -chain_T R^T.  Both zero
    # for WorldPose, whose chain blocks are not scalar (generic path).
    chain_c: jax.Array  # (W, ND) base diag scalar (obs weight + tiny floor)
    chain_T: jax.Array  # (W, ND) ternary info scalar aligned with Bd rows
    # Stable-elimination ingredients (WorldMotion; see schur_step's stable
    # branch): the ternary factor's SQUARE-ROOT pieces, all ~sqrt(wt)/sigma
    # scale (~1e5) so f32 keeps full relative accuracy.  Row k = factor
    # with current frame k (row 0 structurally empty).  When
    # `_SCHUR_STABLE`, Dmm/b_mot/b_dp above hold the smoothing/observation
    # parts ONLY — the ternary information lives here exclusively.
    st_s: jax.Array     # (W, ND) sqrt(wt_k)/sigma_t
    st_R: jax.Array     # (W, ND, 3, 3) selected motion rotation (I inactive)
    st_G: jax.Array     # (W, ND, 3, 6) sigma_t * Jh = [-hat(y) | I]
    st_phi: jax.Array   # (W, ND, 3) whitened sqrt-weighted residual


def _select_poses(P: SE3, masks: WindowMasks, w: WindowData):
    """Per-(frame, track) object pose/motion SE3 via one-hot (identity where
    inactive).

    A frame f participates in motion factor f-1 (as current frame) OR factor
    f (as previous frame — WorldPose couples both), so the activity mask is
    ternary[f] | ternary[f+1]; `same_obj` in the ternary mask guarantees
    dyn_obj is constant across an active pair, so either frame's id works.
    """
    no_ = P.batch_shape[1]
    tern_next = jnp.concatenate(
        [masks.ternary[1:], jnp.zeros_like(masks.ternary[:1])], axis=0
    )
    active = masks.ternary | tern_next
    onehot = jax.nn.one_hot(
        jnp.where(active, w.dyn_obj, -1), no_, dtype=P.t.dtype
    )                                                      # (W, ND, O)
    Pk = SE3(
        _es("wno,woij->wnij", onehot, P.R),
        _es("wno,woj->wnj", onehot, P.t),
    )
    eye = jnp.eye(3, dtype=P.t.dtype)
    sel = jnp.any(onehot > 0, axis=-1)[..., None, None]
    return SE3(jnp.where(sel, Pk.R, eye), Pk.t), onehot


def _pose_point_jacobians(X: SE3, pts, sigma: float):
    """Whitened Jacobians of e = X^-1 p - z wrt (pose tangent, point).

    Right perturbation X Exp(xi): e ~ y + hat(y) w - v with y = X^-1 p the
    point in the camera frame, so J_xi = [hat(y) | -I], J_p = R^T (exact at
    the linearization point; matches jax.jacfwd of the retracted residual).
    X: (W,), pts: (W, N, 3).  Returns Jx (W, N, 3, 6), Jp (W, 3, 3) — the
    point Jacobian is point-independent (shared across the N axis).
    """
    Rt = jnp.swapaxes(X.R, -1, -2)                          # (W, 3, 3)
    y = _es("wij,wnj->wni", Rt, pts - X.t[:, None, :])      # (W, N, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pts.dtype), (*y.shape, 3))
    Jx = jnp.concatenate([so3_hat(y), -eye], axis=-1) / sigma
    Jp = Rt / sigma
    return Jx, Jp, y


def _pose_sigmas(cfg: BackendConfig, dtype):
    pose_sigma = jnp.asarray(
        [cfg.odometry_rotation_sigma] * 3 + [cfg.odometry_translation_sigma] * 3,
        dtype,
    )
    smooth_sigma = jnp.asarray(
        [cfg.constant_object_motion_rotation_sigma] * 3
        + [cfg.constant_object_motion_translation_sigma] * 3,
        dtype,
    )
    return pose_sigma, smooth_sigma


def _odo_anchor_blocks(X, w, masks, cfg, anchor, r_anchor, r_odo, dtype,
                       anchor_prior_L=None):
    """Odometry + anchor contributions to the camera-camera Hessian and
    gradient — the REPLICATED-cheap part of `_camera_blocks` (poses only, no
    point grids), shared with the explicit distributed path where every
    device computes it redundantly from the replicated pose estimates."""
    W_ = masks.frame.shape[0]
    z6 = jnp.zeros(6, dtype)
    pose_sigma, _ = _pose_sigmas(cfg, dtype)
    wgt_odo = masks.odometry[1:].astype(dtype)

    odo_meas = jax.vmap(lambda a, b: se3_compose(se3_inverse(a), b))(
        SE3(w.X_init.R[:-1], w.X_init.t[:-1]),
        SE3(w.X_init.R[1:], w.X_init.t[1:]),
    )

    def _j_odo(Xa: SE3, Xb: SE3, Z: SE3):
        def f(a, b):
            return (
                factors.between_residual(
                    se3_retract(Xa, a), se3_retract(Xb, b), Z
                )
                / pose_sigma
            )

        return jax.jacfwd(f, argnums=(0, 1))(z6, z6)

    Ja_o, Jb_o = jax.vmap(_j_odo)(
        SE3(X.R[:-1], X.t[:-1]), SE3(X.R[1:], X.t[1:]), odo_meas
    )                                                      # (W-1, 6, 6)

    def f_anchor(a):
        r = factors.prior_residual(se3_retract(X[0], a), anchor)
        if anchor_prior_L is None:
            return r / cfg.initial_pose_prior_sigma
        # fixed-lag boundary marginal: full-covariance anchor whitened by
        # the Cholesky factor L of the marginal information (Lam = L L^T)
        return anchor_prior_L.T @ r

    J_anchor = jax.jacfwd(f_anchor)(z6)                    # (6, 6)

    idx = jnp.arange(W_)
    Hcc = jnp.zeros((W_, 6, W_, 6), dtype)
    Hcc = Hcc.at[0, :, 0, :].add(_es("ra,rb->ab", J_anchor, J_anchor))
    Haa = _es("k,kra,krb->kab", wgt_odo, Ja_o, Ja_o)
    Hbb = _es("k,kra,krb->kab", wgt_odo, Jb_o, Jb_o)
    Hab = _es("k,kra,krb->kab", wgt_odo, Ja_o, Jb_o)
    Hcc = Hcc.at[idx[:-1], :, idx[:-1], :].add(Haa)
    Hcc = Hcc.at[idx[1:], :, idx[1:], :].add(Hbb)
    Hcc = Hcc.at[idx[:-1], :, idx[1:], :].add(Hab)
    Hcc = Hcc.at[idx[1:], :, idx[:-1], :].add(jnp.swapaxes(Hab, -1, -2))

    g_cam = jnp.zeros((W_, 6), dtype)
    g_cam = g_cam.at[0].add(_es("ra,r->a", J_anchor, r_anchor[0]))
    g_cam = g_cam.at[:-1].add(_es("k,kra,kr->ka", wgt_odo, Ja_o, r_odo))
    g_cam = g_cam.at[1:].add(_es("k,kra,kr->ka", wgt_odo, Jb_o, r_odo))
    return Hcc, g_cam


def _camera_blocks(X, w, masks, cfg, anchor, r_anchor, r_odo, r_static,
                   r_dyn, wgt_static, wgt_dyn, Jx_s, Jx_d, dtype,
                   anchor_prior_L=None):
    """Direct camera-camera blocks + camera gradient (shared by both
    formulations).  Odometry/anchor Jacobians via jacfwd (tiny grids)."""
    W_ = masks.frame.shape[0]
    Hcc, g_cam = _odo_anchor_blocks(
        X, w, masks, cfg, anchor, r_anchor, r_odo, dtype,
        anchor_prior_L=anchor_prior_L,
    )
    idx = jnp.arange(W_)
    Dcam = _es("kn,knra,knrb->kab", wgt_static, Jx_s, Jx_s) + _es(
        "kn,knra,knrb->kab", wgt_dyn, Jx_d, Jx_d
    )
    Hcc = Hcc.at[idx, :, idx, :].add(Dcam)
    g_cam = g_cam + _es("kn,knra,knr->ka", wgt_static, Jx_s, r_static)
    g_cam = g_cam + _es("kn,knra,knr->ka", wgt_dyn, Jx_d, r_dyn)
    return Hcc, -g_cam


def _ternary_jacobians(Hc_sel: SE3, dp_cur, sig_t):
    """Whitened ternary-factor Jacobians wrt (motion tangent, m_cur) for
    e = m_prev - H^-1 m_cur:  J_H = [-hat(y)|I],  J_mc = -R_H^T,
    y = H^-1 m_cur (J_mp = I folds into scalars at the call sites).
    `Hc_sel`/`dp_cur` are the selected motion and current point per factor
    row — shape-polymorphic so the distributed path can feed ghost-extended
    rows."""
    Rt_H = jnp.swapaxes(Hc_sel.R, -1, -2)
    y_t = _es("...ab,...b->...a", Rt_H, dp_cur - Hc_sel.t)
    eyeJ = jnp.broadcast_to(
        jnp.eye(3, dtype=dp_cur.dtype), (*y_t.shape, 3)
    )
    Jh = jnp.concatenate([-so3_hat(y_t), eyeJ], axis=-1) / sig_t
    Jc = -Rt_H / sig_t
    return Jh, Jc, y_t


def _smoothing_blocks(H: SE3, wgt_smooth, r_smooth, smooth_sigma, dtype):
    """Motion-smoothing contributions (W, O, 6, 6)/(W-1, O, 6, 6)/(W, O, 6)
    — replicated-cheap (pose-family jacfwd on the small motion grid), shared
    with the explicit distributed path."""
    z6 = jnp.zeros(6, dtype)

    def _j_smooth(Ha: SE3, Hb: SE3):
        def f(a, b):
            return (
                factors.motion_smoothing_residual(
                    se3_retract(Ha, a), se3_retract(Hb, b)
                )
                / smooth_sigma
            )

        return jax.jacfwd(f, argnums=(0, 1))(z6, z6)

    Ja_s, Jb_s = jax.vmap(jax.vmap(_j_smooth))(
        SE3(H.R[:-1], H.t[:-1]), SE3(H.R[1:], H.t[1:])
    )                                                      # (W-1, O, 6, 6)
    W_, O = H.batch_shape
    Dmm = jnp.zeros((W_, O, 6, 6), dtype)
    Dmm = Dmm.at[:-1].add(_es("ko,kora,korb->koab", wgt_smooth, Ja_s, Ja_s))
    Dmm = Dmm.at[1:].add(_es("ko,kora,korb->koab", wgt_smooth, Jb_s, Jb_s))
    Omm1 = _es("ko,kora,korb->koab", wgt_smooth, Ja_s, Jb_s)
    g_mot = jnp.zeros((W_, O, 6), dtype)
    g_mot = g_mot.at[:-1].add(
        _es("ko,kora,kor->koa", wgt_smooth, Ja_s, r_smooth)
    )
    g_mot = g_mot.at[1:].add(
        _es("ko,kora,kor->koa", wgt_smooth, Jb_s, r_smooth)
    )
    return Dmm, Omm1, g_mot


def _static_blocks(wgt_static, Jx_s, Jp_s, r_static, dtype):
    """Static landmark elimination blocks.  Jp_s = R^T/sigma is orthogonal
    up to scale, so Hll_s is a scalar multiple of I per landmark."""
    eye3 = jnp.eye(3, dtype=dtype)
    _, tiny = _floor_consts(dtype)
    scale = _es("kra,krb->kab", Jp_s, Jp_s)                # (W,3,3) = I/sig^2
    Hll_s = _es("kn,kab->nab", wgt_static, scale) + tiny * eye3
    Us = _es("kn,knra,krb->knab", wgt_static, Jx_s, Jp_s)  # (W, NS, 6, 3)
    b_sp = -_es("kn,kra,knr->na", wgt_static, Jp_s, r_static)
    return Hll_s, Us, b_sp


def build_normal_system(
    values: dict,
    sqrt_w: list,
    w: WindowData,
    masks: WindowMasks,
    cfg: BackendConfig,
    anchor: SE3,
    res0: list,
    anchor_prior_L=None,
) -> NormalSystem:
    """WorldMotion normal system (values {X, H, sp, dp}).

    Hand-derived whitened Jacobians of the point families:
      pose_to_point  e = X^-1 p - z:        J_X = [hat(y)|-I],  J_p = R^T
      ternary  e = m_prev - H^-1 m_cur:     J_H = [-hat(y)|I],  J_mp = I,
                                            J_mc = -R_H^T,  y = H^-1 m_cur
    """
    X: SE3 = values["X"]
    H: SE3 = values["H"]
    sp = values["sp"]
    dp = values["dp"]
    dtype = sp.dtype
    W_, O = masks.smoothing.shape
    ND = masks.dyn_obs.shape[1]
    r_anchor, r_odo, r_static, r_dyn, r_tern, r_smooth = res0
    _, smooth_sigma = _pose_sigmas(cfg, dtype)

    # ---- effective per-factor weights: IRLS robust weight x activation mask
    # (sigma whitening lives inside the Jacobians / residuals).  Family
    # order matches `world_motion_residuals`.
    wgt_static = sqrt_w[2] ** 2 * masks.static_obs.astype(dtype)
    wgt_dyn = sqrt_w[3] ** 2 * masks.dyn_obs.astype(dtype)
    wgt_tern = sqrt_w[4] ** 2 * masks.ternary[1:].astype(dtype)
    wgt_smooth = masks.smoothing[1:].astype(dtype)

    # NEGATIVE RESULT (2026-08-19, do not retry): a ternary Hessian-weight
    # cap was tried here to bound f32 chain-elimination conditioning (the
    # ternary information 1/sigma^2 ~ 1e10 swamps the observation terms).
    # The formula as written (dyn_sigma^2 * 1e3 / sig_t^2 ~ 3.9e10, then
    # min(cap, 1)) never engaged — and ENGAGING a real cap with the
    # gradient unmatched stalls convergence completely (err stuck at 5e4
    # for 7 iters; BENCH_NOTES session 8).  The Hessian therefore uses the
    # TRUE ternary weight; near-singular low-lambda eliminations are
    # handled by the NaN-step reject in the LM loop.
    wgt_tern_h = wgt_tern

    # ---- hand-derived point-family Jacobians -----------------------------
    Jx_s, Jp_s, _ = _pose_point_jacobians(
        X, jnp.broadcast_to(sp[None], (W_, *sp.shape)),
        cfg.static_point_noise_sigma,
    )
    Jx_d, Jp_d, _ = _pose_point_jacobians(X, dp, cfg.dynamic_point_noise_sigma)

    sig_t = cfg.motion_ternary_factor_noise_sigma
    H_sel, onehot = _select_poses(H, masks, w)
    Hc = SE3(H_sel.R[1:], H_sel.t[1:])                     # (W-1, ND)
    Jh, Jc, y_t = _ternary_jacobians(Hc, dp[1:], sig_t)
    # Jp (wrt m_prev) = I / sig_t — folded into the scalars below.

    # ---- direct camera blocks -------------------------------------------
    Hcc, b_cam = _camera_blocks(
        X, w, masks, cfg, anchor, r_anchor, r_odo, r_static, r_dyn,
        wgt_static, wgt_dyn, Jx_s, Jx_d, dtype,
        anchor_prior_L=anchor_prior_L,
    )

    # ---- direct motion blocks -------------------------------------------
    Dmm_sm, Omm1, g_mot_sm = _smoothing_blocks(
        H, wgt_smooth, r_smooth, smooth_sigma, dtype
    )
    oh1 = onehot[1:]                                       # (W-1, ND, O)
    Omm2 = jnp.zeros((max(W_ - 2, 0), O, 6, 6), dtype)
    if _SCHUR_STABLE:
        # ternary information is carried in square-root form (st_* fields);
        # Dmm/b_mot stay smoothing-only so the 1e10-scale blocks are never
        # formed (see schur_step's stable branch)
        Dmm = Dmm_sm
        g_mot = g_mot_sm
    else:
        Dmm = Dmm_sm.at[1:].add(
            _es("jd,jdo,jdra,jdrb->joab", wgt_tern_h, oh1, Jh, Jh)
        )
        g_mot = g_mot_sm.at[1:].add(
            _es("jd,jdo,jdra,jdr->joa", wgt_tern, oh1, Jh, r_tern)
        )

    # ---- static landmark blocks -----------------------------------------
    Hll_s, Us, b_sp = _static_blocks(wgt_static, Jx_s, Jp_s, r_static, dtype)

    # ---- dynamic chain blocks -------------------------------------------
    # J_mc^T J_mc = I/sig^2 and J_mp^T J_mp = I/sig^2 (orthonormal), so the
    # diagonal is a scalar field times I; the (k-1,k) coupling is
    # J_mp^T J_mc = -R_H^T / sig^2.
    Rc = _es("kd,kra,kdrb->kdab", wgt_dyn, Jp_d, Jx_d)     # (W, ND, 3, 6)
    if _SCHUR_STABLE:
        # the stable step never touches the 1e10-scale chain blocks —
        # carry zeros (free) in the shared NormalSystem layout
        Ad = jnp.zeros((W_, ND, 3, 3), dtype)
        Bd = jnp.zeros((W_, ND, 3, 3), dtype)
        Rpc = jnp.zeros((W_ - 1, ND, 3, 6), dtype)
        Rcc = jnp.zeros((W_ - 1, ND, 3, 6), dtype)
        Rz = Rpc
    else:
        eye3 = jnp.eye(3, dtype=dtype)
        diag_scalar = wgt_dyn / cfg.dynamic_point_noise_sigma**2
        diag_scalar = diag_scalar.at[:-1].add(wgt_tern_h / sig_t**2)
        diag_scalar = diag_scalar.at[1:].add(wgt_tern_h / sig_t**2)
        Ad = (
            diag_scalar[..., None, None] * eye3
            + _floor_consts(dtype)[1] * eye3
        )
        Tpc = (wgt_tern_h / sig_t)[..., None, None] * Jc   # J_mp^T J_mc
        Bd = jnp.concatenate([jnp.zeros_like(Tpc[:1]), Tpc], axis=0)
        Rpc = (wgt_tern_h / sig_t)[..., None, None] * Jh   # row j -> col j+1
        Rcc = _es("jd,jdra,jdrb->jdab", wgt_tern_h, Jc, Jh)
        Rz = jnp.zeros_like(Rpc)

    g_dp = _es("kd,kra,kdr->kda", wgt_dyn, Jp_d, r_dyn)
    if not _SCHUR_STABLE:
        g_dp = g_dp.at[:-1].add((wgt_tern / sig_t)[..., None] * r_tern)
        g_dp = g_dp.at[1:].add(_es("jd,jdra,jdr->jda", wgt_tern, Jc, r_tern))

    chain_T = jnp.concatenate(
        [jnp.zeros_like(wgt_tern_h[:1]), wgt_tern_h / sig_t**2], axis=0
    )
    chain_c = (
        wgt_dyn / cfg.dynamic_point_noise_sigma**2 + _floor_consts(dtype)[1]
    )

    # square-root ternary pieces for the stable elimination (~1e5 scale)
    sqw_t = sqrt_w[4] * masks.ternary[1:].astype(dtype)    # (W-1, ND)
    st_s = jnp.concatenate(
        [jnp.zeros_like(sqw_t[:1]), sqw_t / sig_t], axis=0
    )
    eyeR = jnp.broadcast_to(jnp.eye(3, dtype=dtype), Hc.R[:1].shape)
    st_R = jnp.concatenate([eyeR, Hc.R], axis=0)           # (W, ND, 3, 3)
    eyeG = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*y_t.shape, 3))
    G = jnp.concatenate([-so3_hat(y_t), eyeG], axis=-1)    # sigma_t * Jh
    st_G = jnp.concatenate([jnp.zeros_like(G[:1]), G], axis=0)
    st_phi = jnp.concatenate(
        [jnp.zeros_like(r_tern[:1]), sqw_t[..., None] * r_tern], axis=0
    )
    return NormalSystem(
        Hcc=Hcc, Dmm=Dmm, Omm1=Omm1, Omm2=Omm2, b_cam=b_cam, b_mot=-g_mot,
        Hll_s=Hll_s, Us=Us, b_sp=b_sp,
        Ad=Ad, Bd=Bd, Rc=Rc, Rpp=Rz, Rpc=Rpc, Rcp=Rz, Rcc=Rcc,
        b_dp=-g_dp, onehot=onehot, chain_c=chain_c, chain_T=chain_T,
        st_s=st_s, st_R=st_R, st_G=st_G, st_phi=st_phi,
    )



def _pose_direct_blocks(L: SE3, w, masks, cfg, triple, r_ps, r_kin,
                        smooth_sigma, dtype):
    """Replicated-cheap direct pose blocks of the WorldPose formulation:
    the LandmarkPoseSmoothing triplets and the optional
    ObjectKinematicFactor — pose-family jacfwd grids on the small (W, O)
    motion table, shared with the explicit distributed path.  The
    motion-pose factor's (1e10-scale) direct blocks are NOT here — the
    stable path carries them in square-root form."""
    z6 = jnp.zeros(6, dtype)
    W_, O = L.batch_shape

    def _j_triplet(La: SE3, Lb: SE3, Lc_: SE3):
        def f(a, b, c):
            return (
                factors.landmark_pose_smoothing_residual(
                    se3_retract(La, a), se3_retract(Lb, b), se3_retract(Lc_, c)
                )
                / smooth_sigma
            )

        return jax.jacfwd(f, argnums=(0, 1, 2))(z6, z6, z6)

    Ja, Jb, Jc3 = jax.vmap(jax.vmap(_j_triplet))(
        SE3(L.R[:-2], L.t[:-2]), SE3(L.R[1:-1], L.t[1:-1]),
        SE3(L.R[2:], L.t[2:]),
    )                                                      # (W-2, O, 6, 6)
    Dmm = jnp.zeros((W_, O, 6, 6), dtype)
    Omm1 = jnp.zeros((W_ - 1, O, 6, 6), dtype)
    Dmm = Dmm.at[:-2].add(_es("to,tora,torb->toab", triple, Ja, Ja))
    Dmm = Dmm.at[1:-1].add(_es("to,tora,torb->toab", triple, Jb, Jb))
    Dmm = Dmm.at[2:].add(_es("to,tora,torb->toab", triple, Jc3, Jc3))
    Omm1 = Omm1.at[:-1].add(_es("to,tora,torb->toab", triple, Ja, Jb))
    Omm1 = Omm1.at[1:].add(_es("to,tora,torb->toab", triple, Jb, Jc3))
    Omm2 = _es("to,tora,torb->toab", triple, Ja, Jc3)

    g_mot = jnp.zeros((W_, O, 6), dtype)
    g_mot = g_mot.at[:-2].add(_es("to,tora,tor->toa", triple, Ja, r_ps))
    g_mot = g_mot.at[1:-1].add(_es("to,tora,tor->toa", triple, Jb, r_ps))
    g_mot = g_mot.at[2:].add(_es("to,tora,tor->toa", triple, Jc3, r_ps))

    if r_kin is not None:
        # optional ObjectKinematicFactor (config docstring): pose-pair
        # blocks via jacfwd on the small (W-1, O) grid, like smoothing
        kin_w = (masks.smoothing[1:] & w.motion_valid[1:]).astype(dtype)
        H_meas = SE3(w.motion_init.R[1:], w.motion_init.t[1:])

        def _j_kin(Hm: SE3, La: SE3, Lb: SE3):
            def f(a, b):
                return (
                    factors.object_kinematic_residual(
                        Hm, se3_retract(La, a), se3_retract(Lb, b)
                    )
                    / cfg.object_kinematic_sigma
                )

            return jax.jacfwd(f, argnums=(0, 1))(z6, z6)

        Ja_k, Jb_k = jax.vmap(jax.vmap(_j_kin))(
            H_meas, SE3(L.R[:-1], L.t[:-1]), SE3(L.R[1:], L.t[1:])
        )
        Dmm = Dmm.at[:-1].add(_es("ko,kora,korb->koab", kin_w, Ja_k, Ja_k))
        Dmm = Dmm.at[1:].add(_es("ko,kora,korb->koab", kin_w, Jb_k, Jb_k))
        Omm1 = Omm1 + _es("ko,kora,korb->koab", kin_w, Ja_k, Jb_k)
        g_mot = g_mot.at[:-1].add(
            _es("ko,kora,kor->koa", kin_w, Ja_k, r_kin)
        )
        g_mot = g_mot.at[1:].add(
            _es("ko,kora,kor->koa", kin_w, Jb_k, r_kin)
        )
    return Dmm, Omm1, Omm2, g_mot


def build_normal_system_pose(
    values: dict,
    sqrt_w: list,
    w: WindowData,
    masks: WindowMasks,
    cfg: BackendConfig,
    anchor: SE3,
    res0: list,
    anchor_prior_L=None,
) -> NormalSystem:
    """WorldPose (LLWorld) normal system (values {X, L, sp, dp}).

    Hand-derived whitened Jacobians of the LandmarkMotionPose factor
    e = m_k - L_k L_{k-1}^-1 m_{k-1} (`LandmarkMotionPoseFactor.cc:84-90`),
    with q = L_{k-1}^-1 m_{k-1} the point in the object frame:
      J_mp = -R_rel,   J_mc = I,   rel = L_k L_{k-1}^-1
      J_Lp = [-R_Lk hat(q) | R_Lk]     (right perturbation of L_{k-1})
      J_Lc = [ R_Lk hat(q) | -R_Lk] = -J_Lp
    The LandmarkPoseSmoothing triplet (L_{k-2}, L_{k-1}, L_k) contributes
    bandwidth-2 direct pose blocks (jacfwd over the small (W-2, O) grid).
    """
    X: SE3 = values["X"]
    L: SE3 = values["L"]
    sp = values["sp"]
    dp = values["dp"]
    dtype = sp.dtype
    W_, O = masks.smoothing.shape
    z6 = jnp.zeros(6, dtype)
    r_anchor, r_odo, r_static, r_dyn, r_mp, r_ps, *r_rest = res0
    _, smooth_sigma = _pose_sigmas(cfg, dtype)

    wgt_static = sqrt_w[2] ** 2 * masks.static_obs.astype(dtype)
    wgt_dyn = sqrt_w[3] ** 2 * masks.dyn_obs.astype(dtype)
    wgt_mp = sqrt_w[4] ** 2 * masks.ternary[1:].astype(dtype)
    triple = (masks.smoothing[1:-1] & masks.smoothing[2:]).astype(dtype)

    # No Hessian cap here either — see the NEGATIVE RESULT note in
    # `world_motion_blocks` (the motion-pose factor shares the ternary
    # sigma and the same finding).
    sig_t = cfg.motion_ternary_factor_noise_sigma
    wgt_mp_h = wgt_mp

    Jx_s, Jp_s, _ = _pose_point_jacobians(
        X, jnp.broadcast_to(sp[None], (W_, *sp.shape)),
        cfg.static_point_noise_sigma,
    )
    Jx_d, Jp_d, _ = _pose_point_jacobians(X, dp, cfg.dynamic_point_noise_sigma)

    L_sel, onehot = _select_poses(L, masks, w)
    Lp = SE3(L_sel.R[:-1], L_sel.t[:-1])                   # (W-1, ND)
    Lc = SE3(L_sel.R[1:], L_sel.t[1:])
    rel_R = _mm(Lc.R, jnp.swapaxes(Lp.R, -1, -2))
    q = _es("wnab,wnb->wna", jnp.swapaxes(Lp.R, -1, -2), dp[:-1] - Lp.t)
    Rhat = _mm(Lc.R, so3_hat(q))                           # (W-1, ND, 3, 3)
    J_Lp = jnp.concatenate([-Rhat, Lc.R], axis=-1) / sig_t # (W-1, ND, 3, 6)
    J_mp = -rel_R / sig_t
    # J_mc = I / sig_t, J_Lc = -J_Lp — folded into scalars/signs below.

    Hcc, b_cam = _camera_blocks(
        X, w, masks, cfg, anchor, r_anchor, r_odo, r_static, r_dyn,
        wgt_static, wgt_dyn, Jx_s, Jx_d, dtype,
        anchor_prior_L=anchor_prior_L,
    )

    # ---- direct pose blocks (motion-pose + smoothing triplets) ----------
    oh_p, oh_c = onehot[:-1], onehot[1:]
    r_kin = r_rest[0] if (cfg.use_object_kinematic_factor and r_rest) else None
    Dmm, Omm1, Omm2, g_mot = _pose_direct_blocks(
        L, w, masks, cfg, triple, r_ps, r_kin, smooth_sigma, dtype
    )
    if not _SCHUR_STABLE:
        PtP = _es("jd,jdra,jdrb->jdab", wgt_mp_h, J_Lp, J_Lp)  # (W-1,ND,6,6)
        Dmm = Dmm.at[:-1].add(_es("jdab,jdo->joab", PtP, oh_p))
        Dmm = Dmm.at[1:].add(_es("jdab,jdo->joab", PtP, oh_c))
        # J_Lp^T J_Lc = -PtP; factors only exist where the object id is
        # constant across (j, j+1), so scatter with either frame's one-hot
        Omm1 = Omm1 - _es("jdab,jdo->joab", PtP, oh_p)
        g_Lp = _es("jd,jdra,jdr->jda", wgt_mp, J_Lp, r_mp)  # (W-1, ND, 6)
        g_mot = g_mot.at[:-1].add(_es("jda,jdo->joa", g_Lp, oh_p))
        g_mot = g_mot.at[1:].add(-_es("jda,jdo->joa", g_Lp, oh_c))

    Hll_s, Us, b_sp = _static_blocks(wgt_static, Jx_s, Jp_s, r_static, dtype)

    # ---- dynamic chain blocks -------------------------------------------
    ND_ = masks.dyn_obs.shape[1]
    Rc = _es("kd,kra,kdrb->kdab", wgt_dyn, Jp_d, Jx_d)
    g_dp = _es("kd,kra,kdr->kda", wgt_dyn, Jp_d, r_dyn)
    if _SCHUR_STABLE:
        # stable (Woodbury) path: the 1e10-scale chain/coupling blocks are
        # never formed — the square-root st_* fields below carry the
        # motion-pose information (see schur_step's stable branch)
        Ad = jnp.zeros((W_, ND_, 3, 3), dtype)
        Bd = jnp.zeros((W_, ND_, 3, 3), dtype)
        Rpp = jnp.zeros((W_ - 1, ND_, 3, 6), dtype)
        Rpc = Rpp
        Rcp = Rpp
        Rcc = Rpp
    else:
        eye3 = jnp.eye(3, dtype=dtype)
        diag_scalar = wgt_dyn / cfg.dynamic_point_noise_sigma**2
        diag_scalar = diag_scalar.at[:-1].add(wgt_mp_h / sig_t**2)
        diag_scalar = diag_scalar.at[1:].add(wgt_mp_h / sig_t**2)
        Ad = (
            diag_scalar[..., None, None] * eye3
            + _floor_consts(dtype)[1] * eye3
        )
        # J_mc = I/sig_t, so w J_mp^T J_mc = (w/sig_t) J_mp^T
        Tpc = (wgt_mp_h / sig_t)[..., None, None] * jnp.swapaxes(
            J_mp, -1, -2
        )
        Bd = jnp.concatenate([jnp.zeros_like(Tpc[:1]), Tpc], axis=0)
        Rpp = _es("jd,jdra,jdrb->jdab", wgt_mp_h, J_mp, J_Lp)  # row j->col j
        Rpc = -Rpp                                         # row j -> col j+1
        Rcp = (wgt_mp_h / sig_t)[..., None, None] * J_Lp   # row j+1 -> col j
        Rcc = -Rcp                                         # row j+1 -> col j+1
        g_dp = g_dp.at[:-1].add(
            _es("jd,jdra,jdr->jda", wgt_mp, J_mp, r_mp)
        )
        g_dp = g_dp.at[1:].add((wgt_mp / sig_t)[..., None] * r_mp)

    # the LandmarkMotionPose chain shares the scalar/rotation structure
    # (J_mp is a rotation): Ad = (c + T + T[next]) I, Bd = -T rel_R^T
    chain_T = jnp.concatenate(
        [jnp.zeros_like(wgt_mp_h[:1]), wgt_mp_h / sig_t**2], axis=0
    )
    chain_c = (
        wgt_dyn / cfg.dynamic_point_noise_sigma**2 + _floor_consts(dtype)[1]
    )
    # square-root motion-pose pieces for the stable elimination:
    #   A~_k = s_k [-rel_R_k at m_{k-1}, +I at m_k]       (st_R = rel_R)
    #   B~_k = s_k [+G_k at L_{k-1} col, -G_k at L_k col] (st_G = sig*J_Lp)
    sqw_mp = sqrt_w[4] * masks.ternary[1:].astype(dtype)   # (W-1, ND)
    st_s = jnp.concatenate(
        [jnp.zeros_like(sqw_mp[:1]), sqw_mp / sig_t], axis=0
    )
    eyeR = jnp.broadcast_to(jnp.eye(3, dtype=dtype), rel_R[:1].shape)
    st_R = jnp.concatenate([eyeR, rel_R], axis=0)
    Gp = jnp.concatenate([-Rhat, Lc.R], axis=-1)           # sig_t * J_Lp
    st_G = jnp.concatenate([jnp.zeros_like(Gp[:1]), Gp], axis=0)
    st_phi = jnp.concatenate(
        [jnp.zeros_like(r_mp[:1]), sqw_mp[..., None] * r_mp], axis=0
    )
    return NormalSystem(
        Hcc=Hcc, Dmm=Dmm, Omm1=Omm1, Omm2=Omm2, b_cam=b_cam, b_mot=-g_mot,
        Hll_s=Hll_s, Us=Us, b_sp=b_sp,
        Ad=Ad, Bd=Bd, Rc=Rc, Rpp=Rpp, Rpc=Rpc, Rcp=Rcp, Rcc=Rcc,
        b_dp=-g_dp, onehot=onehot, chain_c=chain_c, chain_T=chain_T,
        st_s=st_s, st_R=st_R, st_G=st_G, st_phi=st_phi,
    )


# --------------------------------------------------------------------------
# Damped Schur step
# --------------------------------------------------------------------------


def _damp_blocks(Hb: jax.Array, lam, floor: float) -> jax.Array:
    """H + lam * diag(max(diag(H), floor)) for (..., 3, 3)/(...,6,6) blocks."""
    d = jnp.diagonal(Hb, axis1=-2, axis2=-1)
    dd = lam * jnp.maximum(d, floor)
    n = Hb.shape[-1]
    return Hb + dd[..., None] * jnp.eye(n, dtype=Hb.dtype)


def chain_pose_bands(sys: NormalSystem):
    """The chain-row -> pose-column coupling as its three nonzero bands,
    row-aligned: (diag[k] -> col k, up[k] -> col k+1, down[k] -> col k-1),
    each (W, ND, 3, 6)."""
    Z1 = jnp.zeros_like(sys.Rpc[:1])
    P_f = jnp.concatenate([sys.Rpp, Z1], axis=0)   # row j   -> col j
    P_fp = jnp.concatenate([sys.Rpc, Z1], axis=0)  # row j   -> col j+1
    C_p = jnp.concatenate([Z1, sys.Rcp], axis=0)   # row j+1 -> col j
    C_f = jnp.concatenate([Z1, sys.Rcc], axis=0)   # row j+1 -> col j+1
    return P_f + C_f, P_fp, C_p


def chain_pose_columns(sys: NormalSystem) -> jax.Array:
    """Assemble the (W, ND, 3, W, 6) chain-row -> pose-column coupling
    tensor CC from the three row-aligned bands."""
    W_ = sys.Ad.shape[0]
    dtype = sys.Ad.dtype
    diag, up, down = chain_pose_bands(sys)
    eyeW = jnp.eye(W_, dtype=dtype)
    upW = jnp.eye(W_, k=1, dtype=dtype)            # [r, r+1] = 1
    dnW = jnp.eye(W_, k=-1, dtype=dtype)           # [r, r-1] = 1
    CC = (
        diag[:, :, :, None, :] * eyeW[:, None, None, :, None]
        + up[:, :, :, None, :] * upW[:, None, None, :, None]
        + down[:, :, :, None, :] * dnW[:, None, None, :, None]
    )
    return CC


def assemble_reduced(sys: NormalSystem, Hcc_d, Dmm_d,
                     d_cc, d_bc, d_cm, d_mm, d_bm):
    """Dense reduced system over {X (W,6), P (W,O,6)} from damped direct
    blocks minus the landmark-elimination corrections."""
    W_, O = Dmm_d.shape[:2]
    dtype = Hcc_d.dtype
    nc = 6 * W_
    nm = 6 * W_ * O
    n = nc + nm
    eyeW = jnp.eye(W_, dtype=dtype)
    eyeO = jnp.eye(O, dtype=dtype)

    Hmm = _es("koab,kl,op->koalpb", Dmm_d, eyeW, eyeO)
    S1a, S1b = eyeW[:-1], eyeW[1:]
    Hmm = Hmm + _es("joab,jk,jl,op->koalpb", sys.Omm1, S1a, S1b, eyeO)
    Hmm = Hmm + _es("joab,jk,jl,op->lpbkoa", sys.Omm1, S1a, S1b, eyeO)
    if W_ >= 3:
        S2a, S2b = eyeW[:-2], eyeW[2:]
        Hmm = Hmm + _es("joab,jk,jl,op->koalpb", sys.Omm2, S2a, S2b, eyeO)
        Hmm = Hmm + _es("joab,jk,jl,op->lpbkoa", sys.Omm2, S2a, S2b, eyeO)
    d_mm_six = _es("koagb,op->koagpb", d_mm, eyeO)
    Hmm = Hmm - d_mm_six

    Hred = jnp.zeros((n, n), dtype)
    Hred = Hred.at[:nc, :nc].set(Hcc_d.reshape(nc, nc) - d_cc)
    cm = d_cm.reshape(nc, nm)
    Hred = Hred.at[:nc, nc:].set(-cm)
    Hred = Hred.at[nc:, :nc].set(-cm.T)
    Hred = Hred.at[nc:, nc:].set(Hmm.reshape(nm, nm))
    Hred = 0.5 * (Hred + Hred.T)

    bred = jnp.concatenate(
        [sys.b_cam.reshape(nc) - d_bc, (sys.b_mot - d_bm).reshape(nm)]
    )

    # absolute floor so structurally-empty rows (inactive motion slots,
    # frames past the sequence end) keep the f32 Cholesky positive-definite;
    # their gradient is zero so their step stays exactly zero.
    dmax = jnp.max(jnp.abs(jnp.diagonal(Hred)))
    rel, tiny = _floor_consts(dtype)
    Hred = Hred + (rel * dmax + tiny) * jnp.eye(n, dtype=dtype)
    return Hred, bred


def schur_step(sys: NormalSystem, lam, floor: float, chain_solver=None,
               stable: bool | None = None, *, formulation: int,
               with_reduced: bool = False):
    """One damped Gauss-Newton step via landmark elimination.

    `with_reduced=True` additionally returns the assembled reduced system
    `(Hred, bred)` over {X (W,6), P (W,O,6)} — the fixed-lag boundary
    marginal is a Schur complement of it (`backend/fixed_lag.py`).

    `formulation` is REQUIRED (0 WorldMotion, 1 WorldPose) and must match
    the build function that produced `sys` (`build_normal_system` vs
    `build_normal_system_pose`): the stable branch orients its capacitance
    bands by it, and both builds emit identically-shaped arrays, so a
    mismatched flag would silently compute wrong corrections.

    Returns the tangent delta dict {X (W,6), P (W,O,6), sp (NS,3),
    dp (W,ND,3)} solving (H + lam D) delta = b; "P" is the per-object
    reduced pose (H for WorldMotion, L for WorldPose).

    The per-tracklet block-tridiagonal chains default to
    `chain_solve_ternary` (both formulations build scalar-diagonal /
    scaled-rotation chain blocks — see `NormalSystem.chain_c/chain_T`),
    whose cancellation-free elimination cannot go indefinite at small
    lambda.  `chain_solver(A, B, rhs)` overrides with a generic solver
    (`DYNO_SCHUR_TERNARY=0` selects the generic lane-major block-Thomas for
    A/B); the legacy distributed path substitutes the frame-sharded SPIKE
    solve (`parallel/schur_dist.py`).
    """
    if stable is None:
        # both formulations build the st_* square-root fields; pass
        # `formulation` so the stable branch picks the right band
        # orientation (WorldMotion: rotation on the CURRENT side, single
        # h-column band; WorldPose: rotation on the PREV side, +/- h-bands
        # on frames k-1/k)
        stable = _SCHUR_STABLE
    use_ternary = chain_solver is None and _TERNARY_CHAIN
    if chain_solver is None:
        chain_solver = (
            chain_solve_lanes if _CHAIN_LANES else chain_solve
        )
    W_, NS, _, _ = sys.Us.shape
    ND = sys.Ad.shape[1]
    O = sys.Dmm.shape[1]
    dtype = sys.Hcc.dtype
    nc = 6 * W_

    # ---- damp the full-system diagonal first (Schur of the damped system).
    # (A landmark-only lambda floor was tried and removed: like the global
    # floor it sacrificed the occasional lambda=1e-7 GN-quality steps that
    # the final accuracy depends on — BENCH_NOTES session 8.)
    Hll_s = _damp_blocks(sys.Hll_s, lam, floor)
    idx = jnp.arange(W_)
    diag_cc = sys.Hcc[idx, :, idx, :]                       # (W, 6, 6)
    Hcc = sys.Hcc.at[idx, :, idx, :].set(_damp_blocks(diag_cc, lam, floor))

    # ---- static elimination (cameras only) ------------------------------
    # RHS columns: all 6W camera couplings + the gradient column
    Us_t = jnp.swapaxes(sys.Us, -1, -2)                     # (W, NS, 3, 6)
    Us_cols = jnp.transpose(Us_t, (1, 2, 0, 3)).reshape(NS, 3, nc)
    rhs_s = jnp.concatenate([Us_cols, sys.b_sp[..., None]], axis=-1)
    Ys = _mm(_inv3(Hll_s), rhs_s)                           # (NS, 3, nc+1)
    Yc_s, yb_s = Ys[..., :nc], Ys[..., nc]
    d_cc_s = _es("knam,nmq->kaq", sys.Us, Yc_s).reshape(nc, nc)
    d_bc_s = _es("knam,nm->ka", sys.Us, yb_s).reshape(nc)

    oh = sys.onehot                                         # (W, ND, O)
    act = jnp.sum(oh, axis=-1)                              # (W, ND) 0/1
    eyeW = jnp.eye(W_, dtype=dtype)

    def _couple_dot(Brow, oh_row, Rdot):
        # Brow (W, ND, 3, 6) row blocks, oh_row (W, ND, O) row one-hot,
        # Rdot (W, ND*3, nc) activity-masked column operand.
        # The left operand is built DIRECTLY at its merged (k, d*i, o*a)
        # shape with tile/repeat index arithmetic:
        #     L[k, d*3+i, o*6+a] = Brow[k, d, i, a] * oh[k, d, o]
        # The obvious einsum ("kdia,kdo->kdiao" + reshape) materializes a
        # 5D intermediate whose (6, O) minor dims tile-pad (8, 128) ~21x —
        # at (10, 1024, 3, 6, 8) that is ~126 MB of HBM traffic per term
        # plus an equally large relayout reshape; the device trace showed
        # the four L builds + reshapes at ~40% of the whole window-10
        # solve.  All shapes here stay rank-3 with the merged minor on
        # lanes (48 -> 128 pad only).  Cross-object entries are exactly
        # zero (chains decouple where the factor mask cuts them), so the
        # single row-side one-hot selects the COLUMN object too — the
        # column side needs only the activity mask already folded into
        # Rdot.
        oh_i = jnp.repeat(oh_row, 3, axis=1)                # (k, d*i, O)
        Brow_r = Brow.reshape(W_, ND * 3, 6)
        L = jnp.tile(Brow_r, (1, 1, O)) * jnp.repeat(oh_i, 6, axis=2)
        out = jax.lax.dot_general(
            L, Rdot, (((1,), (1,)), ((0,), (0,))), precision="highest"
        )                                                   # (k, o*a, g*b)
        return out.reshape(W_, O, 6, W_, 6)

    if stable:
        # ---- STABLE dynamic elimination (Woodbury on the ternary factors)
        #
        # The subtractive elimination below forms Dmm/d_mm at the ternary
        # information scale wt/sigma_t^2 ~ 1e10 and cancels them in the
        # reduced assembly; the survivor is the observation-bounded motion
        # marginal (~1e4), below f32's ~1e3 absolute representation error
        # of the operands, so at lambda <= 1e-7 the reduced system goes
        # INDEFINITE and the LM iteration NaN-rejects (measured 4/10;
        # BENCH_NOTES sessions 8-9 — an f64 solve of the f32-built system
        # NaNs identically, proving the corruption happens at BUILD).
        #
        # This branch never forms the 1e10-scale blocks.  With the ternary
        # factor in square-root form (A~ z + B~ h + phi, all ~sqrt(wt)/
        # sigma ~ 1e5, exact in f32 to relative 1e-7) and Klam the damped
        # OBSERVATION-only z diagonal, the Woodbury identity on
        # Kz = Klam + A~^T A~ gives every reduced term as PRODUCTS through
        # the capacitance chain M = I + A~ Klam^-1 A~^T:
        #
        #   S_hh corr  = -B~^T M^-1 B~                      (additive PSD)
        #   S_xh corr  = -(A~ Klam^-1 U)^T M^-1 B~
        #   S_xx corr  = -U^T Klam^-1 U + (A~Klam^-1 U)^T M^-1 (A~Klam^-1 U)
        #   b_h  corr  = -B~^T M^-1 phi_hat,   phi_hat = A~Klam^-1 b_zo + phi
        #   b_x  corr  = -U^T Klam^-1 b_zo + (A~Klam^-1 U)^T M^-1 phi_hat
        #   dz = Klam^-1 [ (b_zo - U dx)
        #                  - A~^T M^-1 (A~Klam^-1(b_zo - U dx) + phi + B~ dh) ]
        #
        # (U = chain-to-camera obs coupling Rc, b_zo = observation-only z
        # gradient; every 1e10-scale cancellation above is resolved
        # ANALYTICALLY, so f32 carries only relative error of the final
        # quantities.)  M shares the scalar-diagonal/scaled-rotation block
        # structure, so its solve is the same lane-major machinery
        # (`chain_solve_scalar`), and the M-solve carries ALL columns at
        # once exactly like the old chain solve (2nc+1 columns).
        s = sys.st_s                                        # (W, ND)
        Rt = jnp.swapaxes(sys.st_R, -1, -2)
        Tn = jnp.concatenate(
            [sys.chain_T[1:], jnp.zeros_like(sys.chain_T[:1])], axis=0
        )
        alpha_z = sys.chain_c + sys.chain_T + Tn
        c_lam = sys.chain_c + lam * jnp.maximum(alpha_z, floor)
        inv_c = 1.0 / c_lam
        inv_c_prev = jnp.concatenate([inv_c[:1], inv_c[:-1]], axis=0)

        alpha_M = 1.0 + s * s * (inv_c_prev + inv_c)        # (W, ND)
        s_prev = jnp.concatenate([jnp.zeros_like(s[:1]), s[:-1]], axis=0)
        if formulation == 0:
            # M_{k-1,k} = -(s_{k-1} s_k / c_{k-1}) R_{k-1}^T
            eyeR = jnp.broadcast_to(jnp.eye(3, dtype=dtype), Rt[:1].shape)
            RM = jnp.concatenate([eyeR, Rt[:-1]], axis=0)
        else:
            # M_{k-1,k} = -(s_{k-1} s_k / c_{k-1}) rel_R_k^T
            RM = Rt
        B_M = -(s_prev * s * inv_c_prev)[..., None, None] * RM

        RcC = sys.Rc * inv_c[..., None, None]               # (W, ND, 3, 6)
        RcC_prev = jnp.concatenate(
            [jnp.zeros_like(RcC[:1]), RcC[:-1]], axis=0
        )
        bzoC = sys.b_dp * inv_c[..., None]                  # (W, ND, 3)
        bzoC_prev = jnp.concatenate(
            [jnp.zeros_like(bzoC[:1]), bzoC[:-1]], axis=0
        )
        Bcol = s[..., None, None] * sys.st_G
        dnW = jnp.eye(W_, k=-1, dtype=dtype)                # [k, k-1] = 1
        if formulation == 0:
            # A~_k = s_k [+I at m_{k-1}, -R_k^T at m_k]
            AU_prev = s[..., None, None] * RcC_prev         # col frame k-1
            AU_cur = -s[..., None, None] * _mm(Rt, RcC)     # col frame k
            phi_hat = s[..., None] * (
                bzoC_prev - _es("kdab,kdb->kda", Rt, bzoC)
            ) + sys.st_phi
            # B~_k = s_k G_k at the single h-column k
            Bcol_nc = (
                Bcol[:, :, :, None, :] * eyeW[:, None, None, :, None]
            ).reshape(W_, ND, 3, nc)
        else:
            # A~_k = s_k [-rel_R_k at m_{k-1}, +I at m_k]
            R = sys.st_R
            AU_prev = -s[..., None, None] * _mm(R, RcC_prev)
            AU_cur = s[..., None, None] * RcC
            phi_hat = s[..., None] * (
                bzoC - _es("kdab,kdb->kda", R, bzoC_prev)
            ) + sys.st_phi
            # B~_k = s_k [+G_k at h-col k-1, -G_k at h-col k]
            Bcol_nc = (
                Bcol[:, :, :, None, :] * dnW[:, None, None, :, None]
                - Bcol[:, :, :, None, :] * eyeW[:, None, None, :, None]
            ).reshape(W_, ND, 3, nc)
        AU_nc = (
            AU_prev[:, :, :, None, :] * dnW[:, None, None, :, None]
            + AU_cur[:, :, :, None, :] * eyeW[:, None, None, :, None]
        ).reshape(W_, ND, 3, nc)
        rhs_M = jnp.concatenate(
            [AU_nc, Bcol_nc, phi_hat[..., None]], axis=-1
        )                                                   # (W, ND, 3, 2nc+1)
        Z = chain_solve_scalar(alpha_M, B_M, rhs_M)
        Z_U = Z[..., :nc]                                   # (W, ND, 3, nc)
        Nh = Z[..., nc : 2 * nc].reshape(W_, ND, 3, W_, 6)
        Z_phi = Z[..., -1]                                  # (W, ND, 3)

        d_cc1 = _es("kdia,kd,kdib->kab", sys.Rc, inv_c, sys.Rc)
        d_cc1 = _es("kab,kl->kalb", d_cc1, eyeW).reshape(nc, nc)
        # multi-dim contraction — the (-1, nc) flatten forced a (30720, 60)
        # relayout copy worth ~0.33 ms/iter on the device trace
        d_cc2 = jax.lax.dot_general(
            AU_nc, Z_U,
            (((0, 1, 2), (0, 1, 2)), ((), ())), precision="highest",
        )
        d_cc_d = d_cc1 - d_cc2
        d_bc1 = _es("kdia,kdi->ka", sys.Rc, bzoC).reshape(nc)
        d_bc_d = d_bc1 - _es("kdic,kdi->c", AU_nc, Z_phi)

        Nh_act = Nh * jnp.swapaxes(act, 0, 1)[None, :, None, :, None]
        Rdot = Nh_act.reshape(W_, ND * 3, nc)
        cm_cur = _couple_dot(AU_cur, oh, Rdot)
        cm_prev = _couple_dot(AU_prev, oh, Rdot)            # camera row k-1
        d_cm = cm_cur.at[:-1].add(cm_prev[1:]).transpose(
            0, 2, 3, 1, 4
        ).reshape(nc, W_, O, 6)
        C_hh = _couple_dot(Bcol, oh, Rdot)
        bphi = _es("kdia,kdi,kdo->koa", Bcol, Z_phi, oh)
        Gsq = jnp.sum(sys.st_G**2, axis=2)                  # (W, ND, 6)
        dd_t = _es("kd,kdo,kda->koa", sys.chain_T, oh, Gsq)
        if formulation == 0:
            d_mm = -C_hh                                    # -S_hh correction
            d_bm = bphi
            ddiag_t = dd_t
        else:
            # B~'s rows live at h-frames k-1 (+) and k (-): shift the
            # factor-row-k terms accordingly (factor row 0 is masked)
            def _m1(x):
                return jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], 0)

            d_mm = -(_m1(C_hh) - C_hh)
            d_bm = _m1(bphi) - bphi
            ddiag_t = _m1(dd_t) + dd_t

        # Dmm damping uses the FULL diagonal (direct pose families +
        # motion/motion-pose) per damp-then-reduce semantics, but the
        # matrix itself stays smoothing/triplet-only — the stiff marginal
        # arrives additively via -d_mm = +B~^T M^-1 B~.
        diag_full = jnp.diagonal(sys.Dmm, axis1=-2, axis2=-1) + ddiag_t
        Dmm = sys.Dmm + (
            lam * jnp.maximum(diag_full, floor)
        )[..., None] * jnp.eye(6, dtype=dtype)
    else:
        Dmm = _damp_blocks(sys.Dmm, lam, floor)

        # ---- dynamic chain elimination (subtractive) ---------------------
        # RHS columns: 6W cameras (block l of chain-row k is Rc[k] iff
        # l == k) + 6W pose-frames via the 4-coupling tensor
        # (chain_pose_columns) + gradient.
        # NEGATIVE RESULT (tried 2026-08-19, do not retry): replacing the
        # 121 columns with the 3W identity columns and reconstructing Tc/Tm
        # from the tridiagonal-inverse blocks (Tc = G Rc, Tm = G x CC
        # bands) is exact in f64 but BOTH slower (64.8 vs 39.6 ms
        # window-10: the (3x3)@(3x6) reconstruction einsums lower as
        # serialized batched tiny matmuls) and less accurate in f32 (final
        # err 0.793 vs 0.603 at the 10-iteration budget: explicit-inverse
        # multiplication loses the backward stability of solving against
        # the actual columns).
        rhs_cam = (
            sys.Rc[:, :, :, None, :] * eyeW[:, None, None, :, None]
        ).reshape(W_, ND, 3, nc)
        CC = chain_pose_columns(sys)                        # (W, ND, 3, W, 6)
        rhs_d = jnp.concatenate(
            [rhs_cam, CC.reshape(W_, ND, 3, nc), sys.b_dp[..., None]],
            axis=-1,
        )                                                   # (W, ND, 3, 2nc+1)
        # damp the scalar diagonal exactly like _damp_blocks would
        Tn = jnp.concatenate(
            [sys.chain_T[1:], jnp.zeros_like(sys.chain_T[:1])], axis=0
        )
        alpha = sys.chain_c + sys.chain_T + Tn
        c_damped = sys.chain_c + lam * jnp.maximum(alpha, floor)
        if use_ternary:
            T = chain_solve_ternary(c_damped, sys.chain_T, sys.Bd, rhs_d)
        else:
            Ad = _damp_blocks(sys.Ad, lam, floor)
            try:
                # distributed SPIKE solvers take the scalar structure so
                # their interior elimination matches the single-chip
                # cancellation-free path bit-for-bit in spirit (the generic
                # Thomas carries ~1e-8 RELATIVE f64 error at the ternary
                # conditioning T/c ~ 1e8, which the 2-process equivalence
                # test measures as 1e-4-scale dX divergence)
                T = chain_solver(
                    Ad, sys.Bd, rhs_d, scalars=(c_damped, sys.chain_T)
                )
            except TypeError:
                T = chain_solver(Ad, sys.Bd, rhs_d)
        Tc = T[..., :nc]                                    # (W, ND, 3, nc)
        Tm = T[..., nc : 2 * nc].reshape(W_, ND, 3, W_, 6)
        tb = T[..., -1]                                     # (W, ND, 3)

        # camera-camera correction: row block (k, c) is Rc[k]
        d_cc_d = _es("kdic,kdib->kcb", sys.Rc, Tc).reshape(nc, nc)
        d_bc_d = _es("kdic,kdi->kc", sys.Rc, tb).reshape(nc)

        # camera-pose and pose-pose corrections (see _couple_dot).
        # DISTRIBUTION NOTE: the track axis (d) is contracted inside each
        # dot and only the small (W, O, 6, W, 6) partials shift across
        # frames — shifting pre-contraction (W, ND, ...) tensors makes
        # GSPMD all-gather ~10 MB over the frame axis EVERY LM iteration
        # (measured via compiled-HLO collective dump, round 3).
        Tm_act = Tm * jnp.swapaxes(act, 0, 1)[None, :, None, :, None]
        Rdot = Tm_act.reshape(W_, ND * 3, nc)               # (k, d*i, g*b)

        diag_b, up_b, down_b = chain_pose_bands(sys)
        zoh = jnp.zeros_like(oh[:1])
        oh_next = jnp.concatenate([oh[1:], zoh], axis=0)    # oh[k+1] at k
        oh_prev = jnp.concatenate([zoh, oh[:-1]], axis=0)   # oh[k-1] at k

        # Rc[k,d] != 0 only for active chain rows, and any Tm-coupled
        # column frame g shares row k's segment/object, so oh[k,·] stands
        # in for the column one-hot oh[g,·] here too.
        d_cm = _couple_dot(sys.Rc, oh, Rdot).transpose(0, 2, 3, 1, 4).reshape(
            nc, W_, O, 6
        )

        d_mm = _couple_dot(diag_b, oh, Rdot)
        d_mm = d_mm.at[1:].add(_couple_dot(up_b, oh_next, Rdot)[:-1])
        d_mm = d_mm.at[:-1].add(_couple_dot(down_b, oh_prev, Rdot)[1:])
        b_diag = _es("kdia,kdi,kdo->koa", diag_b, tb, oh)
        b_up = _es("kdia,kdi,kdo->koa", up_b, tb, oh_next)
        b_down = _es("kdia,kdi,kdo->koa", down_b, tb, oh_prev)
        d_bm = b_diag.at[1:].add(b_up[:-1]).at[:-1].add(b_down[1:])

    # ---- assemble + solve the reduced system ----------------------------
    Hred, bred = assemble_reduced(
        sys, Hcc, Dmm, d_cc_s + d_cc_d, d_bc_s + d_bc_d, d_cm, d_mm, d_bm
    )
    # NEGATIVE RESULT (2026-08-19, do not retry in the subtractive path):
    # at lambda <= 1e-7 the f32 elimination cancels catastrophically and
    # the reduced system comes back INDEFINITE -> the Cholesky NaNs and LM
    # rejects.  A PD "escape hatch" (boost the reduced diagonal until the
    # factorization is finite) produces steps of the SAME corrupted
    # elimination — still rejected, or occasionally accepted garbage that
    # made algebraically-equivalent problems diverge.  The NaN-reject +
    # lambda ratchet is the correct guard THERE; the stable branch above
    # removes the cancellation instead.
    cho = jax.scipy.linalg.cho_factor(Hred)
    delta_p = jax.scipy.linalg.cho_solve(cho, bred)
    dc = delta_p[:nc]
    dm = delta_p[nc:].reshape(W_, O, 6)

    # ---- back-substitution ----------------------------------------------
    d_sp = yb_s - _es("nmq,q->nm", Yc_s, dc)
    dm_sel = _es("gdo,gob->gdb", oh, dm)                    # (W, ND, 6)
    if stable:
        v = (
            Z_phi
            - _es("kdic,c->kdi", Z_U, dc)
            + _es("kdigb,gdb->kdi", Nh, dm_sel)
        )
        v_next = jnp.concatenate([v[1:], jnp.zeros_like(v[:1])], axis=0)
        s_next = jnp.concatenate([s[1:], jnp.zeros_like(s[:1])], axis=0)
        if formulation == 0:
            Atv = (
                -s[..., None] * _es("kdab,kdb->kda", sys.st_R, v)
                + s_next[..., None] * v_next
            )
        else:
            RT_next = jnp.concatenate(
                [jnp.swapaxes(sys.st_R, -1, -2)[1:],
                 jnp.broadcast_to(jnp.eye(3, dtype=dtype),
                                  sys.st_R[:1].shape)],
                axis=0,
            )
            Atv = (
                s[..., None] * v
                - s_next[..., None] * _es("kdab,kdb->kda", RT_next, v_next)
            )
        r1 = sys.b_dp - _es("kdia,ka->kdi", sys.Rc, dc.reshape(W_, 6))
        d_dp = (r1 - Atv) * inv_c[..., None]
    else:
        d_dp = tb - _es("kdiq,q->kdi", Tc, dc) - _es(
            "kdigb,gdb->kdi", Tm, dm_sel
        )

    delta = {
        "X": dc.reshape(W_, 6),
        "P": dm,
        "sp": d_sp,
        "dp": d_dp,
    }
    if with_reduced:
        return delta, (Hred, bred)
    return delta


# --------------------------------------------------------------------------
# LM driver
# --------------------------------------------------------------------------


def lm_optimize_schur(
    values: dict,
    w: WindowData,
    masks: WindowMasks,
    cfg: BackendConfig,
    lm_cfg: LMConfig,
    anchor: SE3,
    formulation: int = 0,
    chain_solver=None,
    overrides: dict | None = None,
    anchor_prior_L=None,
) -> LMResult:
    """Levenberg-Marquardt with direct Schur steps (both formulations).

    Identical outer loop to `solver.lm_optimize` (IRLS robust weights frozen
    per linearization, accept/reject on the true robust cost, gtsam-style
    convergence tests) but each iteration solves the damped normal equations
    EXACTLY by landmark elimination + one dense Cholesky instead of PCG.
    The normal system is rebuilt only after an ACCEPTED step (a rejection
    changes lambda, not the linearization point), saving the whole Jacobian/
    einsum build on every retry.  The whole optimization is one
    `lax.while_loop` XLA program.

    `overrides` may replace the per-iteration pieces while keeping this LM
    schedule byte-identical — used by the explicit distributed path
    (`parallel/schur_dist.py`), whose residual/build/step work on
    shard-local arrays with hand-placed collectives:
      residual_fn(vals) -> res list; error_fn(res) -> scalar;
      build_fn(vals, sqrt_w, res0) -> system pytree;
      step_fn(sys, lam) -> delta dict {X, P, sp, dp}.
    """
    ov = overrides or {}
    if chain_solver is not None and _SCHUR_STABLE:
        # The system build is also stable-form (build_normal_system keeps
        # the ternary information exclusively in the st_* square-root
        # fields when _SCHUR_STABLE), and the stable schur_step branch
        # solves its own capacitance chains — a supplied chain_solver
        # (the legacy GSPMD SPIKE path) would be silently ignored.
        raise ValueError(
            "chain_solver overrides require the subtractive elimination: "
            "set DYNO_SCHUR_STABLE=0 (the stable Woodbury branch solves "
            "its own capacitance chains and ignores the override)"
        )
    if formulation == 0:
        spec = world_motion_families(cfg)
        residual_fn = lambda v: world_motion_residuals(
            v, w, masks, cfg, anchor, anchor_prior_L=anchor_prior_L
        )
        build_fn = build_normal_system
        pose_key = "H"
    else:
        spec = world_pose_families(cfg)
        residual_fn = lambda v: world_pose_residuals(
            v, w, masks, cfg, anchor, anchor_prior_L=anchor_prior_L
        )
        build_fn = build_normal_system_pose
        pose_key = "L"
    specs = spec.robust
    residual_fn = ov.get("residual_fn", residual_fn)
    error_fn = ov.get("error_fn", lambda res: total_error(res, specs))

    if "build_fn" in ov:
        def build(vals, res0):
            sqrt_w = [
                robust_sqrt_weights(r, s.k, s.kind) if s.kind != "none"
                else jnp.ones(r.shape[:-1], r.dtype)
                for r, s in zip(res0, specs)
            ]
            return ov["build_fn"](vals, sqrt_w, res0)
    else:
        def build(vals, res0):
            # res0 = residual_fn(vals), carried by the LM loop: an accepted
            # step's trial sweep doubles as the next linearization's residual
            # evaluation (1 residual sweep per iteration instead of 2)
            sqrt_w = [
                robust_sqrt_weights(r, s.k, s.kind) if s.kind != "none"
                else jnp.ones(r.shape[:-1], r.dtype)
                for r, s in zip(res0, specs)
            ]
            return build_fn(vals, sqrt_w, w, masks, cfg, anchor, res0,
                            anchor_prior_L=anchor_prior_L)

    res_init = residual_fn(values)
    err_init = error_fn(res_init)

    sys_shapes = jax.eval_shape(build, values, res_init)
    sys0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), sys_shapes)

    def cond(state):
        vals, res_c, sys_c, rebuild, lam, lam_min, err, prev_err, it, done = state
        return (it < lm_cfg.max_iterations) & (~done)

    step_fn = ov.get(
        "step_fn",
        lambda sys, lam: schur_step(
            sys, lam, lm_cfg.diag_floor, chain_solver,
            stable=_SCHUR_STABLE, formulation=formulation,
        ),
    )

    def body(state):
        vals, res_c, sys_c, rebuild, lam, lam_min, err, prev_err, it, done = state
        sys = jax.lax.cond(rebuild, lambda: build(vals, res_c), lambda: sys_c)
        delta = step_fn(sys, lam)
        delta = {
            "X": delta["X"], pose_key: delta["P"],
            "sp": delta["sp"], "dp": delta["dp"],
        }
        new_vals = retract_tree(vals, delta)
        new_res = residual_fn(new_vals)
        new_err = error_fn(new_res)
        # a failed Cholesky (NaN step) must reject, not poison the state
        step_nan = ~jnp.isfinite(new_err)
        new_err = jnp.where(step_nan, jnp.inf, new_err)
        accept = new_err < err

        if _NAN_RATCHET:
            # ratchet only on a non-finite STEP (failed Cholesky /
            # indefinite reduced system) — a residual overflow at large
            # lambda is a plain divergent trial and must not permanently
            # raise lam_min, or later GN-quality low-lambda steps get
            # capped for the rest of the window
            delta_nan = ~(
                jnp.isfinite(jnp.sum(delta["X"]))
                & jnp.isfinite(jnp.sum(delta[pose_key]))
            )
            lam_min = jnp.where(
                delta_nan,
                jnp.maximum(lam_min, lam * lm_cfg.lambda_factor),
                lam_min,
            )

        vals_out = jax.tree.map(
            lambda a, b_: jnp.where(accept, a, b_), new_vals, vals
        )
        res_out = [
            jnp.where(accept, a, b_) for a, b_ in zip(new_res, res_c)
        ]
        err_out = jnp.where(accept, new_err, err)
        lam_out = jnp.where(
            accept,
            jnp.maximum(lam / lm_cfg.lambda_factor, lam_min),
            jnp.minimum(lam * lm_cfg.lambda_factor, lm_cfg.max_lambda),
        )
        rel_ok = jnp.abs(err - err_out) < lm_cfg.rel_error_tol * jnp.maximum(
            err, 1e-30
        )
        abs_ok = jnp.abs(err - err_out) < lm_cfg.abs_error_tol
        done_out = (accept & (rel_ok | abs_ok)) | (lam_out >= lm_cfg.max_lambda)
        return (
            vals_out, res_out, sys, accept, lam_out, lam_min, err_out, err,
            it + 1, done_out,
        )

    lam0 = jnp.asarray(lm_cfg.initial_lambda, jnp.float32)
    lam_min0 = jnp.asarray(lm_cfg.min_lambda, jnp.float32)
    state = (
        values, list(res_init), sys0, jnp.asarray(True), lam0, lam_min0,
        err_init, err_init, jnp.asarray(0, jnp.int32), jnp.asarray(False),
    )
    vals, _, _, _, lam, _, err, _, iters, done = jax.lax.while_loop(
        cond, body, state
    )
    return LMResult(
        values=vals,
        error=err,
        initial_error=err_init,
        iterations=iters,
        lam=lam,
        converged=done,
    )
