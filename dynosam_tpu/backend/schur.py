"""Direct reduced (Schur-complement) solver for the WorldMotion window.

The round-1 matrix-free LM runs preconditioned CG over the FULL variable set
{X, H, sp, dp} (~16k dims for a 10-frame window at capacity).  This module
implements the classical bundle-adjustment alternative the reference gets
from gtsam's sparse elimination (`gtsam::LevenbergMarquardtOptimizer` with
COLAMD ordering, `src/backend/RGBDBackendModule.cc:201-234`): eliminate the
landmark blocks in closed form and solve the small dense reduced system over
the poses/motions only.

TPU shape of the elimination (no sparse matrices, no orderings):

  * Exact per-factor Jacobian blocks come from `jax.jacfwd` of each factor
    residual wrt zero tangents, vmapped over the (frame x slot) factor grid —
    by construction consistent with the `se3_retract` parametrization the
    rest of the solver uses.
  * Static points have independent 3x3 normal blocks -> a batched 3x3 solve
    eliminates all NS of them at once.
  * Dynamic tracklets are block-tridiagonal chains along frames (pose-to-
    point on the diagonal, the ternary motion factor coupling (m_{k-1}, m_k)
    and H_k) -> one vmapped block-Thomas `lax.scan` with a multi-column RHS
    (all 6W camera + 6W motion coupling columns AND the gradient column)
    eliminates every chain simultaneously.
  * The reduced 6x6-block Hessian over {X_k (W), H_k^j (W x O)} — a few
    hundred dims — is assembled with dense masked einsums (object scatter by
    one-hot) and solved by ONE dense Cholesky on the MXU.
  * Landmark updates are recovered by back-substitution through the same
    chain solves.

Levenberg damping is applied to the FULL system diagonal before reduction
(damp-then-reduce == Schur complement of the damped system), so each LM
iteration is an exact damped Gauss-Newton step of the IRLS-weighted problem.

All contractions run at `precision="highest"` — bf16-class accumulation in
the normal equations visibly corrupts the recovered rotations on TPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.lie import SE3, se3_compose, se3_inverse, se3_retract
from ..ops import factors
from ..ops.robust import robust_sqrt_weights
from ..utils.config import BackendConfig
from .formulation import WindowMasks, world_motion_families, world_motion_residuals
from .map import WindowData
from .solver import LMConfig, LMResult, retract_tree, total_error

_es = functools.partial(jnp.einsum, precision="highest")
_mm = functools.partial(jnp.matmul, precision="highest")


# --------------------------------------------------------------------------
# Block-tridiagonal chain solve (matrix RHS)
# --------------------------------------------------------------------------


def _inv3(M: jax.Array) -> jax.Array:
    """Closed-form (adjugate) inverse of batched 3x3 SPD blocks.

    Inside the block-Thomas scan an LU `linalg.solve` per step is
    dispatch-bound on TPU; the adjugate turns each step into a handful of
    fused elementwise ops.  Conditioning is bounded by the capped ternary
    weight (<= ~1e5 in f32), well within adjugate accuracy.
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


# --------------------------------------------------------------------------
# Normal system (exact AD Jacobian blocks + IRLS weights)
# --------------------------------------------------------------------------


class NormalSystem(NamedTuple):
    """All blocks of J^T W J and -J^T W r for one WorldMotion window."""

    Hcc: jax.Array      # (W, 6, W, 6) direct camera-camera
    Dmm: jax.Array      # (W, O, 6, 6) direct motion diag blocks
    Omm: jax.Array      # (W-1, O, 6, 6) motion (k, k+1) coupling (smoothing)
    b_cam: jax.Array    # (W, 6)
    b_mot: jax.Array    # (W, O, 6)
    Hll_s: jax.Array    # (NS, 3, 3) static point blocks (undamped)
    Us: jax.Array       # (W, NS, 6, 3) camera-static couplings
    b_sp: jax.Array     # (NS, 3)
    Ad: jax.Array       # (W, ND, 3, 3) chain diag blocks (undamped)
    Bd: jax.Array       # (W, ND, 3, 3) chain (k-1, k) coupling
    Rc: jax.Array       # (W, ND, 3, 6)  chain-row k -> camera k
    Rm1: jax.Array      # (W-1, ND, 3, 6) chain-row j -> motion j+1
    Rm2: jax.Array      # (W-1, ND, 3, 6) chain-row j+1 -> motion j+1
    b_dp: jax.Array     # (W, ND, 3)
    onehot: jax.Array   # (W, ND, O) ternary object one-hot per (frame, track)


def _select_motions(H: SE3, masks: WindowMasks, w: WindowData):
    """Per-(frame, track) motion SE3 via one-hot (identity where inactive)."""
    no_ = H.batch_shape[1]
    onehot = jax.nn.one_hot(
        jnp.where(masks.ternary, w.dyn_obj, -1), no_, dtype=H.t.dtype
    )                                                      # (W, ND, O)
    Hk = SE3(
        _es("wno,woij->wnij", onehot, H.R),
        _es("wno,woj->wnj", onehot, H.t),
    )
    eye = jnp.eye(3, dtype=H.t.dtype)
    sel = jnp.any(onehot > 0, axis=-1)[..., None, None]
    return SE3(jnp.where(sel, Hk.R, eye), Hk.t), onehot


def build_normal_system(
    values: dict,
    sqrt_w: list,
    w: WindowData,
    masks: WindowMasks,
    cfg: BackendConfig,
    anchor: SE3,
    res0: list,
) -> NormalSystem:
    X: SE3 = values["X"]
    H: SE3 = values["H"]
    sp = values["sp"]
    dp = values["dp"]
    dtype = sp.dtype
    W_, O = masks.smoothing.shape
    z6 = jnp.zeros(6, dtype)
    z3 = jnp.zeros(3, dtype)
    r_anchor, r_odo, r_static, r_dyn, r_tern, r_smooth = res0

    pose_sigma = jnp.asarray(
        [cfg.odometry_rotation_sigma] * 3 + [cfg.odometry_translation_sigma] * 3,
        dtype,
    )
    smooth_sigma = jnp.asarray(
        [cfg.constant_object_motion_rotation_sigma] * 3
        + [cfg.constant_object_motion_translation_sigma] * 3,
        dtype,
    )

    # ---- effective per-factor weights: IRLS robust weight x activation mask
    # (sigma whitening lives inside the residual functions, hence the AD
    # Jacobians).  Family order matches `world_motion_residuals`.
    wgt_odo = masks.odometry[1:].astype(dtype)
    wgt_static = sqrt_w[2] ** 2 * masks.static_obs.astype(dtype)
    wgt_dyn = sqrt_w[3] ** 2 * masks.dyn_obs.astype(dtype)
    wgt_tern = sqrt_w[4] ** 2 * masks.ternary[1:].astype(dtype)
    wgt_smooth = masks.smoothing[1:].astype(dtype)

    # f32 guard (same rationale as varpro._chain_blocks): the true ternary
    # information (1/sigma^2 ~ 1e10) swamps the observation terms and makes
    # the chain elimination catastrophically cancel in f32.  Cap the ternary
    # weight used in the HESSIAN blocks; the GRADIENT keeps the true weight,
    # so the step remains a descent direction of the true cost (any SPD
    # model Hessian does) and LM's accept test guards convergence.
    cap = cfg.dynamic_point_noise_sigma**2 * 1e3 / (
        cfg.motion_ternary_factor_noise_sigma**2
    )
    wgt_tern_h = wgt_tern * jnp.minimum(jnp.asarray(cap, dtype), 1.0)

    # ---- exact Jacobian blocks by per-factor forward AD ------------------
    def _j_p2p(Xk: SE3, p, z, sigma):
        def f(xi, dm):
            return (
                factors.pose_to_point_residual(se3_retract(Xk, xi), p + dm, z)
                / sigma
            )

        return jax.jacfwd(f, argnums=(0, 1))(z6, z3)

    Jx_s, Jm_s = jax.vmap(
        jax.vmap(_j_p2p, in_axes=(None, 0, 0, None)),
        in_axes=(0, None, 0, None),
    )(X, sp, w.static_xyz, cfg.static_point_noise_sigma)   # (W,NS,3,6),(W,NS,3,3)

    Jx_d, Jm_d = jax.vmap(
        jax.vmap(_j_p2p, in_axes=(None, 0, 0, None)),
        in_axes=(0, 0, 0, None),
    )(X, dp, w.dyn_xyz, cfg.dynamic_point_noise_sigma)     # (W,ND,3,6),(W,ND,3,3)

    H_sel, onehot = _select_motions(H, masks, w)
    Hc = SE3(H_sel.R[1:], H_sel.t[1:])                     # (W-1, ND)

    def _j_tern(Hkd: SE3, mp, mc):
        def f(hx, d1, d2):
            return (
                factors.landmark_motion_ternary_residual(
                    mp + d1, mc + d2, se3_retract(Hkd, hx)
                )
                / cfg.motion_ternary_factor_noise_sigma
            )

        return jax.jacfwd(f, argnums=(0, 1, 2))(z6, z3, z3)

    Jh, Jp, Jc = jax.vmap(jax.vmap(_j_tern))(Hc, dp[:-1], dp[1:])
    # Jh: (W-1,ND,3,6); Jp, Jc: (W-1,ND,3,3)

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
        return (
            factors.prior_residual(se3_retract(X[0], a), anchor)
            / cfg.initial_pose_prior_sigma
        )

    J_anchor = jax.jacfwd(f_anchor)(z6)                    # (6, 6)

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

    # ---- direct pose blocks ---------------------------------------------
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
    Dcam = _es("kn,knra,knrb->kab", wgt_static, Jx_s, Jx_s) + _es(
        "kn,knra,knrb->kab", wgt_dyn, Jx_d, Jx_d
    )
    Hcc = Hcc.at[idx, :, idx, :].add(Dcam)

    g_cam = jnp.zeros((W_, 6), dtype)
    g_cam = g_cam.at[0].add(_es("ra,r->a", J_anchor, r_anchor[0]))
    g_cam = g_cam.at[:-1].add(_es("k,kra,kr->ka", wgt_odo, Ja_o, r_odo))
    g_cam = g_cam.at[1:].add(_es("k,kra,kr->ka", wgt_odo, Jb_o, r_odo))
    g_cam = g_cam + _es("kn,knra,knr->ka", wgt_static, Jx_s, r_static)
    g_cam = g_cam + _es("kn,knra,knr->ka", wgt_dyn, Jx_d, r_dyn)
    b_cam = -g_cam

    oh1 = onehot[1:]                                       # (W-1, ND, O)
    Dmm = jnp.zeros((W_, O, 6, 6), dtype)
    Dmm = Dmm.at[1:].add(
        _es("jd,jdo,jdra,jdrb->joab", wgt_tern_h, oh1, Jh, Jh)
    )
    Dmm = Dmm.at[:-1].add(_es("ko,kora,korb->koab", wgt_smooth, Ja_s, Ja_s))
    Dmm = Dmm.at[1:].add(_es("ko,kora,korb->koab", wgt_smooth, Jb_s, Jb_s))
    Omm = _es("ko,kora,korb->koab", wgt_smooth, Ja_s, Jb_s)

    g_mot = jnp.zeros((W_, O, 6), dtype)
    g_mot = g_mot.at[1:].add(
        _es("jd,jdo,jdra,jdr->joa", wgt_tern, oh1, Jh, r_tern)
    )
    g_mot = g_mot.at[:-1].add(
        _es("ko,kora,kor->koa", wgt_smooth, Ja_s, r_smooth)
    )
    g_mot = g_mot.at[1:].add(
        _es("ko,kora,kor->koa", wgt_smooth, Jb_s, r_smooth)
    )
    b_mot = -g_mot

    # ---- static landmark blocks -----------------------------------------
    eye3 = jnp.eye(3, dtype=dtype)
    Hll_s = _es("kn,knra,knrb->nab", wgt_static, Jm_s, Jm_s) + 1e-8 * eye3
    Us = _es("kn,knra,knrb->knab", wgt_static, Jx_s, Jm_s)  # (W, NS, 6, 3)
    b_sp = -_es("kn,knra,knr->na", wgt_static, Jm_s, r_static)

    # ---- dynamic chain blocks -------------------------------------------
    Ad = _es("kd,kdra,kdrb->kdab", wgt_dyn, Jm_d, Jm_d)
    Tpp = _es("jd,jdra,jdrb->jdab", wgt_tern_h, Jp, Jp)
    Tcc_ = _es("jd,jdra,jdrb->jdab", wgt_tern_h, Jc, Jc)
    Tpc = _es("jd,jdra,jdrb->jdab", wgt_tern_h, Jp, Jc)
    Ad = Ad.at[:-1].add(Tpp)
    Ad = Ad.at[1:].add(Tcc_)
    Ad = Ad + 1e-8 * eye3
    Bd = jnp.concatenate([jnp.zeros_like(Tpc[:1]), Tpc], axis=0)

    Rc = _es("kd,kdra,kdrb->kdab", wgt_dyn, Jm_d, Jx_d)     # (W, ND, 3, 6)
    Rm1 = _es("jd,jdra,jdrb->jdab", wgt_tern_h, Jp, Jh)     # (W-1, ND, 3, 6)
    Rm2 = _es("jd,jdra,jdrb->jdab", wgt_tern_h, Jc, Jh)

    g_dp = _es("kd,kdra,kdr->kda", wgt_dyn, Jm_d, r_dyn)
    g_dp = g_dp.at[:-1].add(_es("jd,jdra,jdr->jda", wgt_tern, Jp, r_tern))
    g_dp = g_dp.at[1:].add(_es("jd,jdra,jdr->jda", wgt_tern, Jc, r_tern))
    b_dp = -g_dp

    return NormalSystem(
        Hcc=Hcc, Dmm=Dmm, Omm=Omm, b_cam=b_cam, b_mot=b_mot,
        Hll_s=Hll_s, Us=Us, b_sp=b_sp,
        Ad=Ad, Bd=Bd, Rc=Rc, Rm1=Rm1, Rm2=Rm2, b_dp=b_dp, onehot=onehot,
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


def schur_step(sys: NormalSystem, lam, floor: float):
    """One damped Gauss-Newton step via landmark elimination.

    Returns the tangent delta dict {X (W,6), H (W,O,6), sp (NS,3),
    dp (W,ND,3)} solving (H + lam D) delta = b.
    """
    W_, NS, _, _ = sys.Us.shape
    ND = sys.Ad.shape[1]
    O = sys.Dmm.shape[1]
    dtype = sys.Hcc.dtype
    nc = 6 * W_

    # ---- damp the full-system diagonal first (Schur of the damped system)
    Ad = _damp_blocks(sys.Ad, lam, floor)
    Hll_s = _damp_blocks(sys.Hll_s, lam, floor)
    idx = jnp.arange(W_)
    diag_cc = sys.Hcc[idx, :, idx, :]                       # (W, 6, 6)
    Hcc = sys.Hcc.at[idx, :, idx, :].set(_damp_blocks(diag_cc, lam, floor))
    Dmm = _damp_blocks(sys.Dmm, lam, floor)

    # ---- static elimination (cameras only) ------------------------------
    # RHS columns: all 6W camera couplings + the gradient column
    Us_t = jnp.swapaxes(sys.Us, -1, -2)                     # (W, NS, 3, 6)
    Us_cols = jnp.transpose(Us_t, (1, 2, 0, 3)).reshape(NS, 3, nc)
    rhs_s = jnp.concatenate([Us_cols, sys.b_sp[..., None]], axis=-1)
    Ys = jnp.linalg.solve(Hll_s, rhs_s)                     # (NS, 3, nc+1)
    Yc_s, yb_s = Ys[..., :nc], Ys[..., nc]
    d_cc_s = _es("knam,nmq->kaq", sys.Us, Yc_s).reshape(nc, nc)
    d_bc_s = _es("knam,nm->ka", sys.Us, yb_s).reshape(nc)

    # ---- dynamic chain elimination --------------------------------------
    # RHS columns: 6W cameras + 6W motion-frames + gradient.  Camera column
    # block l of chain-row k is Rc[k] iff l == k; the motion column block
    # f = j+1 appears in chain-rows j (Rm1) and j+1 (Rm2).
    eyeW = jnp.eye(W_, dtype=dtype)
    shiftW = jnp.eye(W_, k=1, dtype=dtype)                  # [r, r+1] = 1
    rhs_cam = (
        sys.Rc[:, :, :, None, :] * eyeW[:, None, None, :, None]
    ).reshape(W_, ND, 3, nc)
    Rm1_rows = jnp.concatenate(
        [sys.Rm1, jnp.zeros_like(sys.Rm1[:1])], axis=0
    )                                                       # row j holds Rm1[j]
    Rm2_rows = jnp.concatenate(
        [jnp.zeros_like(sys.Rm2[:1]), sys.Rm2], axis=0
    )                                                       # row j+1 holds Rm2[j]
    rhs_mot = (
        Rm1_rows[:, :, :, None, :] * shiftW[:, None, None, :, None]
        + Rm2_rows[:, :, :, None, :] * eyeW[:, None, None, :, None]
    ).reshape(W_, ND, 3, nc)
    rhs_d = jnp.concatenate(
        [rhs_cam, rhs_mot, sys.b_dp[..., None]], axis=-1
    )                                                       # (W, ND, 3, 2nc+1)
    T = chain_solve(Ad, sys.Bd, rhs_d)
    Tc = T[..., :nc]                                        # (W, ND, 3, nc)
    Tm = T[..., nc : 2 * nc].reshape(W_, ND, 3, W_, 6)
    tb = T[..., -1]                                         # (W, ND, 3)

    # camera-camera correction: row block (k, c) is Rc[k]
    d_cc_d = _es("kdic,kdib->kcb", sys.Rc, Tc).reshape(nc, nc)
    d_bc_d = _es("kdic,kdi->kc", sys.Rc, tb).reshape(nc)

    # camera-motion correction with object scatter on the column frame
    oh = sys.onehot                                         # (W, ND, O)
    d_cm = _es(
        "kdic,kdigb,gdo->kcgob", sys.Rc, Tm, oh
    ).reshape(nc, W_, O, 6)

    # motion-motion correction.  Row (f=j+1) couples through Rm1[j] (chain
    # row j) and Rm2[j] (chain row j+1).  Cross-object entries are exactly
    # zero (a track's chain decouples where the ternary mask cuts it), so
    # scatter rows and columns with the SAME object one-hot.
    mm_rows = _es("jdia,jdigb->jdagb", sys.Rm1, Tm[:-1]) + _es(
        "jdia,jdigb->jdagb", sys.Rm2, Tm[1:]
    )                                                       # (W-1, ND, 6, W, 6)
    d_mm = _es("jdagb,jdo,gdo->joagb", mm_rows, oh[1:], oh)
    d_bm = _es("jdia,jdi,jdo->joa", sys.Rm1, tb[:-1], oh[1:]) + _es(
        "jdia,jdi,jdo->joa", sys.Rm2, tb[1:], oh[1:]
    )

    # ---- assemble the reduced system ------------------------------------
    nm = 6 * W_ * O
    n = nc + nm
    eyeO = jnp.eye(O, dtype=dtype)
    Hmm = _es("koab,kl,op->koalpb", Dmm, eyeW, eyeO)
    S1 = eyeW[:-1]                                          # j -> frame j
    S2 = eyeW[1:]                                           # j -> frame j+1
    Hmm = Hmm + _es("joab,jk,jl,op->koalpb", sys.Omm, S1, S2, eyeO)
    Hmm = Hmm + _es("joab,jk,jl,op->lpbkoa", sys.Omm, S1, S2, eyeO)
    # subtract the same-object chain correction (rows at frames 1..W-1)
    d_mm_full = jnp.zeros((W_, O, 6, W_, 6), dtype)
    d_mm_full = d_mm_full.at[1:].set(d_mm)
    d_mm_six = _es("koagb,op->koagpb", d_mm_full, eyeO)
    Hmm = Hmm - d_mm_six

    Hred = jnp.zeros((n, n), dtype)
    Hred = Hred.at[:nc, :nc].set(
        Hcc.reshape(nc, nc) - d_cc_s - d_cc_d
    )
    cm = d_cm.reshape(nc, nm)
    Hred = Hred.at[:nc, nc:].set(-cm)
    Hred = Hred.at[nc:, :nc].set(-cm.T)
    Hred = Hred.at[nc:, nc:].set(Hmm.reshape(nm, nm))
    Hred = 0.5 * (Hred + Hred.T)

    bred = jnp.concatenate(
        [
            sys.b_cam.reshape(nc) - d_bc_s - d_bc_d,
            (sys.b_mot - d_bm_pad(d_bm, W_)).reshape(nm),
        ]
    )

    # absolute floor so structurally-empty rows (inactive motion slots,
    # frames past the sequence end) keep the f32 Cholesky positive-definite;
    # their gradient is zero so their step stays exactly zero.
    dmax = jnp.max(jnp.abs(jnp.diagonal(Hred)))
    Hred = Hred + (1e-7 * dmax + 1e-8) * jnp.eye(n, dtype=dtype)

    cho = jax.scipy.linalg.cho_factor(Hred)
    delta_p = jax.scipy.linalg.cho_solve(cho, bred)
    dc = delta_p[:nc]
    dm = delta_p[nc:].reshape(W_, O, 6)

    # ---- back-substitution ----------------------------------------------
    d_sp = yb_s - _es("nmq,q->nm", Yc_s, dc)
    dm_sel = _es("gdo,gob->gdb", oh, dm)                    # (W, ND, 6)
    d_dp = tb - _es("kdiq,q->kdi", Tc, dc) - _es(
        "kdigb,gdb->kdi", Tm, dm_sel
    )

    return {
        "X": dc.reshape(W_, 6),
        "H": dm,
        "sp": d_sp,
        "dp": d_dp,
    }


def d_bm_pad(d_bm: jax.Array, W_: int) -> jax.Array:
    """Embed the (W-1, O, 6) motion gradient correction at frames 1..W-1."""
    return jnp.concatenate([jnp.zeros_like(d_bm[:1]), d_bm], axis=0)


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
) -> LMResult:
    """Levenberg-Marquardt on the WorldMotion window with direct Schur steps.

    Identical outer loop to `solver.lm_optimize` (IRLS robust weights frozen
    per linearization, accept/reject on the true robust cost, gtsam-style
    convergence tests) but each iteration solves the damped normal equations
    EXACTLY by landmark elimination + one dense Cholesky instead of PCG.
    The whole optimization is one `lax.while_loop` XLA program.
    """
    spec = world_motion_families(cfg)
    specs = spec.robust

    def residual_fn(vals):
        return world_motion_residuals(vals, w, masks, cfg, anchor)

    res_init = residual_fn(values)
    err_init = total_error(res_init, specs)

    def cond(state):
        vals, lam, err, prev_err, it, done = state
        return (it < lm_cfg.max_iterations) & (~done)

    def body(state):
        vals, lam, err, prev_err, it, done = state
        res0 = residual_fn(vals)
        sqrt_w = [
            robust_sqrt_weights(r, s.k, s.kind) if s.kind != "none"
            else jnp.ones(r.shape[:-1], r.dtype)
            for r, s in zip(res0, specs)
        ]
        sys = build_normal_system(vals, sqrt_w, w, masks, cfg, anchor, res0)
        delta = schur_step(sys, lam, lm_cfg.diag_floor)
        new_vals = retract_tree(vals, delta)
        new_err = total_error(residual_fn(new_vals), specs)
        # a failed Cholesky (NaN step) must reject, not poison the state
        new_err = jnp.where(jnp.isfinite(new_err), new_err, jnp.inf)
        accept = new_err < err

        vals_out = jax.tree.map(
            lambda a, b_: jnp.where(accept, a, b_), new_vals, vals
        )
        err_out = jnp.where(accept, new_err, err)
        lam_out = jnp.where(
            accept,
            jnp.maximum(lam / lm_cfg.lambda_factor, lm_cfg.min_lambda),
            jnp.minimum(lam * lm_cfg.lambda_factor, lm_cfg.max_lambda),
        )
        rel_ok = jnp.abs(err - err_out) < lm_cfg.rel_error_tol * jnp.maximum(
            err, 1e-30
        )
        abs_ok = jnp.abs(err - err_out) < lm_cfg.abs_error_tol
        done_out = (accept & (rel_ok | abs_ok)) | (lam_out >= lm_cfg.max_lambda)
        return (vals_out, lam_out, err_out, err, it + 1, done_out)

    lam0 = jnp.asarray(lm_cfg.initial_lambda, jnp.float32)
    state = (
        values, lam0, err_init, err_init,
        jnp.asarray(0, jnp.int32), jnp.asarray(False),
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
