"""Vectorized RANSAC rigid-motion solvers — the OpenGV replacement.

The reference solves ego/object motion with OpenGV sample-consensus loops
(Kneip PnP / Arun 3-point, <=500 iterations, probability-based early stop;
`frontend/vision/MotionSolver-inl.hpp:45-87`,
`src/frontend/vision/MotionSolver.cc:111-536`).  A sequential
hypothesize-and-verify loop is hostile to TPUs, so this module runs the
*fixed-iteration batched* equivalent:

  1. sample all K minimal sets at once (Gumbel top-k over the validity mask
     — no replacement inside a set),
  2. solve all K minimal sets with the closed-form orthonormal-triad
     alignment (`rigid_from_minimal` — exact for rigid sets, no batched
     SVD kernel; degenerate sets are masked out of the vote),
  3. score all K x N residuals in one einsum (3D distance or 2D
     reprojection, matching the reference's 3d3d / 3d2d modes),
  4. pick the argmax-inlier hypothesis and polish it with a fixed number of
     Gauss-Newton steps on the inliers (6x6 dense solves).

With K = `ransac_iterations` (500) this evaluates the *same* number of
hypotheses as the reference's worst case, but as three batched kernels.
Everything vmaps over objects, so per-object motion solving is one fused
computation instead of the reference's TBB task loop
(`RGBDInstanceFrontendModule.cc:297-315`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.camera import CameraParams, project_local
from ..core.lie import (
    SE3,
    se3_apply,
    se3_exp,
    se3_inverse,
    se3_retract,
)

# TrackingStatus analog (`MotionSolver.hpp:102-110`)
STATUS_VALID = 0
STATUS_FEW_MATCHES = 1
STATUS_INVALID = 2

_MIN_SET = 3  # minimal set for 3D rigid alignment


class RansacResult(NamedTuple):
    pose: SE3            # best model T (src -> dst frame)
    inliers: jax.Array   # (N,) bool
    n_inliers: jax.Array # () int32
    status: jax.Array    # () int32 TrackingStatus


def procrustes(src: jax.Array, dst: jax.Array, w: jax.Array) -> SE3:
    """Weighted rigid alignment: T = argmin sum w_i ||dst_i - T src_i||^2.

    src/dst: (..., N, 3), w: (..., N).  Closed-form Kabsch/Arun (the same
    estimator OpenGV's 3-point Arun solver uses).  Batched SVD on (...,3,3).
    """
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    wn = w / wsum
    c_src = jnp.einsum("...n,...nd->...d", wn, src)
    c_dst = jnp.einsum("...n,...nd->...d", wn, dst)
    src0 = src - c_src[..., None, :]
    dst0 = dst - c_dst[..., None, :]
    # covariance H = sum w dst0 src0^T  (3x3)
    Hcov = jnp.einsum("...n,...ni,...nj->...ij", wn, dst0, src0,
                      precision="highest")
    U, _, Vt = jnp.linalg.svd(Hcov)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    D = jnp.concatenate(
        [
            jnp.ones((*det.shape, 2), det.dtype),
            det[..., None],
        ],
        axis=-1,
    )
    R = jnp.einsum("...ij,...j,...jk->...ik", U, D, Vt,
                   precision="highest")
    t = c_dst - jnp.einsum("...ij,...j->...i", R, c_src, precision="highest")
    return SE3(R, t)


def rigid_from_minimal(src3: jax.Array, dst3: jax.Array):
    """(..., 3, 3) three-point correspondences -> (SE3, ok).

    Orthonormal-triad alignment: build right-handed frames from the two
    edge vectors on each side and compose R = F E^T — EXACT for rigid
    noise-free minimal sets (all a RANSAC hypothesis needs; the inlier
    GN polish does the least-squares part).  Entirely closed-form batched
    arithmetic: `jnp.linalg.svd` on small batched blocks lowers to a
    serialized iterative kernel on TPU (the same failure mode as batched
    `linalg.solve`, see backend/schur._inv3), and SVD-free Kabsch
    variants (polar iteration) cannot work here because a centered
    3-point covariance is always rank-2.  `ok=False` flags (near-)
    collinear sets; reflective correspondences yield a proper rotation
    that misaligns the out-of-plane axis and scores ~0 inliers.
    """
    a1 = src3[..., 1, :] - src3[..., 0, :]
    a2 = src3[..., 2, :] - src3[..., 0, :]
    b1 = dst3[..., 1, :] - dst3[..., 0, :]
    b2 = dst3[..., 2, :] - dst3[..., 0, :]

    def triad(u, v):
        nu = jnp.linalg.norm(u, axis=-1, keepdims=True)
        e1 = u / jnp.maximum(nu, 1e-12)
        w = v - jnp.sum(v * e1, axis=-1, keepdims=True) * e1
        nw = jnp.linalg.norm(w, axis=-1, keepdims=True)
        e2 = w / jnp.maximum(nw, 1e-12)
        e3 = jnp.cross(e1, e2)
        # relative gate: nw/nu is sin(angle) * |v|/|u| — 1e-4 rejects
        # exactly/floating-point-collinear sets (f32 residue ~1e-7 rel)
        # while keeping any geometrically usable triangle
        ok = (nu[..., 0] > 1e-9) & (nw[..., 0] > 1e-4 * nu[..., 0])
        return jnp.stack([e1, e2, e3], axis=-1), ok   # columns

    E, ok_e = triad(a1, a2)
    F, ok_f = triad(b1, b2)
    R = jnp.einsum("...ij,...kj->...ik", F, E, precision="highest")
    c_src = jnp.mean(src3, axis=-2)
    c_dst = jnp.mean(dst3, axis=-2)
    t = c_dst - jnp.einsum("...ij,...j->...i", R, c_src, precision="highest")
    return SE3(R, t), ok_e & ok_f


def sample_valid_indices(key, valid, iters: int, k: int):
    """(iters, k) hypothesis indices drawn uniformly from the valid slots
    by inverse-CDF on the cumulative valid count — sort-free.

    `valid` must be 1-D (asserted); batched calls should vmap.  If NO slot
    is valid (m == 0) the returned indices are arbitrary in-range slots —
    callers must gate on their own validity/inlier counts (all do: the
    minimal solvers' votes see zero valid inliers and the result is
    discarded upstream by min_inliers).

    The previous Gumbel-top-k sampler lowered to an (iters, N) stable
    variadic SORT per RANSAC call (~0.6 ms/frame across the per-object
    solves on the TPU device trace); the rank lookup here is one
    compare-and-count VPU reduction.  Draws are independent, so a minimal
    set may repeat a slot with probability ~k(k-1)/(2m) — a repeated row
    makes the minimal solve degenerate, which the callers must reject via
    collinearity gates / degeneracy-masked votes (the same fate OpenGV
    hands a degenerate sample), so distinctness is not worth a sort."""
    assert valid.ndim == 1, "sample_valid_indices expects a 1-D mask; vmap for batches"
    n = valid.shape[-1]
    c = jnp.cumsum(valid.astype(jnp.int32), axis=-1)   # rank of slot i
    m = c[-1]
    u = jax.random.randint(key, (iters, k), 0, jnp.maximum(m, 1))
    # index of the (u+1)-th valid slot == #[prefix counts <= u]
    idx = jnp.sum(
        (c[None, None, :] <= u[..., None]).astype(jnp.int32), axis=-1
    )
    return jnp.minimum(idx, n - 1)


def _sample_minimal_sets(key, valid, iters: int):
    """(iters, 3) indices drawn uniformly from valid slots."""
    return sample_valid_indices(key, valid, iters, _MIN_SET)


def ransac_rigid(
    key,
    src: jax.Array,          # (N, 3) points in frame A
    dst: jax.Array,          # (N, 3) points in frame B (3d3d) — may be dummy
    valid: jax.Array,        # (N,) bool
    iters: int = 500,
    threshold: float = 0.1,  # 3D inlier distance OR pixel threshold (reproj)
    uv: Optional[jax.Array] = None,       # (N, 2) observed pixels (3d2d mode)
    cam: Optional[CameraParams] = None,
    refine_steps: int = 5,
    min_inliers: int = 5,
    score_cap: Optional[int] = None,
) -> RansacResult:
    """Robustly estimate T with dst ~ T(src).

    3d3d mode (uv None): inlier test ||dst - T src|| < threshold — the
    analog of `geometricOutlierRejection3d3d` (Arun).
    3d2d mode (uv given): `dst` must still hold 3D hypotheses-support points
    (e.g. backprojected current-frame depth); scoring and refinement use the
    reprojection pi(T^-1 ... ) of `src` against `uv` with a pixel threshold —
    the analog of `geometricOutlierRejection3d2d` (Kneip PnP), with the
    camera convention T = ^w X_c so that src (world) maps into the camera by
    T^-1.  (reference: `MotionSolver.cc:202-429`)

    `score_cap`: compact the valid slots to the front and run the whole
    solve (sampling, K x N scoring, GN polish) on the first `score_cap`
    rows only, scattering the inlier mask back to pool coordinates at the
    end.  The ego pool is NS + ND slots (6144) with ~1000 live — the
    (K, N, 3) hypothesis-transform intermediates are HBM-bound and scale
    with the POOL, not the live count (round-5 trace: ~0.6 ms/frame).
    Equivalent to the uncapped solve whenever n_valid <= score_cap
    (compaction preserves slot order, but sampled minimal-set indices map
    through the permutation, so draws differ — statistically identical).
    """
    n_pool = src.shape[0]
    scatter_order = None
    if score_cap is not None and n_pool > score_cap:
        order = jnp.argsort(~valid, stable=True)[:score_cap]
        src = src[order]
        dst = dst[order]
        if uv is not None:
            uv = uv[order]
        valid = valid[order]
        scatter_order = order
    idx = _sample_minimal_sets(key, valid, iters)               # (K, 3)
    src_min = src[idx]                                          # (K, 3, 3)
    dst_min = dst[idx]
    # closed-form triad alignment: all-K hypothesis rotations without the
    # serialized batched-SVD TPU kernel; degenerate minimal sets are
    # masked out of the vote below
    hyp, proper = rigid_from_minimal(src_min, dst_min)          # (K,) SE3

    reproj = uv is not None
    if reproj:
        # procrustes maps src(world) -> dst(camera); the camera pose we
        # score with is its inverse (^wX_c with p_cam = X^-1 p_w).
        hyp = se3_inverse(hyp)

    def residuals_for(T: SE3):
        if reproj:
            # broadcast: T batch (K,), src (N,3) -> (K, N, 3): R^T (src - t)
            p_cam = jnp.einsum("kij,knj->kni", jnp.swapaxes(T.R, -1, -2),
                               src[None] - T.t[:, None, :],
                               precision="highest")
            pred, z = project_local(cam, p_cam)
            err = jnp.linalg.norm(pred - uv[None], axis=-1)
            err = jnp.where(z > 0.05, err, jnp.inf)
        else:
            moved = jnp.einsum("kij,nj->kni", T.R, src,
                               precision="highest") + T.t[:, None, :]
            err = jnp.linalg.norm(moved - dst[None], axis=-1)
        return err                                              # (K, N)

    err = residuals_for(hyp)
    inl = (err < threshold) & valid[None, :] & proper[:, None]
    scores = jnp.sum(inl, axis=-1)                              # (K,)
    best = jnp.argmax(scores)
    best_pose = SE3(hyp.R[best], hyp.t[best])
    best_inl = inl[best]
    n_inl = scores[best]

    # ---- polish: fixed GN iterations on the inlier set
    def gn_step(T: SE3, _):
        if reproj:
            p_cam = se3_apply(se3_inverse(T), src)
            pred, z = project_local(cam, p_cam)
            r = (pred - uv).reshape(-1)                          # (2N,)
            wrow = (best_inl & (z > 0.05)).astype(src.dtype)
            w2 = jnp.repeat(wrow, 2)

            def res_fn(xi):
                Ti = se3_retract(T, xi)
                p_c = se3_apply(se3_inverse(Ti), src)
                pr, _ = project_local(cam, p_c)
                return (pr - uv).reshape(-1)
        else:
            moved = se3_apply(T, src)
            r = (moved - dst).reshape(-1)
            w2 = jnp.repeat(best_inl.astype(src.dtype), 3)

            def res_fn(xi):
                return (se3_apply(se3_retract(T, xi), src) - dst).reshape(-1)

        J = jax.jacfwd(res_fn)(jnp.zeros(6, src.dtype))          # (D, 6)
        Jw = J * w2[:, None]
        mm = lambda a, b: jnp.matmul(a, b, precision="highest")
        A = mm(Jw.T, J) + 1e-6 * jnp.eye(6, dtype=src.dtype)
        g = mm(Jw.T, r[:, None])[:, 0]
        # closed-form SPD inverse: an LU `linalg.solve` inside the GN scan
        # serializes on TPU (see ops/linalg.py)
        from .linalg import inv_spd

        xi = -jnp.einsum("ij,j->i", inv_spd(A), g, precision="highest")
        return se3_retract(T, xi), None

    refined, _ = jax.lax.scan(gn_step, best_pose, None, length=refine_steps)

    # recompute inliers under the refined model
    if reproj:
        p_cam = se3_apply(se3_inverse(refined), src)
        pred, z = project_local(cam, p_cam)
        final_err = jnp.linalg.norm(pred - uv, axis=-1)
        final_err = jnp.where(z > 0.05, final_err, jnp.inf)
    else:
        final_err = jnp.linalg.norm(se3_apply(refined, src) - dst, axis=-1)
    final_inl = (final_err < threshold) & valid
    n_final = jnp.sum(final_inl)

    n_valid = jnp.sum(valid)
    status = jnp.where(
        n_valid < _MIN_SET + 2,
        STATUS_FEW_MATCHES,
        jnp.where(n_final >= min_inliers, STATUS_VALID, STATUS_INVALID),
    ).astype(jnp.int32)

    # fall back to identity if invalid
    ok = status == STATUS_VALID
    pose = SE3(
        jnp.where(ok, refined.R, jnp.eye(3, dtype=src.dtype)),
        jnp.where(ok, refined.t, jnp.zeros(3, src.dtype)),
    )
    inliers = final_inl & ok
    if scatter_order is not None:
        inliers = (
            jnp.zeros((n_pool,), bool).at[scatter_order].set(inliers)
        )
    return RansacResult(pose, inliers, n_final, status)


def ransac_pose_3d2d(
    key,
    p_world: jax.Array,   # (N,3) landmarks in world (previous frame state)
    uv: jax.Array,        # (N,2) current observed pixels
    xyz_cur: jax.Array,   # (N,3) current backprojected (camera frame) support
    valid: jax.Array,
    cam: CameraParams,
    iters: int = 500,
    threshold_px: float = 2.0,
    refine_steps: int = 5,
    min_inliers: int = 5,
    score_cap: Optional[int] = None,
) -> RansacResult:
    """Camera-pose PnP: find ^wX_c with pi(X^-1 p_w) = uv.

    Hypotheses come from 3-point Procrustes between current camera-frame
    points and world landmarks (RGB-D gives us depth, so minimal alignment
    is cheaper and better-conditioned than P3P); scoring/refinement is pure
    3d2d reprojection like the reference's Kneip PnP path.
    """
    return ransac_rigid(
        key,
        src=p_world,
        dst=xyz_cur,
        valid=valid,
        iters=iters,
        threshold=threshold_px,
        uv=uv,
        cam=cam,
        refine_steps=refine_steps,
        min_inliers=min_inliers,
        score_cap=score_cap,
    )

