"""Batched essential-matrix estimation (2d2d relative pose).

The OpenGV-replacement for the reference's 2d-2d ego-motion mode (Nister
5-pt / 2-pt RANSAC, `EgoMotionSolver::geometricOutlierRejection2d2d`,
`src/frontend/vision/MotionSolver.cc:111-200`).  TPU formulation: all K
8-point hypotheses solved at once — the 8x9 DLT systems become one batched
eigendecomposition, rank-2 projection one batched SVD, and scoring one
Sampson-error einsum.  Decomposition to (R, t) tests the four candidates by
batched cheirality voting.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import CameraParams
from ..core.lie import SE3

_MIN_SET = 8


def normalize_points(cam: CameraParams, uv: jax.Array) -> jax.Array:
    """Pixels -> normalized image coordinates (bearing xy at z=1)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y], axis=-1)


def _epipolar_rows(p: jax.Array, q: jax.Array) -> jax.Array:
    """Rows of the epipolar constraint q^T E p = 0 for normalized coords.

    p, q: (..., N, 2) -> (..., N, 9) with E raveled row-major.
    """
    x1, y1 = p[..., 0], p[..., 1]
    x2, y2 = q[..., 0], q[..., 1]
    o = jnp.ones_like(x1)
    return jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], axis=-1
    )


def essential_from_points(p: jax.Array, q: jax.Array) -> jax.Array:
    """Least-squares essential matrix (..., 3, 3) with rank-2 projection."""
    A = _epipolar_rows(p, q)
    AtA = jnp.einsum("...ni,...nj->...ij", A, A, precision="highest")
    _, vecs = jnp.linalg.eigh(AtA)
    E = vecs[..., :, 0].reshape(*AtA.shape[:-2], 3, 3)
    U, S, Vt = jnp.linalg.svd(E)
    s = (S[..., 0] + S[..., 1]) * 0.5
    S2 = jnp.stack([s, s, jnp.zeros_like(s)], axis=-1)
    return jnp.einsum("...ij,...j,...jk->...ik", U, S2, Vt)


def sampson_error(E: jax.Array, p: jax.Array, q: jax.Array) -> jax.Array:
    """First-order geometric (Sampson) error (..., N) in normalized coords."""
    ph = jnp.concatenate([p, jnp.ones((*p.shape[:-1], 1), p.dtype)], axis=-1)
    qh = jnp.concatenate([q, jnp.ones((*q.shape[:-1], 1), q.dtype)], axis=-1)
    Ep = jnp.einsum("...ij,...nj->...ni", E, ph, precision="highest")
    Etq = jnp.einsum("...ji,...nj->...ni", E, qh, precision="highest")
    num = jnp.einsum("...ni,...ni->...n", qh, Ep) ** 2
    den = (
        Ep[..., 0] ** 2 + Ep[..., 1] ** 2 + Etq[..., 0] ** 2 + Etq[..., 1] ** 2
    )
    return num / jnp.maximum(den, 1e-12)


def decompose_essential(E: jax.Array, p: jax.Array, q: jax.Array, valid):
    """E -> relative pose (R, t) with |t| = 1 by cheirality voting.

    Returns an SE3 mapping frame-1 points into frame-2: x2 ~ R x1 + t.
    """
    U, _, Vt = jnp.linalg.svd(E)
    d = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    U = U * jnp.where(d < 0, -1.0, 1.0)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]

    def count_in_front(R, tt):
        # triangulate by midpoint depth test (linear depth from two views)
        ph = jnp.concatenate([p, jnp.ones((*p.shape[:-1], 1), p.dtype)], -1)
        qh = jnp.concatenate([q, jnp.ones((*q.shape[:-1], 1), q.dtype)], -1)
        Rp = jnp.einsum("ij,nj->ni", R, ph)
        # depth of x1 from: lambda2 q = lambda1 R p + t  (solve 2 eqs)
        a = Rp
        b = qh
        # cross products to eliminate lambda2: (q x (R p)) l1 = -(q x t)
        cx = jnp.cross(b, a)
        ct = jnp.cross(b, jnp.broadcast_to(tt, b.shape))
        l1 = -jnp.einsum("ni,ni->n", cx, ct) / jnp.maximum(
            jnp.einsum("ni,ni->n", cx, cx), 1e-12
        )
        x1 = ph * l1[:, None]
        x2 = jnp.einsum("ij,nj->ni", R, x1) + tt
        ok = (x1[:, 2] > 0) & (x2[:, 2] > 0) & valid
        return jnp.sum(ok)

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    votes = jnp.stack([count_in_front(R, tt) for R, tt in cands])
    best = jnp.argmax(votes)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return SE3(Rs[best], ts[best])


class EpipolarResult(NamedTuple):
    rel_pose: SE3        # x2 ~ R x1 + t, |t| = 1 (scale-free)
    E: jax.Array
    inliers: jax.Array
    n_inliers: jax.Array


def ransac_essential(
    key,
    uv1: jax.Array,
    uv2: jax.Array,
    valid: jax.Array,
    cam: CameraParams,
    iters: int = 200,
    threshold: float = 2e-4,   # Sampson, normalized coords (ref 2d2d default)
) -> EpipolarResult:
    p = normalize_points(cam, uv1)
    q = normalize_points(cam, uv2)
    from .ransac import sample_valid_indices

    idx = sample_valid_indices(key, valid, iters, _MIN_SET)  # sort-free
    Es = essential_from_points(p[idx], q[idx])            # (K, 3, 3)
    err = sampson_error(Es, p[None], q[None])             # (K, N)
    inl = (err < threshold) & valid[None]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    # refit on best inliers (weighted by zeroing outlier rows is wrong for
    # the epipolar rows too -> weight the rows)
    w_in = inl[best].astype(p.dtype)
    A = _epipolar_rows(p, q) * w_in[:, None]
    AtA = jnp.einsum("ni,nj->ij", A, A, precision="highest")
    _, vecs = jnp.linalg.eigh(AtA)
    E_ref = vecs[:, 0].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(E_ref)
    s = (S[0] + S[1]) * 0.5
    E_ref = U @ jnp.diag(jnp.asarray([s, s, 0.0], E_ref.dtype)) @ Vt
    err_f = sampson_error(E_ref, p, q)
    inl_f = (err_f < threshold) & valid
    better = jnp.sum(inl_f) >= scores[best]
    E_out = jnp.where(better, E_ref, Es[best])
    inl_out = jnp.where(better, inl_f, inl[best])
    rel = decompose_essential(E_out, p, q, inl_out)
    return EpipolarResult(rel, E_out, inl_out, jnp.sum(inl_out))


def triangulate_depth_ref(rel: SE3, p: jax.Array, q: jax.Array) -> jax.Array:
    """Depth of each reference point along its bearing given x2 ~ R x1 + t.

    From lambda2 q = lambda1 R p + t, eliminating lambda2 with cross
    products: (q x (R p)) lambda1 = -(q x t).  p, q are normalized coords
    (N, 2); returns lambda1 (N,) — the z-depth of the point in frame 1.
    """
    ph = jnp.concatenate([p, jnp.ones((*p.shape[:-1], 1), p.dtype)], -1)
    qh = jnp.concatenate([q, jnp.ones((*q.shape[:-1], 1), q.dtype)], -1)
    Rp = jnp.einsum("ij,nj->ni", rel.R, ph, precision="highest")
    cx = jnp.cross(qh, Rp)
    ct = jnp.cross(qh, jnp.broadcast_to(rel.t, qh.shape))
    return -jnp.einsum("ni,ni->n", cx, ct) / jnp.maximum(
        jnp.einsum("ni,ni->n", cx, cx), 1e-12
    )


def scale_from_depth(
    rel: SE3,
    p: jax.Array,
    q: jax.Array,
    depth_ref: jax.Array,
    valid: jax.Array,
):
    """Metric scale for a unit-baseline relative pose from measured depth.

    2d2d solves are scale-free (|t| = 1); with an RGB-D/stereo depth channel
    the reference recovers metric translation implicitly by using 3d solvers
    instead — for the 2d2d mode we recover it as the median ratio of
    measured to triangulated reference depth over the inliers.  Returns
    (scale, ok): ok False when too few valid depths support the estimate.
    """
    lam = triangulate_depth_ref(rel, p, q)
    good = valid & (lam > 1e-3) & (depth_ref > 0)
    ratio = jnp.where(good, depth_ref / jnp.maximum(lam, 1e-6), jnp.nan)
    scale = jnp.nanmedian(ratio)
    ok = jnp.sum(good) >= 5
    return jnp.where(ok, scale, 1.0), ok


def ransac_translation_given_rot(
    key,
    uv1: jax.Array,
    uv2: jax.Array,
    valid: jax.Array,
    cam: CameraParams,
    R: jax.Array,
    iters: int = 200,
    threshold: float = 2e-4,
) -> EpipolarResult:
    """2-point relative translation with known rotation.

    The analog of the reference's 2-pt mono mode
    (`TranslationOnlySacProblem` with `adapter.setR12`,
    `src/frontend/vision/MotionSolver.cc:161-177`): with R given (IMU /
    motion prior), each correspondence constrains t linearly via
    q^T hat(t) (R p) = 0  <=>  ((R p) x q) . t = 0, so two correspondences
    determine t (up to scale) as the cross product of their constraint
    rows.  Batched: all K 2-point hypotheses at once, scored by Sampson
    error of E = hat(t) R.
    """
    p = normalize_points(cam, uv1)
    q = normalize_points(cam, uv2)
    n = p.shape[0]
    ph = jnp.concatenate([p, jnp.ones((n, 1), p.dtype)], -1)
    qh = jnp.concatenate([q, jnp.ones((n, 1), q.dtype)], -1)
    Rp = jnp.einsum("ij,nj->ni", R, ph, precision="highest")
    rows = jnp.cross(Rp, qh)                               # (N, 3)

    from .ransac import sample_valid_indices

    idx = sample_valid_indices(key, valid, iters, 2)       # sort-free
    t_raw = jnp.cross(rows[idx[:, 0]], rows[idx[:, 1]])    # (K, 3)
    # A duplicate draw (idx[:,0]==idx[:,1], prob ~1/m per hypothesis) gives
    # cross(r, r) = 0, which would survive normalization as t = 0 and make
    # E = hat(0) R = 0 score EVERY point as an inlier (sampson 0/eps = 0).
    # Unlike the 3-point rigid solver there is no collinearity gate here,
    # so degenerate hypotheses must be excluded from the vote explicitly.
    t_norm = jnp.linalg.norm(t_raw, axis=-1, keepdims=True)
    ok_h = t_norm[:, 0] > 1e-9                             # (K,)
    t_hyp = t_raw / jnp.maximum(t_norm, 1e-12)

    def hat(t):
        z = jnp.zeros_like(t[..., 0])
        return jnp.stack(
            [
                jnp.stack([z, -t[..., 2], t[..., 1]], -1),
                jnp.stack([t[..., 2], z, -t[..., 0]], -1),
                jnp.stack([-t[..., 1], t[..., 0], z], -1),
            ],
            -2,
        )

    Es = jnp.einsum("kij,jl->kil", hat(t_hyp), R)          # (K, 3, 3)
    err = sampson_error(Es, p[None], q[None])
    inl = (err < threshold) & valid[None]
    scores = jnp.where(ok_h, jnp.sum(inl, axis=-1), -1)
    best = jnp.argmax(scores)

    # least-squares refit of t on the best inliers: min |diag(w) rows t|
    w_in = inl[best].astype(p.dtype)
    A = rows * w_in[:, None]
    AtA = jnp.einsum("ni,nj->ij", A, A, precision="highest")
    _, vecs = jnp.linalg.eigh(AtA)
    t_ref = vecs[:, 0]
    t_ref = t_ref / jnp.maximum(jnp.linalg.norm(t_ref), 1e-12)
    E_ref = hat(t_ref) @ R
    err_f = sampson_error(E_ref, p, q)
    inl_f = (err_f < threshold) & valid
    better = jnp.sum(inl_f) >= scores[best]
    t_out = jnp.where(better, t_ref, t_hyp[best])
    inl_out = jnp.where(better, inl_f, inl[best])
    E_out = hat(t_out) @ R

    # cheirality: majority of inliers must triangulate in front
    rel = SE3(R, t_out)
    lam = triangulate_depth_ref(rel, p, q)
    front = jnp.sum((lam > 0) & inl_out)
    back = jnp.sum((lam < 0) & inl_out)
    t_out = jnp.where(front >= back, t_out, -t_out)
    return EpipolarResult(SE3(R, t_out), E_out, inl_out, jnp.sum(inl_out))
