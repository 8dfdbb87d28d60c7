"""Batched homography RANSAC for static-track geometric verification.

The reference verifies KLT static tracks with `cv::findHomography(RANSAC)`
(`src/frontend/vision/StaticFeatureTracker.cc:506`).  Here all K 4-point
DLT hypotheses are solved at once: with Hartley normalization (essential in
f32), the 8x9 DLT systems become a batched eigen-decomposition of A^T A
(K, 9, 9), and inlier scoring is one batched transfer-error computation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def _normalize(p: jax.Array, w: jax.Array):
    """Hartley normalization: similarity T with mean 0, RMS sqrt(2).

    p: (..., N, 2), w: (..., N) weights.  Returns (p_norm, T (...,3,3)).
    """
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    mean = jnp.einsum("...n,...nd->...d", w, p) / wsum
    centered = p - mean[..., None, :]
    rms = jnp.sqrt(
        jnp.einsum("...n,...n->...", w, jnp.sum(centered**2, axis=-1))
        / wsum[..., 0]
    )
    s = jnp.sqrt(2.0) / jnp.maximum(rms, 1e-9)
    p_norm = centered * s[..., None, None]
    z = jnp.zeros_like(s)
    o = jnp.ones_like(s)
    T = jnp.stack(
        [
            jnp.stack([s, z, -s * mean[..., 0]], axis=-1),
            jnp.stack([z, s, -s * mean[..., 1]], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
    return p_norm, T


def _dlt_rows(p: jax.Array, q: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted DLT constraint rows for p -> q: (..., 2N, 9)."""
    x, y = p[..., 0], p[..., 1]
    u, v = q[..., 0], q[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -o, z, z, z, u * x, u * y, u], axis=-1)
    r2 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], axis=-1)
    rows = jnp.concatenate([r1, r2], axis=-2)
    w2 = jnp.concatenate([w, w], axis=-1)[..., None]
    return rows * w2


def homography_from_points(
    p: jax.Array, q: jax.Array, w: Optional[jax.Array] = None,
    method: str = "eigh",
) -> jax.Array:
    """Weighted least-squares homography p -> q; (..., N, 2) -> (..., 3, 3).

    Hartley-normalized DLT.  method:
      * "eigh"  — nullspace via batched `eigh` of A^T A (the textbook
        estimator; fine for ONE refit, but batched eigh on many tiny
        blocks lowers to a serialized iterative TPU kernel);
      * "solve" — gauge-fix h9 = 1 and solve the 8x8 normal equations
        with the closed-form block-Schur inverse (`ops/linalg.inv_spd`)
        — exact for minimal sets, pure fused arithmetic, used for the
        RANSAC hypothesis batch.  Degenerate h9~0 homographies come out
        non-finite/huge and are discarded by the caller's transfer-error
        gate (same contract as a reflective RANSAC hypothesis).
    """
    if w is None:
        w = jnp.ones(p.shape[:-1], p.dtype)
    pn, Tp = _normalize(p, w)
    qn, Tq = _normalize(q, w)
    A = _dlt_rows(pn, qn, w)
    if method == "solve":
        from .linalg import inv_spd

        A8 = A[..., :8]
        a9 = A[..., 8]
        M = jnp.einsum("...ni,...nj->...ij", A8, A8, precision="highest")
        b = -jnp.einsum("...ni,...n->...i", A8, a9, precision="highest")
        tr = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None]
        M = M + (1e-7 * tr / 8.0) * jnp.eye(8, dtype=M.dtype)
        h8 = jnp.einsum(
            "...ij,...j->...i", inv_spd(M), b, precision="highest"
        )
        h = jnp.concatenate(
            [h8, jnp.ones((*h8.shape[:-1], 1), h8.dtype)], axis=-1
        )
    else:
        AtA = jnp.einsum("...ni,...nj->...ij", A, A, precision="highest")
        _, vecs = jnp.linalg.eigh(AtA)
        h = vecs[..., :, 0]
    Hn = h.reshape(*h.shape[:-1], 3, 3)
    # denormalize: H = Tq^-1 Hn Tp  (Tq^-1 in closed form — Tq is a
    # similarity, but the adjugate is simpler than special-casing)
    from .linalg import inv3

    H = jnp.einsum(
        "...ij,...jk->...ik", inv3(Tq), Hn @ Tp, precision="highest"
    )
    return H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) < 1e-12, 1.0, H[..., 2:3, 2:3])


def transfer_error(H: jax.Array, p: jax.Array, q: jax.Array) -> jax.Array:
    """Forward transfer error |Hp - q| (..., N)."""
    ph = jnp.concatenate([p, jnp.ones((*p.shape[:-1], 1), p.dtype)], axis=-1)
    qp = jnp.einsum("...ij,...nj->...ni", H, ph, precision="highest")
    w = qp[..., 2]
    w_safe = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    proj = qp[..., :2] / w_safe[..., None]
    err = jnp.linalg.norm(proj - q, axis=-1)
    return jnp.where(jnp.abs(w) < 1e-9, jnp.inf, err)


class HomographyResult(NamedTuple):
    H: jax.Array        # (3, 3)
    inliers: jax.Array  # (N,) bool
    n_inliers: jax.Array


def ransac_homography(
    key,
    p: jax.Array,
    q: jax.Array,
    valid: jax.Array,
    iters: int = 200,
    threshold: float = 3.0,
) -> HomographyResult:
    """Robust homography p -> q; inliers under forward transfer error."""
    from .ransac import sample_valid_indices

    idx = sample_valid_indices(key, valid, iters, 4)     # (K, 4), sort-free
    # closed-form 8x8 solve per minimal set (no batched-eigh TPU kernel)
    Hs = homography_from_points(p[idx], q[idx], method="solve")
    err = transfer_error(Hs, p[None], q[None])           # (K, N)
    inl = (err < threshold) & valid[None]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    # weighted refit on the best inlier set
    w_in = inl[best].astype(p.dtype)
    H_ref = homography_from_points(p, q, w_in)
    err_f = transfer_error(H_ref, p, q)
    inl_f = (err_f < threshold) & valid
    # keep the refit only if it didn't lose inliers (degenerate sets)
    better = jnp.sum(inl_f) >= scores[best]
    H_out = jnp.where(better, H_ref, Hs[best])
    inl_out = jnp.where(better, inl_f, inl[best])
    return HomographyResult(H_out, inl_out, jnp.sum(inl_out))
