"""Closed-form batched small-matrix inverses.

Batched LAPACK-style kernels (`linalg.solve`/`inv`/`eigh`/`svd`) on many
tiny blocks lower to serialized iterative loops on TPU (measured 3x-24x
slowdowns — see CLAUDE.md and `backend/schur._inv3`).  Everything here is
pure fused elementwise arithmetic: adjugates for n <= 3, recursive 2x2
block-Schur for larger SPD blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.einsum("...ij,...jk->...ik", a, b, precision=_HP)


def inv2(M: jax.Array) -> jax.Array:
    """Batched closed-form inverse of (..., 2, 2)."""
    a, b = M[..., 0, 0], M[..., 0, 1]
    c, d = M[..., 1, 0], M[..., 1, 1]
    inv_det = 1.0 / (a * d - b * c)
    row0 = jnp.stack([d, -b], axis=-1)
    row1 = jnp.stack([-c, a], axis=-1)
    return jnp.stack([row0, row1], axis=-2) * inv_det[..., None, None]


def inv3(M: jax.Array) -> jax.Array:
    """Batched adjugate inverse of (..., 3, 3) (general, not just SPD)."""
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


def inv2_lanes(M: jax.Array) -> jax.Array:
    """Closed-form inverse of (..., 2, 2, N) — lane-major (batch minor)."""
    a, b = M[..., 0, 0, :], M[..., 0, 1, :]
    c, d = M[..., 1, 0, :], M[..., 1, 1, :]
    inv_det = 1.0 / (a * d - b * c)
    row0 = jnp.stack([d, -b], axis=-2)
    row1 = jnp.stack([-c, a], axis=-2)
    return jnp.stack([row0, row1], axis=-3) * inv_det[..., None, None, :]


def inv3_lanes(M: jax.Array) -> jax.Array:
    """Adjugate inverse of (..., 3, 3, N) — lane-major (batch minor)."""
    a, b, c = M[..., 0, 0, :], M[..., 0, 1, :], M[..., 0, 2, :]
    d, e, f = M[..., 1, 0, :], M[..., 1, 1, :], M[..., 1, 2, :]
    g, h, i = M[..., 2, 0, :], M[..., 2, 1, :], M[..., 2, 2, :]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-2),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-2),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-2),
        ],
        axis=-3,
    )
    return adj * inv_det[..., None, None, :]


def _mm_lanes(a, b):
    """(..., i, j, N) x (..., j, k, N) -> (..., i, k, N): VPU mul+reduce."""
    return jnp.sum(a[..., :, :, None, :] * b[..., None, :, :, :], axis=-3)


def _mmT_lanes(a, b):
    """(..., j, i, N) x (..., j, k, N) -> (..., i, k, N) (a transposed)."""
    return jnp.sum(a[..., :, :, None, :] * b[..., :, None, :, :], axis=-4)


def inv_spd_lanes(M: jax.Array) -> jax.Array:
    """Lane-major `inv_spd`: SPD blocks stored (..., n, n, N).

    Keeping the big batch axis N MINOR keeps every elementwise op and
    mul+reduce contraction at full 128-lane VPU occupancy — the (..., n, n)
    layout tiles the tiny n x n minors at ~n/128 lane utilization and
    makes XLA interleave relayout copies (measured in the frontend
    refiner loops, BENCH_NOTES session 5).
    """
    n = M.shape[-2]
    if n == 1:
        return 1.0 / M
    if n == 2:
        return inv2_lanes(M)
    if n == 3:
        return inv3_lanes(M)
    m = n // 2
    A = M[..., :m, :m, :]
    B = M[..., :m, m:, :]
    C = M[..., m:, m:, :]
    Ai = inv_spd_lanes(A)
    AiB = _mm_lanes(Ai, B)
    S = C - _mmT_lanes(B, AiB)
    Si = inv_spd_lanes(S)
    SiBtAi = _mm_lanes(Si, jnp.swapaxes(AiB, -3, -2))
    TL = Ai + _mm_lanes(AiB, SiBtAi)
    TR = -jnp.swapaxes(SiBtAi, -3, -2)
    BL = jnp.swapaxes(TR, -3, -2)
    top = jnp.concatenate([TL, TR], axis=-2)
    bot = jnp.concatenate([BL, Si], axis=-2)
    return jnp.concatenate([top, bot], axis=-3)


def inv_spd(M: jax.Array) -> jax.Array:
    """Batched closed-form inverse of small SPD blocks (..., n, n).

    n <= 3 by adjugate; larger n by recursive 2x2 block-Schur
    ([A B; B^T C]^-1 with S = C - B^T A^-1 B), splitting n -> (n//2,
    n - n//2).  Exact arithmetic (no iteration), fuses entirely on the
    VPU; intended for n <= ~12 (refiner/DLT-scale blocks).
    """
    n = M.shape[-1]
    if n == 1:
        return 1.0 / M
    if n == 2:
        return inv2(M)
    if n == 3:
        return inv3(M)
    m = n // 2
    A = M[..., :m, :m]
    B = M[..., :m, m:]
    C = M[..., m:, m:]
    Ai = inv_spd(A)
    AiB = _mm(Ai, B)
    S = C - jnp.einsum("...ji,...jk->...ik", B, AiB, precision=_HP)
    Si = inv_spd(S)
    TL = Ai + jnp.einsum(
        "...ij,...jk,...lk->...il", AiB, Si, AiB, precision=_HP
    )
    TR = -_mm(AiB, Si)
    BL = jnp.swapaxes(TR, -1, -2)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([BL, Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inv_gen3_lanes(M: jax.Array) -> jax.Array:
    """General (non-symmetric) 3x3 inverse, lane-major — the adjugate
    formula in `inv3_lanes` is already general; alias for clarity."""
    return inv3_lanes(M)


def inv6_lanes(M: jax.Array) -> jax.Array:
    """General (non-symmetric) 6x6 inverse via the 3x3-block Schur
    complement, lane-major (..., 6, 6, N).  Pivot-free: requires the
    top-left 3x3 block and its Schur complement to be invertible — true for
    the near-identity interface systems this serves (SPIKE chain interface,
    `parallel/schur_dist.py`), where a batched dense LU would serialize as
    a small-LAPACK kernel on TPU."""
    A = M[..., :3, :3, :]
    B = M[..., :3, 3:, :]
    C = M[..., 3:, :3, :]
    D = M[..., 3:, 3:, :]
    Ai = inv3_lanes(A)
    CAi = _mm_lanes(C, Ai)
    S = D - _mm_lanes(CAi, B)
    Si = inv3_lanes(S)
    AiB = _mm_lanes(Ai, B)
    TL = Ai + _mm_lanes(_mm_lanes(AiB, Si), CAi)
    TR = -_mm_lanes(AiB, Si)
    BL = -_mm_lanes(Si, CAi)
    top = jnp.concatenate([TL, TR], axis=-2)
    bot = jnp.concatenate([BL, Si], axis=-2)
    return jnp.concatenate([top, bot], axis=-3)
