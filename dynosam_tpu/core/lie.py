"""Batched SO(3)/SE(3) Lie-group operations for TPU.

This is the mathematical foundation of the framework: every pose, object
motion and factor residual is expressed through these ops.  All functions are
dtype-preserving, shape-polymorphic over leading batch dimensions, and safe
under `jit`/`vmap`/`grad` (small-angle branches are implemented with
`jnp.where` on Taylor expansions, never python control flow).

Conventions (chosen to match the reference semantics, see
/root/reference dynosam `gtsam::Pose3` usage, e.g.
`src/factors/LandmarkPoseSmoothingFactor.cc:29-80`):
  * SE(3) tangent vectors are ordered ``xi = [omega (3), v (3)]`` —
    rotation first, translation second (gtsam Pose3 expmap convention).
  * ``local(a, b) = Log(a^-1 * b)`` and ``retract(a, xi) = a * Exp(xi)``.
  * Poses act on points as ``x_w = R @ x_l + t``.

Representation: rotation matrix ``R (..., 3, 3)`` + translation ``t (..., 3)``
packed in the :class:`SE3` NamedTuple.  Matrices (not quaternions) because
compose/apply become batched matmuls that map directly onto the MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

# 3x3/3-vec geometry products are tiny; DON'T run them as matmuls on TPU.
# A K=3 dot_general maps onto the 128-deep MXU at ~2% utilization, and the
# HIGHEST-precision rule (default matmul precision is bf16-class and
# visibly corrupts poses) sextuples that with 6 bf16 passes — measured
# ~0.9 ms for ONE fused residual sweep over 2048 points.  Explicit
# broadcast-multiply-reduce stays on the VPU in EXACT f32 (better than
# HIGHEST, which only approximates f32) and is ~100x cheaper.
_PREC = lax.Precision.HIGHEST  # kept for reference/external use


def _mm(a, b):
    """(..., 3, 3) @ (..., 3, 3) as broadcast mul + reduce (VPU, exact f32)."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def _mv(A, x):
    """(..., 3, 3) @ (..., 3) as broadcast mul + reduce (VPU, exact f32)."""
    return jnp.sum(A * x[..., None, :], axis=-1)

__all__ = [
    "SE3",
    "so3_hat",
    "so3_vee",
    "so3_exp",
    "so3_log",
    "so3_left_jacobian",
    "so3_left_jacobian_inv",
    "se3_exp",
    "se3_log",
    "se3_identity",
    "se3_inverse",
    "se3_compose",
    "se3_between",
    "se3_local",
    "se3_retract",
    "se3_apply",
    "se3_adjoint",
    "se3_from_matrix",
    "se3_matrix",
]

# Small-angle crossover.  Generous enough for f32 (eps ~ 1.2e-7): below this
# the Taylor series is exact to machine precision and the closed forms start
# to lose digits.
_SMALL = 1e-4


def _dt(x):
    return x.dtype


# --------------------------------------------------------------------------
# so(3)
# --------------------------------------------------------------------------

def so3_hat(w: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_vee(W: jax.Array) -> jax.Array:
    """(..., 3, 3) skew -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sq_theta(w: jax.Array):
    """(theta^2, sanitized theta) with NaN-free gradients everywhere.

    Both quantities are safe to differentiate at w = 0: the Taylor branches
    below are expressed in theta^2 (polynomial, smooth), and the generic
    branches only ever see a sanitized theta bounded away from 0 (the
    double-`where` trick — unselected branches must still be finite in both
    forward- and reverse-mode AD, else masked residuals poison the whole
    gradient with 0 * inf = NaN).
    """
    sq = jnp.sum(w * w, axis=-1)
    small = sq < _SMALL * _SMALL
    th_safe = jnp.sqrt(jnp.where(small, 1.0, sq))
    return sq, small, th_safe


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    dtype = _dt(w)
    sq, small, th = _sq_theta(w)
    sq = sq[..., None, None]
    small = small[..., None, None]
    th = th[..., None, None]
    W = so3_hat(w)
    W2 = _mm(W, W)
    sq_safe = jnp.where(small, 1.0, sq)
    a = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - sq / 24.0, (1.0 - jnp.cos(th)) / sq_safe)
    eye = jnp.eye(3, dtype=dtype)
    return eye + a * W + b * W2


# cos(pi - 0.15): the generic-branch scale th/(2 sin th) has ~1/sin^2
# sensitivity to th, so switch to the diagonal extraction well before pi
# (f32 arccos conditioning blows up the generic branch past this point).
_COS_NEAR_PI = -0.98877108


def so3_log(R: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation -> (..., 3) axis-angle.

    Three regimes — small-angle (Taylor in trace), generic, near-pi
    (diagonal extraction) — each computed on sanitized inputs so the whole
    function is NaN-free under fwd/rev AD at every rotation incl. identity.
    """
    dtype = _dt(R)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_th = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    antisym = so3_vee(R - jnp.swapaxes(R, -1, -2))

    small = cos_th > 1.0 - 1e-6          # theta < ~1.4e-3
    near_pi = cos_th < _COS_NEAR_PI      # theta > pi - 0.15
    generic = (~small) & (~near_pi)

    # ---- generic: w = th/(2 sin th) * antisym, on sanitized cos
    cos_g = jnp.where(generic, cos_th, 0.0)
    th_g = jnp.arccos(cos_g)
    scale_g = th_g / (2.0 * jnp.sin(th_g))
    # ---- small: th^2 ~ 3 - trace, scale ~ 1/2 + th^2/12
    scale_s = 0.5 + (3.0 - trace) / 12.0
    w_gs = jnp.where(small, scale_s, scale_g)[..., None] * antisym

    # ---- near-pi: from R_ii = 1 - (1-cos th)(1 - a_i^2):
    #   w_i^2 = th^2 (R_ii - cos th) / (1 - cos th); antisym fixes signs.
    cos_p = jnp.where(near_pi, cos_th, 0.0)    # denom >= 1 everywhere
    th_p = jnp.arccos(cos_p)
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    w2 = (th_p * th_p / (1.0 - cos_p))[..., None] * (diag - cos_p[..., None])
    w_abs = jnp.sqrt(jnp.maximum(w2, 0.0) + 1e-12)
    sign_src = jnp.where(jnp.abs(antisym) > 1e-7, jnp.sign(antisym), 1.0)
    w_pi = w_abs * sign_src

    return jnp.where(near_pi[..., None], w_pi, w_gs).astype(dtype)


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian V of SO(3): Exp(w) t uses V(w) @ v for SE(3) exp."""
    dtype = _dt(w)
    sq, small, th = _sq_theta(w)
    sq = sq[..., None, None]
    small = small[..., None, None]
    th = th[..., None, None]
    W = so3_hat(w)
    W2 = _mm(W, W)
    sq_safe = jnp.where(small, 1.0, sq)
    b = jnp.where(small, 0.5 - sq / 24.0, (1.0 - jnp.cos(th)) / sq_safe)
    c = jnp.where(
        small, 1.0 / 6.0 - sq / 120.0, (th - jnp.sin(th)) / (sq_safe * th)
    )
    return jnp.eye(3, dtype=dtype) + b * W + c * W2


def so3_left_jacobian_inv(w: jax.Array) -> jax.Array:
    """Inverse left Jacobian of SO(3)."""
    dtype = _dt(w)
    sq, small, th = _sq_theta(w)
    sq = sq[..., None, None]
    small = small[..., None, None]
    th = th[..., None, None]
    W = so3_hat(w)
    W2 = _mm(W, W)
    sq_safe = jnp.where(small, 1.0, sq)
    half = th * 0.5
    # (1/th^2) (1 - th sin(th) / (2 (1 - cos th))) == the cot formula below
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + sq / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / sq_safe,
    )
    return jnp.eye(3, dtype=dtype) - 0.5 * W + cot_term * W2


# --------------------------------------------------------------------------
# SE(3)
# --------------------------------------------------------------------------


class SE3(NamedTuple):
    """Batched rigid transform: rotation ``R (...,3,3)``, translation ``t (...,3)``."""

    R: jax.Array
    t: jax.Array

    # -- constructors ------------------------------------------------------
    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        return se3_identity(batch_shape, dtype)

    @staticmethod
    def exp(xi: jax.Array) -> "SE3":
        return se3_exp(xi)

    @staticmethod
    def from_matrix(T: jax.Array) -> "SE3":
        return se3_from_matrix(T)

    # -- ops ---------------------------------------------------------------
    def inverse(self) -> "SE3":
        return se3_inverse(self)

    def compose(self, other: "SE3") -> "SE3":
        return se3_compose(self, other)

    def __matmul__(self, other):
        if isinstance(other, SE3):
            return se3_compose(self, other)
        return se3_apply(self, other)

    def apply(self, pts: jax.Array) -> jax.Array:
        return se3_apply(self, pts)

    def between(self, other: "SE3") -> "SE3":
        return se3_between(self, other)

    def local(self, other: "SE3") -> jax.Array:
        return se3_local(self, other)

    def retract(self, xi: jax.Array) -> "SE3":
        return se3_retract(self, xi)

    def log(self) -> jax.Array:
        return se3_log(self)

    def adjoint(self) -> jax.Array:
        return se3_adjoint(self)

    def matrix(self) -> jax.Array:
        return se3_matrix(self)

    @property
    def batch_shape(self):
        return self.t.shape[:-1]

    @property
    def dtype(self):
        return self.t.dtype

    def astype(self, dtype) -> "SE3":
        return SE3(self.R.astype(dtype), self.t.astype(dtype))

    def __getitem__(self, idx) -> "SE3":
        return SE3(self.R[idx], self.t[idx])


def se3_identity(batch_shape=(), dtype=jnp.float32) -> SE3:
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return SE3(R, t)


def se3_exp(xi: jax.Array) -> SE3:
    """xi = [omega, v] (..., 6) -> SE3.  gtsam Pose3::Expmap ordering."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    V = so3_left_jacobian(w)
    t = _mv(V, v)
    return SE3(R, t)


def se3_log(g: SE3) -> jax.Array:
    """SE3 -> xi = [omega, v] (..., 6)."""
    w = so3_log(g.R)
    Vinv = so3_left_jacobian_inv(w)
    v = _mv(Vinv, g.t)
    return jnp.concatenate([w, v], axis=-1)


def se3_inverse(g: SE3) -> SE3:
    Rt = jnp.swapaxes(g.R, -1, -2)
    return SE3(Rt, -_mv(Rt, g.t))


def se3_compose(a: SE3, b: SE3) -> SE3:
    return SE3(_mm(a.R, b.R), _mv(a.R, b.t) + a.t)


def se3_between(a: SE3, b: SE3) -> SE3:
    """a^-1 * b (gtsam Pose3::between)."""
    return se3_compose(se3_inverse(a), b)


def se3_local(a: SE3, b: SE3) -> jax.Array:
    """Log(a^-1 b): local coordinates of b in a's tangent space."""
    return se3_log(se3_between(a, b))


def se3_retract(a: SE3, xi: jax.Array) -> SE3:
    return se3_compose(a, se3_exp(xi))


def se3_apply(g: SE3, pts: jax.Array) -> jax.Array:
    """Transform points (..., 3); broadcasts pose batch dims against points."""
    return _mv(g.R, pts) + g.t


def se3_adjoint(g: SE3) -> jax.Array:
    """(..., 6, 6) adjoint with [omega, v] ordering: Ad = [[R, 0], [t^ R, R]]."""
    th = so3_hat(g.t)
    top = jnp.concatenate([g.R, jnp.zeros_like(g.R)], axis=-1)
    bot = jnp.concatenate([_mm(th, g.R), g.R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_from_matrix(T: jax.Array) -> SE3:
    return SE3(T[..., :3, :3], T[..., :3, 3])


def se3_matrix(g: SE3) -> jax.Array:
    """(..., 4, 4) homogeneous matrix."""
    batch = g.t.shape[:-1]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=g.dtype), (*batch, 1, 4)
    )
    top = jnp.concatenate([g.R, g.t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
