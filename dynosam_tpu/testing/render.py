"""Synthetic RGB-D + flow + mask sequence renderer.

Generates geometrically consistent image/depth/flow/mask tensors for a
camera moving through a textured plane world with independently moving
textured object planes.  This exercises the *whole* frontend (KLT tracking,
depth association, PnP, scene flow, object motion) without any dataset —
the vision-level analog of the backend's scenario simulator.

TPU-first mechanics: ALL per-pixel work (texture synthesis, ray casting,
plane intersection, bilinear texture lookup, flow projection) is one
frame-batched jitted XLA program — no host loops, no scipy.  Rendering a
12-frame KITTI-sized sequence is a single compile + one device call
(~100x faster than the former eager scipy/numpy path, and it can run
directly on the TPU).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import CameraParams, backproject
from ..core.lie import SE3, se3_compose, se3_exp
from ..frontend.frontend import FrameImages


@dataclasses.dataclass
class RenderConfig:
    n_frames: int = 6
    h: int = 120
    w: int = 160
    fx: float = 120.0
    bg_depth: float = 8.0        # background plane z (camera frame 0)
    obj_depth: float = 5.0
    obj_label: int = 3
    seed: int = 0
    cam_step: float = 0.08       # forward+lateral motion per frame
    obj_step: float = 0.25


def _blur1d(x: jax.Array, axis: int) -> jax.Array:
    """Separable Gaussian blur (sigma=1, radius 4) along one axis."""
    r = 4
    k = jnp.exp(-0.5 * (jnp.arange(-r, r + 1, dtype=x.dtype)) ** 2)
    k = k / jnp.sum(k)
    xm = jnp.moveaxis(x, axis, -1)
    pad = [(0, 0)] * (xm.ndim - 1) + [(r, r)]
    xp = jnp.pad(xm, pad, mode="edge")
    # correlate along the last axis via strided windows (tiny kernel)
    out = jnp.zeros_like(xm)
    n = xm.shape[-1]
    for i in range(2 * r + 1):
        out = out + k[i] * jax.lax.dynamic_slice_in_dim(xp, i, n, axis=-1)
    return jnp.moveaxis(out, -1, axis)


def _smooth_texture_jit(base: jax.Array, h: int, w: int) -> jax.Array:
    """Cubic-upsample small noise to (h, w), blur, normalize to [20, 220]."""
    tex = jax.image.resize(base, (h, w), method="cubic")
    tex = _blur1d(_blur1d(tex, 0), 1)
    lo, hi = jnp.min(tex), jnp.max(tex)
    return (tex - lo) / (hi - lo + 1e-9) * 200.0 + 20.0


def _bilinear(tex: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear sample tex[y, x] with coords pre-clipped to [0, dim-2]."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx_ = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    t00 = tex[y0, x0]
    t01 = tex[y0, x0 + 1]
    t10 = tex[y0 + 1, x0]
    t11 = tex[y0 + 1, x0 + 1]
    return (
        t00 * (1 - fy) * (1 - fx_)
        + t01 * (1 - fy) * fx_
        + t10 * fy * (1 - fx_)
        + t11 * fy * fx_
    )


@partial(jax.jit, static_argnames=("h", "w", "obj_label"))
def _render_all(
    base_bg: jax.Array,        # small noise grid for the background texture
    base_obj: jax.Array,       # small noise grid for the object texture
    XR: jax.Array,             # (K, 3, 3) camera rotations (world)
    Xt: jax.Array,             # (K, 3) camera translations
    LR: jax.Array,             # (K, 3, 3) object pose rotations (world)
    Lt: jax.Array,             # (K, 3)
    HR: jax.Array,             # (3, 3) per-frame object motion
    Ht: jax.Array,             # (3,)
    fx: jax.Array,
    obj_half: jax.Array,
    bg_depth: jax.Array,
    obj_depth: jax.Array,
    *,
    h: int,
    w: int,
    obj_label: int,
):
    """Render every frame of the sequence in one batched program.

    Returns stacked (K, ...) gray/depth/flow/mask arrays.  Same plane-world
    model as the former per-frame path: rays from each pixel hit either the
    moving object plane (z=0 in the object frame, |xy| < obj_half) or the
    static background plane z_w = bg_depth.
    """
    f32 = jnp.float32
    bg_tex = _smooth_texture_jit(base_bg, h * 3, w * 3)
    obj_tex = _smooth_texture_jit(base_obj, h, w)

    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=f32), jnp.arange(w, dtype=f32), indexing="ij"
    )
    uv_now = jnp.stack([xx, yy], axis=-1).reshape(-1, 2)      # (P, 2)
    cx, cy = w / 2.0, h / 2.0
    rays = jnp.stack(
        [
            (uv_now[:, 0] - cx) / fx,
            (uv_now[:, 1] - cy) / fx,
            jnp.ones_like(uv_now[:, 0]),
        ],
        axis=-1,
    )                                                          # (P, 3)

    def render_frame(XRk, Xtk, LRk, Ltk, XRn, Xtn):
        rays_w = rays @ XRk.T                                  # (P, 3)
        denom = jnp.where(jnp.abs(rays_w[:, 2]) < 1e-6, 1e-6, rays_w[:, 2])
        s_bg = (bg_depth - Xtk[2]) / denom
        p_bg = Xtk + rays_w * s_bg[:, None]

        # object plane: z = 0 in the object's current frame
        Ro = LRk.T
        to = -Ro @ Ltk
        rays_o = rays_w @ Ro.T
        cam_o = Ro @ Xtk + to
        denom_o = jnp.where(jnp.abs(rays_o[:, 2]) < 1e-6, 1e-6, rays_o[:, 2])
        s_obj = (0.0 - cam_o[2]) / denom_o
        p_obj_local = cam_o + rays_o * s_obj[:, None]
        on_obj = (
            (jnp.abs(p_obj_local[:, 0]) < obj_half)
            & (jnp.abs(p_obj_local[:, 1]) < obj_half)
            & (s_obj > 0.1)
            & (s_obj < s_bg)
        )
        p_obj = p_obj_local @ LRk.T + Ltk
        p_w = jnp.where(on_obj[:, None], p_obj, p_bg)
        depth = (p_w - Xtk) @ XRk[:, 2]

        # texture lookup
        bh, bw = h * 3, w * 3
        scale = fx / bg_depth
        bx = jnp.clip(p_w[:, 0] * scale + bw / 2.0, 0.0, bw - 2.0)
        by = jnp.clip(p_w[:, 1] * scale + bh / 2.0, 0.0, bh - 2.0)
        bg_vals = _bilinear(bg_tex, bx, by)
        oscale = fx / obj_depth * 0.8
        ox = jnp.clip(p_obj_local[:, 0] * oscale + w / 2.0, 0.0, w - 2.0)
        oy = jnp.clip(p_obj_local[:, 1] * oscale + h / 2.0, 0.0, h - 2.0)
        obj_vals = _bilinear(obj_tex, ox, oy)
        gray = jnp.where(on_obj, obj_vals, bg_vals).reshape(h, w)
        mask = jnp.where(on_obj, obj_label, 0).reshape(h, w).astype(jnp.int32)

        # flow to the next frame: object points move with H, bg stays
        p_next = jnp.where(on_obj[:, None], p_w @ HR.T + Ht, p_w)
        pc = (p_next - Xtn) @ XRn                              # world -> cam k+1
        z = jnp.maximum(pc[:, 2], 1e-6)
        un = jnp.stack([pc[:, 0] / z * fx + cx, pc[:, 1] / z * fx + cy], -1)
        flow = (un - uv_now).reshape(h, w, 2)
        return gray, depth.reshape(h, w), flow, mask

    # next-frame camera pose with the last frame clamped (kn = min(k+1, K-1))
    XRn = jnp.concatenate([XR[1:], XR[-1:]], axis=0)
    Xtn = jnp.concatenate([Xt[1:], Xt[-1:]], axis=0)
    return jax.vmap(render_frame)(XR, Xt, LR, Lt, XRn, Xtn)


class RenderedScene:
    """Renders frames; exposes GT camera poses and object motion."""

    def __init__(self, cfg: RenderConfig):
        self.cfg = cfg
        rng = np.random.default_rng(cfg.seed)
        self.cam = CameraParams.create(
            cfg.fx, cfg.fx, cfg.w / 2, cfg.h / 2, cfg.w, cfg.h
        )
        scale = 4
        self._base_bg = jnp.asarray(
            rng.normal(size=(cfg.h * 3 // scale + 2, cfg.w * 3 // scale + 2)),
            jnp.float32,
        )
        self._base_obj = jnp.asarray(
            rng.normal(size=(cfg.h // scale + 2, cfg.w // scale + 2)),
            jnp.float32,
        )

        # camera trajectory
        self.X_gt: List[SE3] = [
            SE3(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
        ]
        for k in range(1, cfg.n_frames):
            xi = jnp.asarray(
                [0.0, 0.002, 0.0, cfg.cam_step, 0.01, 0.02], jnp.float32
            )
            self.X_gt.append(se3_compose(self.X_gt[-1], se3_exp(xi)))

        # object: plane patch at z = obj_depth, moving laterally in world
        self.H_gt = se3_exp(
            jnp.asarray([0.0, 0.0, 0.005, cfg.obj_step, 0.02, 0.0], jnp.float32)
        )
        cx, cy = cfg.w * 0.55, cfg.h * 0.45
        half = 0.8
        c3 = np.asarray(
            backproject(
                self.cam,
                jnp.asarray([cx, cy], jnp.float32),
                jnp.asarray(cfg.obj_depth, jnp.float32),
            )
        )
        self.obj_center0 = c3
        self.obj_half = half

        # object pose chain L_k = H^k L_0 (tiny; precompute once)
        self._L_gt: List[SE3] = [
            SE3(jnp.eye(3, dtype=jnp.float32), jnp.asarray(c3, jnp.float32))
        ]
        for _ in range(1, cfg.n_frames):
            self._L_gt.append(se3_compose(self.H_gt, self._L_gt[-1]))

        self._frames: List[FrameImages] | None = None

    # ------------------------------------------------------------------
    def _object_pose_at(self, k: int) -> SE3:
        """Rigid pose of the object plane at frame k (world)."""
        return self._L_gt[k]

    def _render(self) -> List[FrameImages]:
        cfg = self.cfg
        XR = jnp.stack([X.R for X in self.X_gt])
        Xt = jnp.stack([X.t for X in self.X_gt])
        LR = jnp.stack([L.R for L in self._L_gt])
        Lt = jnp.stack([L.t for L in self._L_gt])
        gray, depth, flow, mask = _render_all(
            self._base_bg,
            self._base_obj,
            XR, Xt, LR, Lt,
            self.H_gt.R, self.H_gt.t,
            jnp.asarray(cfg.fx, jnp.float32),
            jnp.asarray(self.obj_half, jnp.float32),
            jnp.asarray(cfg.bg_depth, jnp.float32),
            jnp.asarray(cfg.obj_depth, jnp.float32),
            h=cfg.h, w=cfg.w, obj_label=cfg.obj_label,
        )
        return [
            FrameImages(
                gray=gray[k], depth=depth[k], flow=flow[k], mask=mask[k]
            )
            for k in range(cfg.n_frames)
        ]

    def frame(self, k: int) -> FrameImages:
        if self._frames is None:
            self._frames = self._render()
        return self._frames[k]

    def frames(self) -> List[FrameImages]:
        if self._frames is None:
            self._frames = self._render()
        return self._frames
