"""Synthetic RGB-D + flow + mask sequence renderer.

Generates geometrically consistent image/depth/flow/mask tensors for a
camera moving through a textured plane world with independently moving
textured object planes.  This exercises the *whole* frontend (KLT tracking,
depth association, PnP, scene flow, object motion) without any dataset —
the vision-level analog of the backend's scenario simulator.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp
import numpy as np

from ..core.camera import CameraParams, backproject, project
from ..core.lie import SE3, se3_apply, se3_compose, se3_exp, se3_inverse
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


def _smooth_texture(rng, h, w, scale=4):
    base = rng.normal(size=(h // scale + 2, w // scale + 2))
    from scipy.ndimage import zoom, gaussian_filter

    tex = zoom(base, scale, order=3)[:h, :w]
    tex = gaussian_filter(tex, 1.0)
    tex = (tex - tex.min()) / (np.ptp(tex) + 1e-9) * 200.0 + 20.0
    return tex.astype(np.float32)


class RenderedScene:
    """Renders frames; exposes GT camera poses and object motion."""

    def __init__(self, cfg: RenderConfig):
        self.cfg = cfg
        rng = np.random.default_rng(cfg.seed)
        self.cam = CameraParams.create(
            cfg.fx, cfg.fx, cfg.w / 2, cfg.h / 2, cfg.w, cfg.h
        )
        # big background texture (world plane at z = bg_depth in frame 0)
        self.bg_tex = _smooth_texture(rng, cfg.h * 3, cfg.w * 3)
        self.obj_tex = _smooth_texture(rng, cfg.h, cfg.w)

        # camera trajectory
        self.X_gt: List[SE3] = [SE3(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))]
        for k in range(1, cfg.n_frames):
            xi = jnp.asarray(
                [0.0, 0.002, 0.0, cfg.cam_step, 0.01, 0.02], jnp.float32
            )
            self.X_gt.append(se3_compose(self.X_gt[-1], se3_exp(xi)))

        # object: plane patch at z = obj_depth, moving laterally in world
        self.H_gt = se3_exp(
            jnp.asarray([0.0, 0.0, 0.005, cfg.obj_step, 0.02, 0.0], jnp.float32)
        )
        # object extent in world (frame-0 camera == world)
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

    # ------------------------------------------------------------------
    def _object_pose_at(self, k: int) -> SE3:
        """Rigid pose of the object plane at frame k (world)."""
        P = SE3(jnp.eye(3, dtype=jnp.float32), jnp.asarray(self.obj_center0, jnp.float32))
        for _ in range(k):
            P = se3_compose(self.H_gt, P)
        return P

    def _pixel_world_points(self, k: int):
        """For every pixel of frame k: world 3D point + object membership."""
        cfg = self.cfg
        X = self.X_gt[k]
        yy, xx = np.meshgrid(np.arange(cfg.h), np.arange(cfg.w), indexing="ij")
        uv = jnp.asarray(
            np.stack([xx, yy], axis=-1).reshape(-1, 2), jnp.float32
        )
        # ray through pixel in camera frame
        rays = np.asarray(backproject(self.cam, uv, jnp.ones(uv.shape[0], jnp.float32)))
        Rw = np.asarray(X.R)
        tw = np.asarray(X.t)
        rays_w = rays @ Rw.T
        # background plane: z_w = bg_depth (world frame == frame-0 camera)
        denom = np.where(np.abs(rays_w[:, 2]) < 1e-6, 1e-6, rays_w[:, 2])
        s_bg = (cfg.bg_depth - tw[2]) / denom
        p_bg = tw + rays_w * s_bg[:, None]

        # object plane: z = obj_depth in the OBJECT's current pose; the
        # object moves rigidly, so transform rays into object frame
        L = self._object_pose_at(k)
        Linv = se3_inverse(L)
        Ro, to = np.asarray(Linv.R), np.asarray(Linv.t)
        rays_o = rays_w @ Ro.T
        cam_o = Ro @ tw + to
        denom_o = np.where(np.abs(rays_o[:, 2]) < 1e-6, 1e-6, rays_o[:, 2])
        s_obj = (0.0 - cam_o[2]) / denom_o
        p_obj_local = cam_o + rays_o * s_obj[:, None]
        on_obj = (
            (np.abs(p_obj_local[:, 0]) < self.obj_half)
            & (np.abs(p_obj_local[:, 1]) < self.obj_half)
            & (s_obj > 0.1)
            & (s_obj < s_bg)
        )
        Lw_R, Lw_t = np.asarray(L.R), np.asarray(L.t)
        p_obj = p_obj_local @ Lw_R.T + Lw_t
        p_w = np.where(on_obj[:, None], p_obj, p_bg)
        depth_cam = (p_w - tw) @ Rw[:, 2]
        return p_w, on_obj, depth_cam, p_obj_local

    def frame(self, k: int) -> FrameImages:
        cfg = self.cfg
        p_w, on_obj, depth, p_obj_local = self._pixel_world_points(k)

        # texture lookup: background indexed by world (x, y) at plane scale
        bh, bw = self.bg_tex.shape
        scale = cfg.fx / cfg.bg_depth
        bx = np.clip(p_w[:, 0] * scale + bw / 2, 0, bw - 2)
        by = np.clip(p_w[:, 1] * scale + bh / 2, 0, bh - 2)
        from scipy.ndimage import map_coordinates

        bg_vals = map_coordinates(self.bg_tex, [by, bx], order=1)
        oh, ow = self.obj_tex.shape
        oscale = cfg.fx / cfg.obj_depth * 0.8
        ox = np.clip(p_obj_local[:, 0] * oscale + ow / 2, 0, ow - 2)
        oy = np.clip(p_obj_local[:, 1] * oscale + oh / 2, 0, oh - 2)
        obj_vals = map_coordinates(self.obj_tex, [oy, ox], order=1)
        gray = np.where(on_obj, obj_vals, bg_vals).reshape(cfg.h, cfg.w)

        mask = np.where(on_obj, cfg.obj_label, 0).reshape(cfg.h, cfg.w)

        # flow to k+1: world point moves with H (object) or stays (bg),
        # then projects into frame k+1
        kn = min(k + 1, cfg.n_frames - 1)
        p_next = np.where(
            on_obj[:, None],
            p_w @ np.asarray(self.H_gt.R).T + np.asarray(self.H_gt.t),
            p_w,
        )
        uv_next, _ = project(self.cam, self.X_gt[kn], jnp.asarray(p_next, jnp.float32))
        yy, xx = np.meshgrid(np.arange(cfg.h), np.arange(cfg.w), indexing="ij")
        uv_now = np.stack([xx, yy], axis=-1).reshape(-1, 2)
        flow = (np.asarray(uv_next) - uv_now).reshape(cfg.h, cfg.w, 2)

        return FrameImages(
            gray=jnp.asarray(gray, jnp.float32),
            depth=jnp.asarray(depth.reshape(cfg.h, cfg.w), jnp.float32),
            flow=jnp.asarray(flow, jnp.float32),
            mask=jnp.asarray(mask, jnp.int32),
        )

    def frames(self) -> List[FrameImages]:
        return [self.frame(k) for k in range(self.cfg.n_frames)]
