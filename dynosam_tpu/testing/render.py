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
import os
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
    obj_label: int = 3           # first object's label; object i gets +i
    n_objects: int = 1
    seed: int = 0
    cam_step: float = 0.08       # forward+lateral motion per frame
    obj_step: float = 0.25
    # restrict object rotations to yaw (about world Y): the KITTI
    # object_pose.txt format stores only (t, ry) — camera rotation is
    # already yaw-only, so with this set the written GT is EXACT
    # (`write_reference_layout`); default off keeps every existing scene
    # bit-identical
    yaw_only_objects: bool = False


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
    base_obj: jax.Array,       # (O, th, tw) noise grids, one per object
    XR: jax.Array,             # (K, 3, 3) camera rotations (world)
    Xt: jax.Array,             # (K, 3) camera translations
    LR: jax.Array,             # (K, O, 3, 3) object pose rotations (world)
    Lt: jax.Array,             # (K, O, 3)
    HR: jax.Array,             # (O, 3, 3) per-frame object motions
    Ht: jax.Array,             # (O, 3)
    fx: jax.Array,
    obj_half: jax.Array,       # (O,)
    bg_depth: jax.Array,
    obj_depth: jax.Array,
    *,
    h: int,
    w: int,
    obj_label: int,
):
    """Render every frame of the sequence in one batched program.

    Returns stacked (K, ...) gray/depth/flow/mask arrays.  Rays from each
    pixel hit the NEAREST of the O moving object planes (z=0 in each
    object frame, |xy| < obj_half[o]) or the static background plane
    z_w = bg_depth; object i carries mask label obj_label + i.
    """
    f32 = jnp.float32
    O = HR.shape[0]
    bg_tex = _smooth_texture_jit(base_bg, h * 3, w * 3)
    obj_tex = jax.vmap(lambda b: _smooth_texture_jit(b, h, w))(base_obj)

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

        def hit_object(LRo, Lto, half):
            # object plane: z = 0 in this object's current frame
            Ro = LRo.T
            to = -Ro @ Lto
            rays_o = rays_w @ Ro.T
            cam_o = Ro @ Xtk + to
            denom_o = jnp.where(
                jnp.abs(rays_o[:, 2]) < 1e-6, 1e-6, rays_o[:, 2]
            )
            s_obj = (0.0 - cam_o[2]) / denom_o
            p_local = cam_o + rays_o * s_obj[:, None]
            on = (
                (jnp.abs(p_local[:, 0]) < half)
                & (jnp.abs(p_local[:, 1]) < half)
                & (s_obj > 0.1)
                & (s_obj < s_bg)
            )
            p_world = p_local @ LRo.T + Lto
            return on, s_obj, p_local, p_world

        on_o, s_o, p_loc_o, p_w_o = jax.vmap(hit_object)(
            LRk, Ltk, obj_half
        )                                   # (O,P) (O,P) (O,P,3) (O,P,3)

        # nearest hitting object per pixel (occlusion between objects)
        s_eff = jnp.where(on_o, s_o, jnp.inf)
        best = jnp.argmin(s_eff, axis=0)                       # (P,)
        on_obj = jnp.any(on_o, axis=0)                         # (P,)
        oh = (
            jax.nn.one_hot(best, O, dtype=f32)
            * on_obj[:, None].astype(f32)
        )                                                      # (P, O)

        p_obj = jnp.einsum("po,opj->pj", oh, p_w_o)
        p_obj_local = jnp.einsum("po,opj->pj", oh, p_loc_o)
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
        obj_vals_o = jax.vmap(lambda t: _bilinear(t, ox, oy))(obj_tex)
        obj_vals = jnp.einsum("po,op->p", oh, obj_vals_o)
        gray = jnp.where(on_obj, obj_vals, bg_vals).reshape(h, w)
        labels = obj_label + jnp.arange(O, dtype=jnp.int32)
        mask = jnp.where(on_obj, labels[best], 0).reshape(h, w)
        mask = mask.astype(jnp.int32)

        # flow to the next frame: object points move with their H, bg stays
        p_next_o = jnp.einsum("pj,oij->opi", p_w, HR) + Ht[:, None, :]
        p_next_obj = jnp.einsum("po,opj->pj", oh, p_next_o)
        p_next = jnp.where(on_obj[:, None], p_next_obj, p_w)
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
    """Renders frames; exposes GT camera poses and object motions.

    Objects are independently moving textured plane patches; object i
    carries mask label `cfg.obj_label + i`.  The single-object accessors
    (`H_gt`, `_object_pose_at`) refer to object 0 for back-compat; the
    plural accessors (`H_gt_list`, `object_pose_at`, `object_labels`)
    cover all of them.
    """

    # per-object trajectory variations (constant twists; object 0 keeps the
    # original single-object parameters so existing benchmarks/tests are
    # bit-identical at n_objects=1)
    _OBJ_TWISTS = [
        [0.0, 0.0, 0.005, None, 0.02, 0.0],       # None -> +obj_step
        [0.0, 0.0, -0.004, "neg", 0.012, 0.03],   # "neg" -> -0.8*obj_step
        [0.002, 0.0, 0.0, "half", -0.015, 0.0],   # "half" -> 0.5*obj_step
    ]
    _OBJ_CENTERS = [(0.55, 0.45), (0.25, 0.55), (0.8, 0.35)]
    _OBJ_HALVES = [0.8, 0.7, 0.6]

    def __init__(self, cfg: RenderConfig):
        self.cfg = cfg
        O = cfg.n_objects
        if O > len(self._OBJ_TWISTS):
            raise ValueError(f"n_objects <= {len(self._OBJ_TWISTS)}")
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
            rng.normal(size=(O, cfg.h // scale + 2, cfg.w // scale + 2)),
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

        # objects: plane patches at z ~ obj_depth, moving in world
        def _twist(spec):
            out = []
            for v in spec:
                if v is None:
                    out.append(cfg.obj_step)
                elif v == "neg":
                    out.append(-0.8 * cfg.obj_step)
                elif v == "half":
                    out.append(0.5 * cfg.obj_step)
                else:
                    out.append(v)
            return jnp.asarray(out, jnp.float32)

        def _yaw_only(tw):
            # keep |rotation| but move it onto the Y axis (see
            # RenderConfig.yaw_only_objects)
            mag = float(np.linalg.norm(np.asarray(tw[:3])))
            return jnp.concatenate(
                [jnp.asarray([0.0, mag, 0.0], jnp.float32), tw[3:]]
            )

        twists = [_twist(self._OBJ_TWISTS[i]) for i in range(O)]
        if cfg.yaw_only_objects:
            twists = [_yaw_only(t) for t in twists]
        self.H_gt_list: List[SE3] = [se3_exp(t) for t in twists]
        self.H_gt = self.H_gt_list[0]
        self.obj_halves = [self._OBJ_HALVES[i] for i in range(O)]
        self.obj_half = self.obj_halves[0]

        # object pose chains L_k = H^k L_0 (tiny; precompute once)
        self._L_gt_all: List[List[SE3]] = []
        for i in range(O):
            fu, fv = self._OBJ_CENTERS[i]
            depth_i = cfg.obj_depth * (1.0 + 0.12 * i)
            c3 = np.asarray(
                backproject(
                    self.cam,
                    jnp.asarray([cfg.w * fu, cfg.h * fv], jnp.float32),
                    jnp.asarray(depth_i, jnp.float32),
                )
            )
            if i == 0:
                self.obj_center0 = c3
            chain = [
                SE3(jnp.eye(3, dtype=jnp.float32), jnp.asarray(c3, jnp.float32))
            ]
            for _ in range(1, cfg.n_frames):
                chain.append(se3_compose(self.H_gt_list[i], chain[-1]))
            self._L_gt_all.append(chain)
        self._L_gt = self._L_gt_all[0]

        self._frames: List[FrameImages] | None = None

    # ------------------------------------------------------------------
    @property
    def object_labels(self) -> List[int]:
        return [self.cfg.obj_label + i for i in range(self.cfg.n_objects)]

    def object_pose_at(self, k: int, obj: int = 0) -> SE3:
        """Rigid pose of object `obj`'s plane at frame k (world)."""
        return self._L_gt_all[obj][k]

    def _object_pose_at(self, k: int) -> SE3:
        return self._L_gt_all[0][k]

    def _render(self) -> List[FrameImages]:
        cfg = self.cfg
        XR = jnp.stack([X.R for X in self.X_gt])
        Xt = jnp.stack([X.t for X in self.X_gt])
        # (K, O, ...) object pose chains
        LR = jnp.stack(
            [jnp.stack([c[k].R for c in self._L_gt_all])
             for k in range(cfg.n_frames)]
        )
        Lt = jnp.stack(
            [jnp.stack([c[k].t for c in self._L_gt_all])
             for k in range(cfg.n_frames)]
        )
        HR = jnp.stack([H.R for H in self.H_gt_list])
        Ht = jnp.stack([H.t for H in self.H_gt_list])
        gray, depth, flow, mask = _render_all(
            self._base_bg,
            self._base_obj,
            XR, Xt, LR, Lt,
            HR, Ht,
            jnp.asarray(cfg.fx, jnp.float32),
            jnp.asarray(self.obj_halves, jnp.float32),
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


# --------------------------------------------------------------------------
# Reference-layout dataset writer (closes the dataset-dir -> CLI -> report
# loop without real sequences in the environment)
# --------------------------------------------------------------------------

def _write_flo(path: str, flow: np.ndarray) -> None:
    """Middlebury .flo writer (inverse of `data/kitti._read_flo`)."""
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.asarray([202021.25], np.float32).tofile(f)
        np.asarray([w, h], np.int32).tofile(f)
        flow.astype(np.float32).reshape(-1).tofile(f)


def write_reference_layout(
    scene: "RenderedScene",
    out_dir: str,
    baseline: float = 387.5744,
    depth_scale: float = 256.0,
) -> str:
    """Write a `RenderedScene` to disk in the KITTI-tracking layout the
    reference consumes (`dataprovider/KittiDataProvider.hpp:352+`; our
    loader `data/kitti.py`):

      image_0/%06d.png   8-bit grayscale
      depth/%06d.png     16-bit disparity, depth = baseline/(disp/scale)
                         with the 387.5744/256 semantics
      flow/%06d.flo      dense flow k -> k+1
      motion/%06d.png    16-bit instance masks
      calib.txt          P2 row (overrides the per-sequence rig)
      times.txt, pose_gt.txt (3x4 rows), object_pose.txt
                         (`FrameID ObjectID B1-B4 t1 t2 t3 ry`)

    The object_pose yaw encoding (L_cam = (R_y(ry + pi/2), t),
    `KittiDataProvider.hpp:214-295`) is EXACT only for yaw-only object and
    camera rotations — build the scene with
    `RenderConfig(yaw_only_objects=True)` (the default camera twist is
    already yaw-only)."""
    import cv2

    cfg = scene.cfg
    for sub in ("image_0", "depth", "flow", "motion"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    frames = scene.frames()
    for k, f in enumerate(frames):
        name = f"{k:06d}"
        gray = np.clip(np.asarray(f.gray), 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(out_dir, "image_0", name + ".png"), gray)
        depth = np.asarray(f.depth, np.float64)
        disp = np.where(
            depth > 0, baseline * depth_scale / np.maximum(depth, 1e-6), 0.0
        )
        cv2.imwrite(
            os.path.join(out_dir, "depth", name + ".png"),
            np.clip(np.round(disp), 0, 65535).astype(np.uint16),
        )
        _write_flo(
            os.path.join(out_dir, "flow", name + ".flo"),
            np.asarray(f.flow, np.float32),
        )
        cv2.imwrite(
            os.path.join(out_dir, "motion", name + ".png"),
            np.asarray(f.mask).astype(np.uint16),
        )

    cam = scene.cam
    with open(os.path.join(out_dir, "calib.txt"), "w") as f:
        f.write(
            f"P2: {float(cam.fx)} 0 {float(cam.cx)} 0 "
            f"0 {float(cam.fy)} {float(cam.cy)} 0 "
            f"0 0 1 0\n"
        )
    with open(os.path.join(out_dir, "times.txt"), "w") as f:
        for k in range(cfg.n_frames):
            f.write(f"{k * 0.1:.6f}\n")
    with open(os.path.join(out_dir, "pose_gt.txt"), "w") as f:
        for k in range(cfg.n_frames):
            X = scene.X_gt[k]
            T = np.eye(4)
            T[:3, :3] = np.asarray(X.R)
            T[:3, 3] = np.asarray(X.t)
            f.write(" ".join(f"{v:.9f}" for v in T[:3, :4].reshape(-1)))
            f.write("\n")
    with open(os.path.join(out_dir, "object_pose.txt"), "w") as f:
        for k in range(cfg.n_frames):
            for i, lab in enumerate(scene.object_labels):
                L = scene.object_pose_at(k, i)
                Lw = np.eye(4)
                Lw[:3, :3] = np.asarray(L.R)
                Lw[:3, 3] = np.asarray(L.t)
                Xw = np.eye(4)
                Xw[:3, :3] = np.asarray(scene.X_gt[k].R)
                Xw[:3, 3] = np.asarray(scene.X_gt[k].t)
                Lc = np.linalg.inv(Xw) @ Lw
                ry = float(np.arctan2(Lc[0, 2], Lc[0, 0])) - np.pi / 2
                t = Lc[:3, 3]
                f.write(
                    f"{k} {lab} 0 0 0 0 "
                    f"{t[0]:.9f} {t[1]:.9f} {t[2]:.9f} {ry:.9f}\n"
                )
    return out_dir
