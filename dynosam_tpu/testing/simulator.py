"""Synthetic dynamic-SLAM scenario generator.

The analog of the reference's simulator fixture
(`dynosam/test/internal/simulator.hpp:43-160`): ground-truth camera and
object trajectories with constant SE(3) motions, noisy tracked points, and
genuine `FrontendOutput` packets that drive the backend with no vision or
dataset involved (the "fake frontend" pattern of `test_rgbd_backend.cc`).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp
import numpy as np

from ..core.lie import SE3, se3_apply, se3_compose, se3_exp, se3_inverse
from ..core.types import DynamicObs, FrontendOutput, ObjectObs, StaticObs


@dataclasses.dataclass
class ScenarioConfig:
    n_frames: int = 12
    n_static: int = 120
    n_objects: int = 2
    pts_per_object: int = 40
    # capacities (slot pool sizes); must be >= counts above
    ns: int = 160
    nd: int = 128
    no: int = 4
    # noise
    point_noise: float = 0.01
    odom_rot_noise: float = 0.002
    odom_trans_noise: float = 0.01
    seed: int = 0
    # camera moves forward with slight turn; objects translate + rotate
    camera_step: float = 0.5


class Scenario:
    """Generates GT trajectories and noisy frontend packets."""

    def __init__(self, cfg: ScenarioConfig):
        self.cfg = cfg
        rng = np.random.default_rng(cfg.seed)
        F, O = cfg.n_frames, cfg.n_objects

        # ---- GT camera trajectory: integrate a constant twist + jitter
        twist = np.array([0.002, 0.02, 0.001, cfg.camera_step, 0.0, 0.02])
        X = [np.eye(4)]
        for k in range(1, F):
            d = twist + rng.normal(size=6) * np.array([1e-3] * 3 + [0.0] * 3)
            T = np.asarray(
                jnp.asarray(
                    _se3_matrix(se3_exp(jnp.asarray(d, jnp.float32)))
                )
            )
            X.append(X[-1] @ T)
        self.X_gt = SE3(
            jnp.asarray([T[:3, :3] for T in X], jnp.float32),
            jnp.asarray([T[:3, 3] for T in X], jnp.float32),
        )

        # ---- GT object motions: per-object constant world motion ^w H
        self.H_gt = []  # list over objects of (F,) SE3 (identity at k=0)
        self.obj_points_w = []  # list over objects of (F, P, 3) world points
        for j in range(O):
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            H_body = se3_exp(
                jnp.asarray(
                    np.concatenate([axis * 0.03, [0.4 + 0.2 * j, 0.1, 0.0]]),
                    jnp.float32,
                )
            )
            # points sampled around an initial centroid ahead of the camera
            centroid = np.array([6.0 + 4.0 * j, (-1.0) ** j * 2.0, 1.0])
            pts0 = jnp.asarray(
                centroid + rng.normal(size=(cfg.pts_per_object, 3)) * 0.8,
                jnp.float32,
            )
            pts = [pts0]
            Hs = [SE3(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))]
            for k in range(1, F):
                pts.append(se3_apply(H_body, pts[-1]))
                Hs.append(H_body)
            self.obj_points_w.append(jnp.stack(pts))
            self.H_gt.append(Hs)

        # ---- GT static points: box in front of the trajectory
        self.static_w = jnp.asarray(
            rng.uniform([-10, -8, -2], [30, 8, 6], size=(cfg.n_static, 3)),
            jnp.float32,
        )

        # ---- noisy odometry (accumulating drift)
        self.X_odo = [self.X_gt[0]]
        for k in range(1, F):
            rel = se3_compose(se3_inverse(self.X_gt[k - 1]), self.X_gt[k])
            noise = se3_exp(
                jnp.asarray(
                    np.concatenate(
                        [
                            rng.normal(size=3) * cfg.odom_rot_noise,
                            rng.normal(size=3) * cfg.odom_trans_noise,
                        ]
                    ),
                    jnp.float32,
                )
            )
            self.X_odo.append(
                se3_compose(self.X_odo[-1], se3_compose(rel, noise))
            )
        self.rng = rng

    # ------------------------------------------------------------------
    def frontend_outputs(self) -> List[FrontendOutput]:
        """Noisy measurement packets for every frame."""
        cfg = self.cfg
        out = []
        for k in range(cfg.n_frames):
            Xk = self.X_gt[k]
            Xinv = se3_inverse(Xk)

            # static: slots [0, n_static)
            local = se3_apply(Xinv, self.static_w)
            local = local + jnp.asarray(
                self.rng.normal(size=local.shape) * cfg.point_noise, jnp.float32
            )
            s_xyz = jnp.zeros((cfg.ns, 3), jnp.float32).at[: cfg.n_static].set(local)
            s_valid = (
                jnp.zeros((cfg.ns,), bool).at[: cfg.n_static].set(True)
            )
            static = StaticObs(
                uv=jnp.zeros((cfg.ns, 2), jnp.float32), xyz=s_xyz, valid=s_valid
            )

            # dynamic: object j occupies slots [j*P, (j+1)*P)
            d_xyz = jnp.zeros((cfg.nd, 3), jnp.float32)
            d_obj = jnp.full((cfg.nd,), -1, jnp.int32)
            d_valid = jnp.zeros((cfg.nd,), bool)
            P = cfg.pts_per_object
            for j in range(cfg.n_objects):
                loc = se3_apply(Xinv, self.obj_points_w[j][k])
                loc = loc + jnp.asarray(
                    self.rng.normal(size=loc.shape) * cfg.point_noise, jnp.float32
                )
                d_xyz = d_xyz.at[j * P : (j + 1) * P].set(loc)
                d_obj = d_obj.at[j * P : (j + 1) * P].set(j)
                d_valid = d_valid.at[j * P : (j + 1) * P].set(True)
            dynamic = DynamicObs(
                uv=jnp.zeros((cfg.nd, 2), jnp.float32),
                xyz=d_xyz,
                obj=d_obj,
                valid=d_valid,
            )

            # object packet: frontend-estimated motions (GT) + propagated
            # object poses L_k = H^k L_0 with L_0 at the initial centroid
            # (the packet the real frontend emits, `propogateObjectPoses`)
            mo_R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (cfg.no, 1, 1))
            mo_t = jnp.zeros((cfg.no, 3), jnp.float32)
            mo_valid = jnp.zeros((cfg.no,), bool)
            po_R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (cfg.no, 1, 1))
            po_t = jnp.zeros((cfg.no, 3), jnp.float32)
            po_valid = jnp.zeros((cfg.no,), bool)
            for j in range(cfg.n_objects):
                if k > 0:
                    Hj = self.H_gt[j][k]
                    mo_R = mo_R.at[j].set(Hj.R)
                    mo_t = mo_t.at[j].set(Hj.t)
                    mo_valid = mo_valid.at[j].set(True)
                L0 = SE3(
                    jnp.eye(3, dtype=jnp.float32),
                    jnp.mean(self.obj_points_w[j][0], axis=0),
                )
                Lk = L0
                for kk in range(1, k + 1):
                    Lk = se3_compose(self.H_gt[j][kk], Lk)
                po_R = po_R.at[j].set(Lk.R)
                po_t = po_t.at[j].set(Lk.t)
                po_valid = po_valid.at[j].set(True)
            objects = ObjectObs(
                motion=SE3(mo_R, mo_t),
                motion_valid=mo_valid,
                pose=SE3(po_R, po_t),
                pose_valid=po_valid,
                label=jnp.asarray(
                    [j + 1 if j < cfg.n_objects else -1 for j in range(cfg.no)],
                    jnp.int32,
                ),
            )

            out.append(
                FrontendOutput(
                    frame_id=jnp.asarray(k, jnp.int32),
                    timestamp=jnp.asarray(k * 0.1, jnp.float32),
                    X_world=self.X_odo[k],
                    static_obs=static,
                    dynamic_obs=dynamic,
                    objects=objects,
                )
            )
        return out


def _se3_matrix(g: SE3):
    import jax.numpy as jnp

    top = jnp.concatenate([g.R, g.t[..., None]], axis=-1)
    bottom = jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    return jnp.concatenate([top, bottom], axis=-2)
