"""Oxford Multimotion Dataset (OMD) loader (reference loader type 3).

Uses the reference's preprocessed folder-per-modality layout
(`src/dataprovider/OMDDataProvider.cc:863-1060`): `image_0/ depth/ flow/
semantic/ pose_gt.txt object_pose.txt times.txt` with depth stored as
disparity PNGs converted via `depth = baseline * fx / (disp / 256)`
(`OMDDataProvider.cc:898-912`); intrinsics from `oxford.yaml` when present
(`:1219-1227`).  Instance masks may be text-format (`loadSemanticMask`).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..core.camera import CameraParams
from .kitti import KittiDataset

# OMD RGB-D rig defaults (kalibr); baseline 50mm
OMD_FX = 528.174
OMD_FY = 528.967
OMD_CX = 312.339
OMD_CY = 242.119
OMD_BASELINE_M = 0.05


class OMDDataset(KittiDataset):
    def __init__(
        self,
        path: str,
        starting_frame: int = -1,
        ending_frame: int = -1,
    ):
        fx = OMD_FX
        yaml_path = os.path.join(path, "oxford.yaml")
        self._yaml_intrinsics = None
        if os.path.exists(yaml_path):
            import yaml

            with open(yaml_path) as f:
                y = yaml.safe_load(f) or {}
            self._yaml_intrinsics = (
                y.get("Camera.fx", OMD_FX),
                y.get("Camera.fy", OMD_FY),
                y.get("Camera.cx", OMD_CX),
                y.get("Camera.cy", OMD_CY),
            )
            fx = self._yaml_intrinsics[0]
        super().__init__(
            path,
            starting_frame,
            ending_frame,
            baseline=OMD_BASELINE_M * fx,  # depth = (baseline*fx)/(disp/256)
            depth_scale=256.0,
            prefer_motion_mask=False,
        )

    def camera_params(self) -> CameraParams:
        if self._cam is None:
            import cv2

            img = cv2.imread(
                os.path.join(self.rgb_dir, "000000.png"), cv2.IMREAD_UNCHANGED
            )
            h, w = (img.shape[:2] if img is not None else (480, 640))
            fx, fy, cx, cy = self._yaml_intrinsics or (
                OMD_FX,
                OMD_FY,
                OMD_CX,
                OMD_CY,
            )
            self._cam = CameraParams.create(fx, fy, cx, cy, w, h)
        return self._cam
