"""ClusterSLAM / CARLA dataset loader (reference loader type 2).

Layout per `ClusterSlamDataLoader`
(`src/dataprovider/ClusterSlamDataProvider.cc:60-95`):

    <root>/images/left/*.png     <root>/images/right/*.png
    <root>/optical_flow/*.flo
    <root>/instance_masks/*.png
    <root>/pose/*                (per-frame camera pose files)
    <root>/landmarks/left, landmark_mapping.txt, intrinsic.txt

Depth is *computed* by dense stereo reconstruction from the left/right pair
(`:298-318`); here we use OpenCV SGBM on the host (the reference's
`StereoMatcher` wraps the same OpenCV machinery) and convert disparity ->
depth with fx * baseline / disp.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.camera import CameraParams
from ..frontend.frontend import FrameImages
from .base import DatasetProvider, GroundTruthFrame, to_gray
from .kitti import _read_flo


class ClusterSlamDataset(DatasetProvider):
    def __init__(
        self,
        path: str,
        starting_frame: int = -1,
        ending_frame: int = -1,
        baseline: float = 0.5,
    ):
        super().__init__(path, starting_frame, ending_frame)
        self.left_dir = os.path.join(path, "images/left")
        self.right_dir = os.path.join(path, "images/right")
        self.flow_dir = os.path.join(path, "optical_flow")
        self.mask_dir = os.path.join(path, "instance_masks")
        self.baseline = baseline
        self.left_files = sorted(os.listdir(self.left_dir))
        self.right_files = sorted(os.listdir(self.right_dir))
        self.flow_files = (
            sorted(os.listdir(self.flow_dir))
            if os.path.isdir(self.flow_dir)
            else []
        )
        self.mask_files = (
            sorted(os.listdir(self.mask_dir))
            if os.path.isdir(self.mask_dir)
            else []
        )
        self._cam: Optional[CameraParams] = None
        self._sgbm = None

    def __len__(self):
        return len(self.left_files)

    def camera_params(self) -> CameraParams:
        if self._cam is None:
            import cv2

            p = os.path.join(self.path, "intrinsic.txt")
            img = cv2.imread(os.path.join(self.left_dir, self.left_files[0]))
            h, w = img.shape[:2]
            if os.path.exists(p):
                vals = np.loadtxt(p).reshape(-1)
                fx, fy, cx, cy = vals[0], vals[1], vals[2], vals[3]
            else:
                fx = fy = 0.5 * w
                cx, cy = w / 2, h / 2
            self._cam = CameraParams.create(fx, fy, cx, cy, w, h)
        return self._cam

    def _stereo_depth(self, left_gray, right_gray):
        import cv2

        if self._sgbm is None:
            self._sgbm = cv2.StereoSGBM_create(
                minDisparity=0,
                numDisparities=128,
                blockSize=7,
                P1=8 * 49,
                P2=32 * 49,
                uniquenessRatio=10,
                speckleWindowSize=100,
                speckleRange=2,
            )
        disp = (
            self._sgbm.compute(
                left_gray.astype(np.uint8), right_gray.astype(np.uint8)
            ).astype(np.float32)
            / 16.0
        )
        cam = self.camera_params()
        fx = float(np.asarray(cam.fx))
        with np.errstate(divide="ignore"):
            depth = np.where(disp > 0.5, fx * self.baseline / np.maximum(disp, 0.5), 0.0)
        return depth

    def frame(self, idx: int) -> FrameImages:
        import cv2

        left = cv2.imread(os.path.join(self.left_dir, self.left_files[idx]))
        right = cv2.imread(os.path.join(self.right_dir, self.right_files[idx]))
        gray = to_gray(left)  # cv2 BGR; to_gray uses BGR weights
        gray_r = to_gray(right)
        depth = self._stereo_depth(gray, gray_r)

        if idx < len(self.flow_files):
            fp = os.path.join(self.flow_dir, self.flow_files[idx])
            flow = (
                _read_flo(fp)
                if fp.endswith(".flo")
                else np.zeros((*gray.shape, 2), np.float32)
            )
        else:
            flow = np.zeros((*gray.shape, 2), np.float32)

        if idx < len(self.mask_files):
            mask = cv2.imread(
                os.path.join(self.mask_dir, self.mask_files[idx]),
                cv2.IMREAD_UNCHANGED,
            )
            if mask.ndim == 3:
                mask = mask[..., 0]
            mask = mask.astype(np.int32)
        else:
            mask = np.zeros(gray.shape, np.int32)

        return FrameImages(
            gray=jnp.asarray(gray, jnp.float32),
            depth=jnp.asarray(depth, jnp.float32),
            flow=jnp.asarray(flow, jnp.float32),
            mask=jnp.asarray(mask, jnp.int32),
        )
