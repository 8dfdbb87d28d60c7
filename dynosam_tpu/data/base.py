"""Dataset provider base: host-side image loading -> device FrameImages.

The analog of `DataProvider`/`DynoDatasetProvider`
(`dataprovider/DataProvider.hpp:25-100`, `dataprovider/DatasetProvider.hpp:
58-311`): per-dataset loaders produce `FrameImages` (gray/depth/flow/mask
tensors) plus optional ground truth; a thin prefetch wrapper overlaps disk
decode with device compute (the TPU-native replacement for the reference's
data-interface thread + queue).
"""

from __future__ import annotations

import dataclasses
import threading
import queue as queue_mod
from typing import Iterator, List, Optional

import jax.numpy as jnp
import numpy as np

from ..core.camera import CameraParams
from ..core.lie import SE3
from ..frontend.frontend import FrameImages


@dataclasses.dataclass
class GroundTruthFrame:
    """Analog of `GroundTruthInputPacket` (`common/GroundTruthPacket.hpp`)."""

    frame_id: int
    timestamp: float
    X_world: np.ndarray                  # (4, 4) camera pose
    object_poses: dict                   # label -> (4, 4) pose ^wL_k
    object_motions: dict                 # label -> (4, 4) motion ^wH_k


class DatasetProvider:
    """Sequential dataset interface."""

    def __init__(self, path: str, starting_frame: int = -1, ending_frame: int = -1):
        self.path = path
        self.start = max(0, starting_frame)
        self.end = ending_frame

    def __len__(self) -> int:
        raise NotImplementedError

    def camera_params(self) -> CameraParams:
        raise NotImplementedError

    def frame(self, idx: int) -> FrameImages:
        raise NotImplementedError

    def ground_truth(self, idx: int) -> Optional[GroundTruthFrame]:
        return None

    def frames(self) -> Iterator[FrameImages]:
        n = len(self)
        end = n if self.end < 0 else min(self.end, n)
        for i in range(self.start, end):
            yield self.frame(i)

    def prefetched_frames(self, depth: int = 2) -> Iterator[FrameImages]:
        """Background-thread prefetch (host decode overlaps device work)."""
        q: queue_mod.Queue = queue_mod.Queue(maxsize=depth)
        stop = object()

        def worker():
            try:
                for f in self.frames():
                    q.put(f)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def to_gray(img: np.ndarray) -> np.ndarray:
    if img.ndim == 3:
        img = img[..., :3].astype(np.float32)
        return img[..., 0] * 0.114 + img[..., 1] * 0.587 + img[..., 2] * 0.299
    return img.astype(np.float32)
