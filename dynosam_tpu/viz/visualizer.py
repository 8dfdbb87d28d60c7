"""Debug visualization: tracks, masks, flow, depth, bounding boxes.

Host-side (numpy/cv2) analog of the reference's OpenCV debug imagery
(`RGBDInstanceFrontendModule.cc:152-170`, `visualizer/ColourMap.hpp`,
`visualizer/Display.hpp:36`).  Produces annotated frames for inspection /
video dumps; no effect on the compute path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _colour(i: int):
    """Deterministic distinct colour per id (ColourMap analog)."""
    rng = np.random.default_rng(int(i) * 7919 + 13)
    c = rng.integers(60, 255, 3)
    return int(c[0]), int(c[1]), int(c[2])


def gray_to_bgr(gray: np.ndarray) -> np.ndarray:
    g = np.clip(np.asarray(gray), 0, 255).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def draw_tracks(
    image_bgr: np.ndarray,
    uv: np.ndarray,
    valid: np.ndarray,
    prev_uv: Optional[np.ndarray] = None,
    colour=(0, 255, 0),
    radius: int = 2,
) -> np.ndarray:
    import cv2

    out = image_bgr.copy()
    uv = np.asarray(uv)
    valid = np.asarray(valid)
    for i in np.nonzero(valid)[0]:
        p = tuple(np.round(uv[i]).astype(int))
        cv2.circle(out, p, radius, colour, -1)
        if prev_uv is not None:
            q = tuple(np.round(np.asarray(prev_uv)[i]).astype(int))
            cv2.line(out, q, p, colour, 1)
    return out


def draw_object_tracks(
    image_bgr: np.ndarray,
    uv: np.ndarray,
    obj: np.ndarray,
    valid: np.ndarray,
) -> np.ndarray:
    import cv2

    out = image_bgr.copy()
    for i in np.nonzero(np.asarray(valid))[0]:
        j = int(np.asarray(obj)[i])
        p = tuple(np.round(np.asarray(uv)[i]).astype(int))
        cv2.circle(out, p, 2, _colour(j + 1), -1)
    return out


def overlay_mask(image_bgr: np.ndarray, mask: np.ndarray, alpha=0.45):
    out = image_bgr.astype(np.float32)
    mask = np.asarray(mask)
    for l in np.unique(mask):
        if l <= 0:
            continue
        c = np.asarray(_colour(l), np.float32)
        sel = mask == l
        out[sel] = (1 - alpha) * out[sel] + alpha * c
    return out.astype(np.uint8)


def flow_to_bgr(flow: np.ndarray, max_mag: Optional[float] = None):
    """HSV flow visualization (hue = direction, value = magnitude)."""
    import cv2

    flow = np.asarray(flow)
    mag = np.linalg.norm(flow, axis=-1)
    ang = np.arctan2(flow[..., 1], flow[..., 0])
    if max_mag is None:
        max_mag = max(float(np.percentile(mag, 95)), 1e-6)
    hsv = np.zeros((*mag.shape, 3), np.uint8)
    hsv[..., 0] = ((ang + np.pi) / (2 * np.pi) * 179).astype(np.uint8)
    hsv[..., 1] = 255
    hsv[..., 2] = np.clip(mag / max_mag * 255, 0, 255).astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)


def depth_to_bgr(depth: np.ndarray, max_depth: float = 40.0):
    import cv2

    d = np.clip(np.asarray(depth), 0, max_depth) / max_depth
    d8 = (d * 255).astype(np.uint8)
    return cv2.applyColorMap(255 - d8, cv2.COLORMAP_JET)


def frontend_debug_image(images, packet, prev_uv_s=None) -> np.ndarray:
    """Composite debug frame: static tracks (green) + per-object dynamic
    tracks + mask overlay (the reference's tracking debug image)."""
    base = gray_to_bgr(np.asarray(images.gray))
    base = overlay_mask(base, np.asarray(images.mask))
    base = draw_tracks(
        base,
        np.asarray(packet.static_obs.uv),
        np.asarray(packet.static_obs.valid),
        prev_uv=prev_uv_s,
    )
    base = draw_object_tracks(
        base,
        np.asarray(packet.dynamic_obs.uv),
        np.asarray(packet.dynamic_obs.obj),
        np.asarray(packet.dynamic_obs.valid),
    )
    return base


class FrontendDisplay:
    """Display loop with video dump — the working analog of the reference's
    `DisplayBase`/`OpenCVFrontendDisplay` (`visualizer/Display.hpp:36`,
    `OpenCVFrontendDisplay.cc:32-42`; the reference's OpenCV body is a stub
    and its real displays live in the ROS layer, which doesn't exist here).

    `spin_once(images, packet)` composes the tracking debug image and
    (a) appends it to an mp4/avi via cv2.VideoWriter when `video_path` is
    set, (b) shows it in a window when `show=True` and a GUI exists,
    (c) keeps it readable at `.last_frame`.
    """

    def __init__(
        self,
        video_path: Optional[str] = None,
        fps: float = 10.0,
        show: bool = False,
        window: str = "dynosam_tpu frontend",
    ):
        self.video_path = video_path
        self.fps = fps
        self.show = show
        self.window = window
        self._writer = None
        self.last_frame: Optional[np.ndarray] = None
        self._prev_uv_s: Optional[np.ndarray] = None

    def spin_once(self, images, packet) -> np.ndarray:
        frame = frontend_debug_image(images, packet, prev_uv_s=self._prev_uv_s)
        self._prev_uv_s = np.asarray(packet.static_obs.uv).copy()
        self.last_frame = frame
        if self.video_path is not None:
            import cv2

            if self._writer is None:
                h, w = frame.shape[:2]
                fourcc = cv2.VideoWriter_fourcc(
                    *("mp4v" if self.video_path.endswith(".mp4") else "MJPG")
                )
                self._writer = cv2.VideoWriter(
                    self.video_path, fourcc, self.fps, (w, h)
                )
            self._writer.write(frame)
        if self.show:
            import cv2

            try:
                cv2.imshow(self.window, frame)
                cv2.waitKey(1)
            except cv2.error:
                self.show = False  # headless environment: disable quietly
        return frame

    def close(self):
        if self._writer is not None:
            self._writer.release()
            self._writer = None
        if self.show:
            import cv2

            try:
                cv2.destroyWindow(self.window)
            except cv2.error:
                pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
