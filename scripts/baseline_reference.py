#!/usr/bin/env python
"""MEASURED reference-frontend baseline: the DynoSAM per-frame vision loop
re-enacted with the reference's own engine (OpenCV, CPU) on the exact frames
`bench.py` measures.

The reference's gtsam backend cannot run here (no gtsam in the image, no
network — see BASELINE.md), but its FRONTEND is OpenCV calls on CPU and
those we CAN measure honestly.  This replays the reference's per-frame hot
path with the same calls and parameters it uses:

  * static KLT: `cv::calcOpticalFlowPyrLK`, 21x21 window, 3 pyramid levels,
    TermCriteria(30, 0.03) (`StaticFeatureTracker.cc:411-418`);
  * geometric verification: homography RANSAC over the tracked pairs
    (`KltFeatureTracker::geometricVerification`);
  * redetection to max_features_per_frame=1000 via
    `cv::goodFeaturesToTrack` with a min-distance occupancy mask
    (`FeatureDetector.cc`, GFTT default);
  * ego motion: 3d-2d absolute-pose RANSAC (`MotionSolver.cc`
    `ransac_threshold_pnp`, prob 0.995) -> `cv::solvePnPRansac`;
  * per-object dynamic sampling on the instance mask with constant pixel
    step + dense-flow propagation + per-object 3d-2d RANSAC motion solve
    (`ObjectTracker.cc` / `solveObjectMotion`).

Deliberately EXCLUDED (favours the reference): the joint flow+pose
refinement rounds and the 3D motion refinement (both gtsam), CLAHE, ORB
descriptors, depth-map undistortion.  The number this prints is therefore
an UPPER bound on the reference frontend's frames/s here.

Usage: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
           scripts/baseline_reference.py
Prints one JSON line {"metric": "reference_frontend_frames_per_s", ...} and
a per-stage breakdown on stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MAX_FEATURES = 1000
MIN_DIST = 20           # GFTT min distance / occupancy cell
KLT_WIN = (21, 21)
KLT_LEVELS = 3
DYN_STEP = 8            # dynamic sampling pixel stride (ref: every nth px)
FX = 718.0


def render_frames(n=12, h=384, w=1280):
    """Same rendered sequence as bench.py (CPU), converted to uint8 gray."""
    import jax

    from dynosam_tpu.testing.render import RenderConfig, RenderedScene

    rcfg = RenderConfig(
        n_frames=n, h=h, w=w, fx=FX,
        bg_depth=14.0, obj_depth=9.0, cam_step=0.10, obj_step=0.18,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        sc = RenderedScene(rcfg)
        frames = [jax.tree.map(np.asarray, f) for f in sc.frames()]
    fr = np.random.default_rng(0)
    frames = [
        f._replace(
            flow=f.flow + fr.normal(0.0, 0.5, f.flow.shape).astype(np.float32)
        )
        for f in frames
    ]
    out = []
    for f in frames:
        g = f.gray
        g8 = np.clip((g - g.min()) / max(g.max() - g.min(), 1e-6) * 255, 0, 255)
        out.append(
            dict(gray=g8.astype(np.uint8), depth=f.depth, flow=f.flow,
                 mask=np.asarray(f.mask))
        )
    return out


def backproject(uv, depth_img, fx, cx, cy):
    u = np.clip(uv[:, 0].astype(int), 0, depth_img.shape[1] - 1)
    v = np.clip(uv[:, 1].astype(int), 0, depth_img.shape[0] - 1)
    z = depth_img[v, u]
    x = (uv[:, 0] - cx) / fx * z
    y = (uv[:, 1] - cy) / fx * z
    return np.stack([x, y, z], -1), z > 0


def detect(cv2, gray, existing, n_needed):
    mask = np.full(gray.shape, 255, np.uint8)
    for p in existing:
        cv2.circle(mask, (int(p[0]), int(p[1])), MIN_DIST, 0, -1)
    pts = cv2.goodFeaturesToTrack(
        gray, maxCorners=int(n_needed), qualityLevel=0.001,
        minDistance=MIN_DIST, mask=mask,
    )
    return pts.reshape(-1, 2) if pts is not None else np.zeros((0, 2))


def main():
    import cv2

    cv2.setNumThreads(os.cpu_count() or 8)
    frames = render_frames()
    h, w = frames[0]["gray"].shape
    cx, cy = w / 2.0, h / 2.0
    K = np.array([[FX, 0, cx], [0, FX, cy], [0, 0, 1]], np.float64)
    crit = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.03)

    static_pts = detect(cv2, frames[0]["gray"], [], MAX_FEATURES)
    stage = {"klt": 0.0, "verify": 0.0, "detect": 0.0, "ego": 0.0, "obj": 0.0}
    n_steps = 0
    t_all0 = time.perf_counter()
    for k in range(1, len(frames)):
        prev, cur = frames[k - 1], frames[k]
        n_steps += 1

        t0 = time.perf_counter()
        nxt, st, _ = cv2.calcOpticalFlowPyrLK(
            prev["gray"], cur["gray"],
            static_pts.astype(np.float32).reshape(-1, 1, 2), None,
            winSize=KLT_WIN, maxLevel=KLT_LEVELS, criteria=crit,
        )
        st = st.reshape(-1).astype(bool)
        nxt = nxt.reshape(-1, 2)
        inb = (
            (nxt[:, 0] >= 0) & (nxt[:, 0] < w)
            & (nxt[:, 1] >= 0) & (nxt[:, 1] < h)
        )
        good = st & inb
        p_prev, p_cur = static_pts[good], nxt[good]
        stage["klt"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        if len(p_prev) >= 8:
            _, hmask = cv2.findHomography(p_prev, p_cur, cv2.RANSAC, 3.0)
            keep = hmask.reshape(-1).astype(bool)
            p_prev, p_cur = p_prev[keep], p_cur[keep]
        stage["verify"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        xyz_prev, zok = backproject(p_prev, prev["depth"], FX, cx, cy)
        if zok.sum() >= 6:
            cv2.solvePnPRansac(
                xyz_prev[zok].astype(np.float64),
                p_cur[zok].astype(np.float64).reshape(-1, 1, 2),
                K, None, iterationsCount=100, reprojectionError=1.0,
                confidence=0.995, flags=cv2.SOLVEPNP_EPNP,
            )
        stage["ego"] += time.perf_counter() - t0

        # per-object: sample mask, propagate by dense flow, PnP per object
        t0 = time.perf_counter()
        labels = np.unique(cur["mask"])
        for lbl in labels[labels > 0]:
            ys, xs = np.nonzero(prev["mask"] == lbl)
            sel = slice(None, None, DYN_STEP * DYN_STEP)
            ys, xs = ys[sel], xs[sel]
            if len(ys) < 10:
                continue
            uv_prev = np.stack([xs, ys], -1).astype(np.float32)
            fl = prev["flow"][ys, xs]
            uv_cur = uv_prev + fl
            xyz_o, zok_o = backproject(uv_prev, prev["depth"], FX, cx, cy)
            if zok_o.sum() >= 6:
                cv2.solvePnPRansac(
                    xyz_o[zok_o].astype(np.float64),
                    uv_cur[zok_o].astype(np.float64).reshape(-1, 1, 2),
                    K, None, iterationsCount=100, reprojectionError=1.0,
                    confidence=0.995, flags=cv2.SOLVEPNP_EPNP,
                )
        stage["obj"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        n_needed = MAX_FEATURES - len(p_cur)
        if n_needed > 50:
            new = detect(cv2, cur["gray"], p_cur, n_needed)
            p_cur = np.concatenate([p_cur, new], axis=0)
        static_pts = p_cur
        stage["detect"] += time.perf_counter() - t0

    dt = time.perf_counter() - t_all0
    fps = n_steps / dt
    for name, s in sorted(stage.items(), key=lambda kv: -kv[1]):
        print(
            f"  {name:8s} {s / n_steps * 1e3:7.2f} ms/frame", file=sys.stderr
        )
    print(
        f"reference-frontend replica (OpenCV {cv2.__version__}, "
        f"{os.cpu_count()} cpus): {fps:.2f} frames/s "
        f"({dt / n_steps * 1e3:.1f} ms/frame, {n_steps} steps)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "reference_frontend_frames_per_s",
                "value": round(fps, 3),
                "unit": "frames/s",
                "note": "OpenCV replica of the reference frontend hot path "
                        "(refinements excluded; upper bound)",
            }
        )
    )


if __name__ == "__main__":
    main()
