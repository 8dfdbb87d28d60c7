#!/usr/bin/env python
"""Back-project a depth image (+ optional color) into a PLY point cloud.

Analog of the reference's `dynosam_utils/misc/depth_to_pointcloud_node.py`.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def write_ply(path, pts, colors=None):
    n = pts.shape[0]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write(
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            )
        f.write("end_header\n")
        for i in range(n):
            row = f"{pts[i,0]:.4f} {pts[i,1]:.4f} {pts[i,2]:.4f}"
            if colors is not None:
                c = colors[i]
                row += f" {int(c[0])} {int(c[1])} {int(c[2])}"
            f.write(row + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", required=True, help="depth image (16-bit png, mm or metric)")
    ap.add_argument("--rgb", default=None)
    ap.add_argument("--out", required=True, help="output .ply")
    ap.add_argument("--fx", type=float, required=True)
    ap.add_argument("--fy", type=float, required=True)
    ap.add_argument("--cx", type=float, required=True)
    ap.add_argument("--cy", type=float, required=True)
    ap.add_argument("--depth_scale", type=float, default=1000.0)
    ap.add_argument("--max_depth", type=float, default=40.0)
    ap.add_argument("--stride", type=int, default=2)
    args = ap.parse_args()

    import cv2

    d = cv2.imread(args.depth, cv2.IMREAD_UNCHANGED).astype(np.float32)
    depth = d / args.depth_scale
    h, w = depth.shape
    ys, xs = np.mgrid[0:h:args.stride, 0:w:args.stride]
    z = depth[ys, xs]
    ok = (z > 0) & (z < args.max_depth)
    x = (xs - args.cx) / args.fx * z
    y = (ys - args.cy) / args.fy * z
    pts = np.stack([x[ok], y[ok], z[ok]], axis=-1)
    colors = None
    if args.rgb:
        rgb = cv2.imread(args.rgb)[..., ::-1]
        colors = rgb[ys, xs][ok]
    write_ply(args.out, pts, colors)
    print(f"wrote {pts.shape[0]} points to {args.out}")


if __name__ == "__main__":
    main()
