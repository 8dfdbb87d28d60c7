#!/usr/bin/env python
"""Convert KITTI semantic-instance masks to motion masks.

Analog of the reference's `dynosam_utils/misc/KittiSemaniticToMotion.cc`:
keep only instance labels whose GT object motion exceeds a threshold
(i.e. actually-moving objects), writing `motion/` masks alongside the
`semantic/` ones.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_path", required=True)
    ap.add_argument("--min_motion_m", type=float, default=0.05,
                    help="minimum per-frame GT translation to count as moving")
    args = ap.parse_args()

    import cv2

    from dynosam_tpu.data.kitti import KittiDataset

    ds = KittiDataset(args.dataset_path, prefer_motion_mask=False)
    out_dir = os.path.join(args.dataset_path, "motion")
    os.makedirs(out_dir, exist_ok=True)

    n_written = 0
    for k in range(len(ds)):
        gt = ds.ground_truth(k)
        moving = set()
        if gt is not None:
            for obj, H in gt.object_motions.items():
                if np.linalg.norm(H[:3, 3]) >= args.min_motion_m:
                    moving.add(obj)
        fr = ds.frame(k)
        mask = np.asarray(fr.mask)
        motion_mask = np.where(np.isin(mask, list(moving)), mask, 0)
        cv2.imwrite(
            os.path.join(out_dir, f"{k:06d}.png"),
            motion_mask.astype(np.uint16),
        )
        n_written += 1
    print(f"wrote {n_written} motion masks to {out_dir}")


if __name__ == "__main__":
    main()
