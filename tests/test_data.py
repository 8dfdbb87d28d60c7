"""Dataset loader tests on generated on-disk fixtures (the analog of
reference `test_dataset_provider.cc` with tmp-file fixtures)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def make_fake_kitti(root, n=3, h=64, w=96):
    os.makedirs(f"{root}/image_0", exist_ok=True)
    os.makedirs(f"{root}/depth", exist_ok=True)
    os.makedirs(f"{root}/flow", exist_ok=True)
    os.makedirs(f"{root}/motion", exist_ok=True)
    rng = np.random.default_rng(0)
    for k in range(n):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(f"{root}/image_0/{k:06d}.png", img)
        # disparity png: disp/256 = d -> depth = 387.5744 / d
        disp = np.full((h, w), 256 * 4, np.uint16)  # d=4 -> depth ~96.9
        cv2.imwrite(f"{root}/depth/{k:06d}.png", disp)
        flow = rng.normal(0, 2, (h, w, 2)).astype(np.float32)
        with open(f"{root}/flow/{k:06d}.flo", "wb") as f:
            np.asarray([202021.25], np.float32).tofile(f)
            np.asarray([w, h], np.int32).tofile(f)
            flow.astype(np.float32).tofile(f)
        mask = np.zeros((h, w), np.uint16)
        mask[20:40, 30:60] = 2
        cv2.imwrite(f"{root}/motion/{k:06d}.png", mask)
    np.savetxt(f"{root}/times.txt", np.arange(n) * 0.1)
    # pose_gt: n rows of flattened 3x4 (with frame id col)
    rows = []
    for k in range(n):
        T = np.eye(4)
        T[0, 3] = 0.5 * k
        rows.append([k] + T[:3, :4].reshape(-1).tolist())
    np.savetxt(f"{root}/pose_gt.txt", np.asarray(rows))
    return root


def test_kitti_loader(tmp_path):
    from dynosam_tpu.data.kitti import KittiDataset

    root = make_fake_kitti(str(tmp_path))
    ds = KittiDataset(root)
    assert len(ds) == 3
    fr = ds.frame(1)
    assert fr.gray.shape == (64, 96)
    assert fr.depth.shape == (64, 96)
    np.testing.assert_allclose(
        np.asarray(fr.depth)[0, 0], 387.5744 / 4.0, rtol=1e-5
    )
    assert fr.flow.shape == (64, 96, 2)
    assert int(np.asarray(fr.mask).max()) == 2
    gt = ds.ground_truth(2)
    # first-frame-aligned: frame 2 at x = 1.0
    np.testing.assert_allclose(gt.X_world[0, 3], 1.0, atol=1e-9)


def test_kitti_prefetch(tmp_path):
    from dynosam_tpu.data.kitti import KittiDataset

    root = make_fake_kitti(str(tmp_path / "k2"))
    ds = KittiDataset(root)
    frames = list(ds.prefetched_frames())
    assert len(frames) == 3


def test_vkitti_flow_decode():
    from dynosam_tpu.data.vkitti import decode_vkitti_flow

    h, w = 10, 20
    # encode a flow of (+3, -2) px
    fx, fy = 3.0, -2.0
    r = np.uint16((fx / (w - 1.0) + 1.0) / 2.0 * (2**16 - 1))
    g = np.uint16((fy / (h - 1.0) + 1.0) / 2.0 * (2**16 - 1))
    bgr = np.zeros((h, w, 3), np.uint16)
    bgr[..., 2] = r
    bgr[..., 1] = g
    bgr[..., 0] = 1  # valid
    flow = decode_vkitti_flow(bgr)
    np.testing.assert_allclose(flow[5, 5], [fx, fy], atol=0.01)
    # invalid pixels -> 0
    bgr[..., 0] = 0
    flow2 = decode_vkitti_flow(bgr)
    np.testing.assert_allclose(flow2, 0.0)


def test_factory(tmp_path):
    from dynosam_tpu.data.factory import create_dataset

    root = make_fake_kitti(str(tmp_path / "k3"))
    ds = create_dataset(0, root)
    assert len(ds) == 3
    with pytest.raises(ValueError):
        create_dataset(9, root)
