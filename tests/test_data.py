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


def make_fake_omd(root, n=3, h=48, w=64, fx=100.0, baseline=0.05):
    """OMD preprocessed layout: text masks, .flo flow, disparity PNGs,
    pose_gt with 4x4 rows, object_pose with Rodrigues rows, oxford.yaml."""
    for d in ["image_0", "depth", "flow", "semantic"]:
        os.makedirs(f"{root}/{d}", exist_ok=True)
    rng = np.random.default_rng(1)
    for k in range(n):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(f"{root}/image_0/{k:06d}.png", img)
        # disparity d_png/256 = 4 -> depth = baseline * fx / 4
        cv2.imwrite(
            f"{root}/depth/{k:06d}.png", np.full((h, w), 256 * 4, np.uint16)
        )
        flow = rng.normal(0, 1, (h, w, 2)).astype(np.float32)
        with open(f"{root}/flow/{k:06d}.flo", "wb") as f:
            np.asarray([202021.25], np.float32).tofile(f)
            np.asarray([w, h], np.int32).tofile(f)
            flow.tofile(f)
        mask = np.zeros((h, w), np.int32)
        mask[10:20, 20:40] = 1
        np.savetxt(f"{root}/semantic/{k:06d}.txt", mask, fmt="%d")
    np.savetxt(f"{root}/times.txt", np.arange(n) * 0.1)
    # pose_gt: frame + 16 values; give frame 0 a NON-identity pose so the
    # alignment branch is exercised
    rows = []
    for k in range(n):
        T = np.eye(4)
        T[:3, 3] = [1.0 + 0.2 * k, 2.0, 3.0]
        rows.append([k] + T.reshape(-1).tolist())
    np.savetxt(f"{root}/pose_gt.txt", np.asarray(rows))
    # object_pose: frame obj t(3) rodrigues(3); rotation pi/2 about z
    obj_rows = []
    for k in range(n):
        obj_rows.append([k, 1, 1.5 + 0.2 * k, 2.0, 4.0, 0.0, 0.0, np.pi / 2])
    np.savetxt(f"{root}/object_pose.txt", np.asarray(obj_rows))
    with open(f"{root}/oxford.yaml", "w") as f:
        f.write(
            f"'Camera.fx': {fx}\n'Camera.fy': {fx}\n'Camera.cx': {w/2}\n"
            f"'Camera.cy': {h/2}\n'Camera.width': {w}\n'Camera.height': {h}\n"
            f"'Camera.baseline': {baseline}\n"
        )
    return root


def test_omd_loader(tmp_path):
    from dynosam_tpu.data.omd import OMDDataset

    root = make_fake_omd(str(tmp_path / "omd"))
    ds = OMDDataset(root)
    assert len(ds) == 3
    cam = ds.camera_params()
    np.testing.assert_allclose(float(np.asarray(cam.fx)), 100.0)
    fr = ds.frame(1)
    # disparity 4 -> depth = 0.05 * 100 / 4 = 1.25
    np.testing.assert_allclose(np.asarray(fr.depth)[0, 0], 1.25, rtol=1e-5)
    assert int(np.asarray(fr.mask).max()) == 1  # text-format mask decoded
    assert fr.flow.shape == (48, 64, 2)
    gt = ds.ground_truth(2)
    # aligned: X_2 = X_0^-1 X_2 -> x translation 0.4
    np.testing.assert_allclose(gt.X_world[0, 3], 0.4, atol=1e-9)
    # object pose re-expressed in the aligned world: offset keeps the
    # camera-relative translation [0.5, 0, 1]
    L = gt.object_poses[1]
    np.testing.assert_allclose(L[:3, 3], [0.9, 0.0, 1.0], atol=1e-9)
    # world-centric motion between frames (pure x translation of 0.2... the
    # camera moves 0.2 and the object moves 0.2 -> H translation = 0.2)
    H = gt.object_motions[1]
    np.testing.assert_allclose(H[:3, 3], [0.2, 0.0, 0.0], atol=1e-7)


def make_fake_cluster(root, n=2, h=96, w=160, fx=80.0, baseline=0.3):
    for d in [
        "images/left", "images/right", "optical_flow", "instance_masks",
        "pose", "landmarks/left",
    ]:
        os.makedirs(f"{root}/{d}", exist_ok=True)
    rng = np.random.default_rng(2)
    # shifted stereo pair -> constant disparity 8 -> depth = fx*b/8
    for k in range(n):
        left = rng.integers(0, 255, (h, w), dtype=np.uint8)
        left = np.repeat(left, 3).reshape(h, w, 3)
        right = np.roll(left, -8, axis=1)
        cv2.imwrite(f"{root}/images/left/{k:06d}.png", left)
        cv2.imwrite(f"{root}/images/right/{k:06d}.png", right)
        flow = np.zeros((h, w, 2), np.float32)
        with open(f"{root}/optical_flow/{k:06d}.flo", "wb") as f:
            np.asarray([202021.25], np.float32).tofile(f)
            np.asarray([w, h], np.int32).tofile(f)
            flow.tofile(f)
        mask = np.zeros((h, w), np.uint16)
        mask[5:20, 5:25] = 7          # detected instance label 7
        cv2.imwrite(f"{root}/instance_masks/{k:06d}.png", mask)
        # pantheon pose file: camera + 1 object (x y z qx qy qz qw)
        np.savetxt(
            f"{root}/pose/{k}",
            np.asarray(
                [
                    [0.1 * k, 0, 0, 0, 0, 0, 1.0],
                    [1.0 + 0.3 * k, 0, 5.0, 0, 0, 0, 1.0],
                ]
            ),
        )
        # landmarks inside the instance bbox, all of cluster 1
        np.savetxt(
            f"{root}/landmarks/left/{k}",
            np.asarray([[11, 10.0, 10.0], [12, 15.0, 12.0]]),
        )
    np.savetxt(f"{root}/landmark_mapping.txt", np.asarray([[11, 1], [12, 1]]), fmt="%d")
    # intrinsic.txt: two 3x4 projections, right with tx = -fx*baseline
    K = np.asarray([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1.0]])
    P1 = np.hstack([K, np.zeros((3, 1))])
    P2 = K @ np.hstack([np.eye(3), np.asarray([[-baseline], [0], [0]])])
    with open(f"{root}/intrinsic.txt", "w") as f:
        for row in P1:
            f.write(" ".join(str(v) for v in row) + "\n")
        f.write("\n")
        for row in P2:
            f.write(" ".join(str(v) for v in row) + "\n")
    return root


def test_cluster_loader(tmp_path):
    from dynosam_tpu.data.cluster import ClusterSlamDataset

    root = make_fake_cluster(str(tmp_path / "cs"))
    ds = ClusterSlamDataset(root)
    assert len(ds) == 2
    cam = ds.camera_params()
    np.testing.assert_allclose(float(np.asarray(cam.fx)), 80.0)
    # baseline recovered from the projection matrices
    np.testing.assert_allclose(ds.baseline, 0.3, rtol=1e-6)
    fr = ds.frame(0)
    # SGBM depth near fx*b/disp = 80*0.3/8 = 3.0 where matched
    d = np.asarray(fr.depth)
    good = d[d > 0]
    assert good.size > 500
    assert abs(np.median(good) - 3.0) < 0.5
    # mask relabelled from instance label 7 to cluster id 1
    assert int(np.asarray(fr.mask).max()) == 1
    gt = ds.ground_truth(1)
    np.testing.assert_allclose(gt.X_world[0, 3], 0.1, atol=1e-9)
    assert 1 in gt.object_poses
    np.testing.assert_allclose(gt.object_motions[1][:3, 3], [0.3, 0, 0], atol=1e-7)


def test_cluster_loader_jax_stereo(tmp_path):
    from dynosam_tpu.data.cluster import ClusterSlamDataset

    root = make_fake_cluster(str(tmp_path / "cs2"))
    ds = ClusterSlamDataset(root, stereo_backend="jax")
    fr = ds.frame(0)
    d = np.asarray(fr.depth)
    good = d[d > 0]
    assert good.size > 500
    assert abs(np.median(good) - 3.0) < 0.5


def test_aria_loader(tmp_path):
    """Aria layout: flow folder defines size + nanosecond-stem timestamps;
    hardcoded rig when calibration json absent; mm depth scaling."""
    from dynosam_tpu.data.aria import ProjectAriaDataset

    root = str(tmp_path / "aria")
    for d in ["rgb_sync", "depth_sync", "optical_flow", "instance_masks"]:
        os.makedirs(f"{root}/{d}", exist_ok=True)
    h, w = 36, 64
    rng = np.random.default_rng(4)
    stems = [1_000_000_000, 1_100_000_000, 1_200_000_000]
    for k, stem in enumerate(stems):
        cv2.imwrite(
            f"{root}/rgb_sync/{k:06d}.png",
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        )
        cv2.imwrite(
            f"{root}/depth_sync/{k:06d}.png",
            np.full((h, w), 2500, np.uint16),   # 2.5 m in mm
        )
        flow = np.zeros((h, w, 2), np.float32)
        with open(f"{root}/optical_flow/{stem}.flo", "wb") as f:
            np.asarray([202021.25], np.float32).tofile(f)
            np.asarray([w, h], np.int32).tofile(f)
            flow.tofile(f)
        cv2.imwrite(
            f"{root}/instance_masks/{k:06d}.png", np.zeros((h, w), np.uint16)
        )
    ds = ProjectAriaDataset(root)
    assert len(ds) == 3
    np.testing.assert_allclose(ds.timestamp(1), 1.1)
    cam = ds.camera_params()
    np.testing.assert_allclose(float(np.asarray(cam.fx)), 267.644012)
    fr = ds.frame(0)
    np.testing.assert_allclose(np.asarray(fr.depth)[0, 0], 2.5)


def make_fake_vkitti(root, n=3, h=48, w=64):
    sub = "Scene01/clone"
    rgb = f"{root}/vkitti_2.0.3_rgb/{sub}/frames/rgb/Camera_0"
    textgt = f"{root}/vkitti_2.0.3_textgt/{sub}"
    os.makedirs(rgb, exist_ok=True)
    os.makedirs(textgt, exist_ok=True)
    rng = np.random.default_rng(0)
    for k in range(n):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(f"{rgb}/rgb_{k:05d}.jpg", img)
    # extrinsic.txt: world->camera 4x4 rows; camera moves +x by 0.5/frame
    with open(f"{textgt}/extrinsic.txt", "w") as f:
        f.write("frame cameraID r1,1 ...\n")
        for k in range(n):
            T = np.eye(4)
            T[0, 3] = 0.5 * k
            Tinv = np.linalg.inv(T)
            f.write(f"{k} 0 " + " ".join(map(str, Tinv.reshape(-1))) + "\n")
            f.write(f"{k} 1 " + " ".join(map(str, np.eye(4).reshape(-1))) + "\n")
    # pose.txt: one object (track 7) moving +z in camera space
    hdr = ("frame cameraID trackID alpha width height length "
           "world_space_X world_space_Y world_space_Z "
           "rotation_world_space_y rotation_world_space_x rotation_world_space_z "
           "camera_space_X camera_space_Y camera_space_Z "
           "rotation_camera_space_y rotation_camera_space_x rotation_camera_space_z")
    with open(f"{textgt}/pose.txt", "w") as f:
        f.write(hdr + "\n")
        for k in range(n):
            f.write(
                f"{k} 0 7 0 1.5 1.4 3.2 0 0 0 0 0 0 "
                f"1.0 0.5 {5.0 + 1.0 * k} 0 0 0\n"
            )
    with open(f"{textgt}/bbox.txt", "w") as f:
        f.write("frame cameraID trackID left right top bottom number_pixels "
                "truncation_ratio occupancy_ratio isMoving\n")
        for k in range(n):
            f.write(f"{k} 0 7 10 30 12 28 200 0.0 0.9 True\n")
    return root


def test_vkitti_object_gt(tmp_path):
    """pose.txt / bbox.txt decode: world object poses through the aligned
    extrinsic + world-centric motions (`VirtualKittidataProvider.cc:
    387-527` semantics)."""
    from dynosam_tpu.data.vkitti import VirtualKittiDataset

    root = make_fake_vkitti(str(tmp_path / "vk"))
    ds = VirtualKittiDataset(root)
    assert len(ds) == 3
    # camera: first-frame aligned, frame 2 at x=1.0
    np.testing.assert_allclose(ds.gt_poses[2][0, 3], 1.0, atol=1e-9)
    gt1 = ds.ground_truth(1)
    assert 7 in gt1.object_poses
    # identity rotation; L_world = X_w @ L_cam -> x = 0.5*k + 1.0
    L = gt1.object_poses[7]
    np.testing.assert_allclose(L[:3, 3], [1.5, 0.5, 6.0], atol=1e-9)
    np.testing.assert_allclose(L[:3, :3], np.eye(3), atol=1e-12)
    # motion: +0.5 x (camera) + 1.0 z (object) per frame
    H = gt1.object_motions[7]
    np.testing.assert_allclose(H[:3, 3], [0.5, 0.0, 1.0], atol=1e-9)
    # bbox metadata parsed
    assert ds.gt_bboxes[1][7][1] is True
