"""ByteTrack association tests (reference `common/byte_tracker/`)."""

import numpy as np

from dynosam_tpu.frontend.byte_tracker import (
    ByteTracker,
    hungarian,
    iou,
    mask_boxes,
    relabel_mask,
)


def test_hungarian_simple():
    cost = np.array([[1.0, 2.0, 0.1], [0.2, 3.0, 2.0], [3.0, 0.3, 2.0]])
    pairs = dict(hungarian(cost))
    assert pairs == {0: 2, 1: 0, 2: 1}


def test_iou():
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[5, 5, 15, 15], [20, 20, 30, 30]])
    m = iou(a, b)
    np.testing.assert_allclose(m[0, 0], 25 / 175, atol=1e-6)
    assert m[0, 1] == 0.0


def test_tracker_consistent_ids_across_frames():
    tr = ByteTracker()
    # two objects moving right by 3 px/frame
    ids_seen = []
    for k in range(5):
        boxes = np.array(
            [
                [10 + 3 * k, 10, 40 + 3 * k, 40],
                [100 + 3 * k, 50, 140 + 3 * k, 90],
            ],
            np.float64,
        )
        scores = np.array([0.9, 0.8])
        ids = tr.update(boxes, scores)
        ids_seen.append(ids)
    # same ids every frame, stable ordering
    for k in range(1, 5):
        assert ids_seen[k] == ids_seen[0]
    assert ids_seen[0][0] != ids_seen[0][1]


def test_tracker_handles_dropout():
    tr = ByteTracker(max_missed=3)
    b0 = np.array([[10, 10, 40, 40]], np.float64)
    id0 = tr.update(b0, np.array([0.9]))[0]
    # object disappears for 2 frames
    tr.update(np.zeros((0, 4)), np.zeros(0))
    tr.update(np.zeros((0, 4)), np.zeros(0))
    # reappears nearby -> same id
    id1 = tr.update(
        np.array([[14, 12, 44, 42]], np.float64), np.array([0.9])
    )[0]
    assert id1 == id0


def test_relabel_mask_consistency():
    tr = ByteTracker()
    m1 = np.zeros((60, 80), np.int32)
    m1[10:30, 10:30] = 7  # dataset label 7
    out1 = relabel_mask(tr, m1)
    tid = out1[15, 15]
    assert tid > 0
    # next frame: same object, dataset label changed to 9
    m2 = np.zeros((60, 80), np.int32)
    m2[12:32, 13:33] = 9
    out2 = relabel_mask(tr, m2)
    assert out2[20, 20] == tid


def test_mask_boxes():
    m = np.zeros((50, 50), np.int32)
    m[5:15, 20:40] = 2
    labels, boxes, counts = mask_boxes(m)
    assert labels.tolist() == [2]
    np.testing.assert_array_equal(boxes[0], [20, 5, 40, 15])
    assert counts[0] == 200
