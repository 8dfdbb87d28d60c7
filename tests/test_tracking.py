"""Frontend tracking tests: KLT on synthetic translation, detection,
homography RANSAC, slot allocation, full tracker steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.frontend import detect
from dynosam_tpu.frontend.tracker import TrackerState, assign_slots, track_frame
from dynosam_tpu.ops import homography, klt
from dynosam_tpu.utils.config import TrackerConfig


def checkerboard(h, w, rng, blobs=200):
    """Textured random-blob image, good for KLT."""
    img = np.zeros((h, w), np.float32)
    ys = rng.integers(5, h - 5, blobs)
    xs = rng.integers(5, w - 5, blobs)
    for y, x in zip(ys, xs):
        img[y - 2 : y + 3, x - 2 : x + 3] += rng.uniform(50, 200)
    # smooth a bit
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(img, 1.0)


def test_bilinear_sample():
    img = jnp.arange(12.0).reshape(3, 4)
    # exact grid points
    np.testing.assert_allclose(
        klt.bilinear_sample(img, jnp.array([[1.0, 1.0], [2.0, 2.0]])),
        [5.0, 10.0],
    )
    # midpoint
    np.testing.assert_allclose(
        klt.bilinear_sample(img, jnp.array([[0.5, 0.5]])), [2.5]
    )


def test_klt_tracks_translation(rng):
    h, w = 120, 160
    img = checkerboard(h, w, rng)
    dx, dy = 3.3, -2.1
    # shift by resampling
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    from scipy.ndimage import map_coordinates

    img2 = map_coordinates(img, [yy + dy, xx + dx], order=1, mode="nearest")
    pts = jnp.asarray(
        rng.uniform([20, 20], [w - 20, h - 20], size=(50, 2)), jnp.float32
    )
    res = klt.klt_track(
        jnp.asarray(img), jnp.asarray(img2.astype(np.float32)),
        pts, jnp.ones(50, bool), win=15, levels=3, iters=15,
    )
    ok = np.asarray(res.ok)
    disp = np.asarray(res.uv - pts)
    assert ok.sum() > 30
    # the image moved by (-dx, -dy) in content terms: content at (x,y) in
    # img appears at (x - dx, y - dy) in img2
    med = np.median(disp[ok], axis=0)
    np.testing.assert_allclose(med, [-dx, -dy], atol=0.3)


def test_klt_flow_warm_start(rng):
    """Level-0 polish from an approximate flow init matches cold 3-level
    pyramidal LK (the tracker's `klt_flow_warm_start` fast path)."""
    h, w = 120, 160
    img = checkerboard(h, w, rng)
    dx, dy = 5.7, -4.2
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    from scipy.ndimage import map_coordinates

    img2 = map_coordinates(img, [yy + dy, xx + dx], order=1, mode="nearest")
    n = 50
    pts = jnp.asarray(
        rng.uniform([25, 25], [w - 25, h - 25], size=(n, 2)), jnp.float32
    )
    # warm start = true flow + up-to-1px noise (dataset flow quality)
    g0 = jnp.asarray(
        np.array([-dx, -dy]) + rng.uniform(-1, 1, size=(n, 2)), jnp.float32
    )
    warm = klt.klt_track(
        jnp.asarray(img), jnp.asarray(img2.astype(np.float32)),
        pts, jnp.ones(n, bool), win=15, levels=1, iters=10, g0=g0,
    )
    cold = klt.klt_track(
        jnp.asarray(img), jnp.asarray(img2.astype(np.float32)),
        pts, jnp.ones(n, bool), win=15, levels=3, iters=15,
    )
    ok = np.asarray(warm.ok)
    assert ok.sum() >= np.asarray(cold.ok).sum() - 2
    med = np.median(np.asarray(warm.uv - pts)[ok], axis=0)
    np.testing.assert_allclose(med, [-dx, -dy], atol=0.3)
    both = ok & np.asarray(cold.ok)
    np.testing.assert_allclose(
        np.asarray(warm.uv)[both], np.asarray(cold.uv)[both], atol=0.2
    )


def test_detect_corners(rng):
    h, w = 96, 128
    img = np.zeros((h, w), np.float32)
    corners = [(20, 30), (50, 70), (80, 100)]
    for (y, x) in corners:
        img[y:, x:] += 100.0  # step corners
    resp = detect.shi_tomasi_response(jnp.asarray(img))
    dets = detect.detect_grid_nms(
        resp, jnp.zeros((h, w), bool), max_corners=30, cell_size=8,
        quality_level=1e-4,
    )
    uv = np.asarray(dets.uv)[np.asarray(dets.valid)]
    assert len(uv) >= 3
    for (y, x) in corners:
        d = np.linalg.norm(uv - [x, y], axis=1).min()
        assert d < 6.0, (x, y, uv)


def test_homography_ransac(rng):
    n = 100
    H_gt = np.array([[1.02, 0.01, 3.0], [-0.01, 0.99, -2.0], [1e-5, 0, 1.0]])
    p = rng.uniform(0, [320, 240], size=(n, 2))
    ph = np.concatenate([p, np.ones((n, 1))], axis=1)
    q = (ph @ H_gt.T)
    q = q[:, :2] / q[:, 2:]
    q += rng.normal(size=q.shape) * 0.3
    out_idx = rng.choice(n, 25, replace=False)
    q[out_idx] += rng.uniform(20, 80, size=(25, 2))
    res = homography.ransac_homography(
        jax.random.PRNGKey(0),
        jnp.asarray(p, jnp.float32),
        jnp.asarray(q, jnp.float32),
        jnp.ones(n, bool),
        iters=200,
        threshold=3.0,
    )
    inl = np.asarray(res.inliers)
    assert int(res.n_inliers) >= 65
    assert inl[out_idx].sum() <= 3


def test_assign_slots():
    free = jnp.asarray([False, True, False, True, True])
    want = jnp.asarray([True, False, True, True, False, False, True])
    slot_i, cand_i, ok = assign_slots(free, want)
    # 3 free slots, 4 wanted -> 3 pairs
    assert int(ok.sum()) == 3
    s = np.asarray(slot_i)[np.asarray(ok)]
    c = np.asarray(cand_i)[np.asarray(ok)]
    assert set(s.tolist()) == {1, 3, 4}
    assert c.tolist() == [0, 2, 3]


def make_scene(rng, h=96, w=128, shift=(2.0, 1.0), obj_shift=(5.0, 3.0)):
    base = checkerboard(h, w, rng)
    from scipy.ndimage import map_coordinates

    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img2 = map_coordinates(
        base, [yy + shift[1], xx + shift[0]], order=1, mode="nearest"
    ).astype(np.float32)
    # object box with its own motion
    mask1 = np.zeros((h, w), np.int32)
    mask1[30:60, 40:70] = 5
    mask2 = np.zeros((h, w), np.int32)
    oy, ox = int(30 - shift[1] + obj_shift[1]), int(40 - shift[0] + obj_shift[0])
    mask2[oy : oy + 30, ox : ox + 30] = 5
    # dense flow: background moves by -shift; object pixels by obj-bg
    flow = np.zeros((h, w, 2), np.float32)
    flow[..., 0] = -shift[0]
    flow[..., 1] = -shift[1]
    flow[mask1 == 5, 0] = -shift[0] + obj_shift[0]
    flow[mask1 == 5, 1] = -shift[1] + obj_shift[1]
    return base, img2, mask1, mask2, flow


def test_tracker_two_frames(rng):
    h, w = 96, 128
    base, img2, mask1, mask2, flow = make_scene(rng)
    cfg = TrackerConfig(
        max_features_per_frame=150,
        semantic_mask_step_size=4,
        klt_window=11,
        klt_levels=2,
        max_feature_track_age=25,
    )
    st = TrackerState.create(ns=200, nd=512, no=8)
    zero_flow = jnp.zeros((h, w, 2), jnp.float32)

    st, rep0 = track_frame(
        st, jnp.asarray(base), jnp.asarray(base), zero_flow,
        jnp.asarray(mask1), cfg, use_klt=True, first_frame=True,
    )
    assert int(rep0.n_static_new) > 30
    assert int(rep0.n_dynamic_new) > 20
    # object table picked up label 5
    labels = np.asarray(st.obj_labels)
    assert 5 in labels.tolist()

    st1, rep1 = track_frame(
        st, jnp.asarray(base), jnp.asarray(img2), jnp.asarray(flow),
        jnp.asarray(mask2), cfg, use_klt=True, first_frame=False,
    )
    assert int(rep1.n_static_tracked) > 20
    assert int(rep1.n_dynamic_tracked) > 10
    # tracked statics moved by ~-shift
    moved = np.asarray(st1.s_uv - st.s_uv)[
        np.asarray(st1.s_active & (st1.s_age > 0))
    ]
    med = np.median(moved, axis=0)
    np.testing.assert_allclose(med, [-2.0, -1.0], atol=0.5)
    # dynamic features stay on the object: all propagated dyn tracks carry
    # the object slot of label 5
    slot = labels.tolist().index(5)
    d_act = np.asarray(st1.d_active & (st1.d_age > 0))
    assert (np.asarray(st1.d_obj)[d_act] == slot).all()


def test_slot_cooldown_blocks_immediate_reuse(rng):
    """A slot freed when its track dies must not be reassigned within the
    cooldown window (prevents backend landmark aliasing)."""
    h, w = 96, 128
    base = checkerboard(h, w, rng)
    cfg = TrackerConfig(
        max_features_per_frame=60,
        klt_window=11,
        klt_levels=2,
        slot_cooldown_frames=5,
    )
    st = TrackerState.create(ns=100, nd=64, no=4)
    zero_flow = jnp.zeros((h, w, 2), jnp.float32)
    mask = jnp.zeros((h, w), jnp.int32)
    st, _ = track_frame(st, jnp.asarray(base), jnp.asarray(base), zero_flow,
                        mask, cfg, use_klt=True, first_frame=True)
    active0 = np.asarray(st.s_active).copy()
    # kill all tracks with a garbage frame (KLT fails), forcing deaths
    noise = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    st1, _ = track_frame(st, jnp.asarray(base), noise, zero_flow, mask, cfg,
                         use_klt=True, first_frame=False)
    died = active0 & ~np.asarray(st1.s_active & (st1.s_age > 0))
    # any re-detections this frame must NOT occupy just-died slots
    fresh = np.asarray(st1.s_active & (st1.s_age == 0))
    assert not (fresh & died).any()
    # cooldown counters set on the dead slots that were not re-used
    cd = np.asarray(st1.s_cooldown)
    assert (cd[died & ~fresh] > 0).all()


def test_clahe_matches_opencv(rng):
    """ops/clahe.py vs cv2.createCLAHE(2.0, (8, 8)) — same algorithm up to
    OpenCV's integer LUT rounding and border padding mode
    (`FeatureDetector.cc:95-109`)."""
    cv2 = pytest.importorskip("cv2")
    from dynosam_tpu.ops.clahe import clahe

    h, w = 240, 320
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = (
        80 + 60 * np.sin(xx / 40) + 40 * np.cos(yy / 30)
        + rng.normal(0, 10, (h, w))
    ).clip(0, 255).astype(np.uint8)
    ref = cv2.createCLAHE(2.0, (8, 8)).apply(img)
    got = np.asarray(clahe(jnp.asarray(img, jnp.float32)))
    d = np.abs(ref.astype(np.float32) - got)
    assert d.mean() < 4.0
    assert np.corrcoef(ref.ravel().astype(float), got.ravel())[0, 1] > 0.99


def test_inv_spd_blocks_all_sizes(rng):
    from dynosam_tpu.ops.linalg import inv_spd

    for n in (1, 2, 3, 4, 6, 8, 9, 12):
        M = rng.normal(size=(5, n, n)).astype(np.float32)
        spd = jnp.asarray(
            M @ np.swapaxes(M, -1, -2) + (2.0 + n) * np.eye(n, dtype=np.float32)
        )
        prod = np.asarray(
            jnp.einsum("kij,kjk2->kik2", spd, inv_spd(spd))
            if False else jnp.einsum("bij,bjl->bil", spd, inv_spd(spd))
        )
        np.testing.assert_allclose(
            prod, np.broadcast_to(np.eye(n), prod.shape), atol=5e-3
        )


def test_homography_solve_matches_eigh(rng):
    """Gauge-fixed 8x8 solve == eigh nullspace on minimal 4-point DLT
    systems (`homography_from_points(method='solve')`)."""
    from dynosam_tpu.ops.homography import homography_from_points, transfer_error

    K = 64
    # realistic tracking-scale warps: affine part ~O(0.05), projective
    # terms ~O(1e-5) (pixel coordinates; cf. test_homography_ransac)
    Hgt = np.eye(3, dtype=np.float32) + rng.normal(0, 0.05, (K, 3, 3)).astype(np.float32)
    Hgt[:, 2, :2] = rng.normal(0, 1e-5, (K, 2)).astype(np.float32)
    Hgt[:, :2, 2] = rng.normal(0, 5.0, (K, 2)).astype(np.float32)
    Hgt[:, 2, 2] = 1.0
    p = rng.uniform(50, 500, (K, 4, 2)).astype(np.float32)
    ph = np.concatenate([p, np.ones((K, 4, 1), np.float32)], axis=-1)
    qh = np.einsum("kij,knj->kni", Hgt, ph)
    q = qh[..., :2] / qh[..., 2:3]
    He = homography_from_points(jnp.asarray(p), jnp.asarray(q))
    Hs = homography_from_points(jnp.asarray(p), jnp.asarray(q), method="solve")
    # compare by transfer error on fresh points (H scale-normalized already)
    t = rng.uniform(50, 500, (K, 16, 2)).astype(np.float32)
    th = np.concatenate([t, np.ones((K, 16, 1), np.float32)], axis=-1)
    sh = np.einsum("kij,knj->kni", Hgt, th)
    s = sh[..., :2] / sh[..., 2:3]
    ee = np.asarray(transfer_error(He, jnp.asarray(t), jnp.asarray(s)))
    es = np.asarray(transfer_error(Hs, jnp.asarray(t), jnp.asarray(s)))
    # minimal-set fits extrapolated across a 500 px field amplify f32
    # noise for BOTH estimators; compare bulk statistics, not tails (the
    # solve path's rare near-degenerate blowups are exactly the
    # hypotheses the RANSAC transfer-error vote discards)
    me, ms = np.median(ee, axis=1), np.median(es, axis=1)
    assert np.median(ms) <= np.median(me) * 2.0 + 0.05
    assert np.percentile(ms, 75) <= np.percentile(me, 75) * 2.0 + 0.5


def test_redetect_on_demand_skips_when_healthy(rng):
    """With `redetect_min_free_fraction`, a healthy pool skips the whole
    detection stage (lax.cond) and no new statics appear; the default 0.0
    keeps the reference's always-top-up behaviour."""
    h, w = 96, 128
    base, img2, mask1, mask2, flow = make_scene(rng)
    cfg = TrackerConfig(
        max_features_per_frame=60,
        semantic_mask_step_size=4,
        klt_window=11,
        klt_levels=2,
        redetect_min_free_fraction=0.5,
    )
    st = TrackerState.create(ns=200, nd=512, no=8)
    zero_flow = jnp.zeros((h, w, 2), jnp.float32)
    st, rep0 = track_frame(
        st, jnp.asarray(base), jnp.asarray(base), zero_flow,
        jnp.asarray(mask1), cfg, use_klt=True, first_frame=True,
    )
    assert int(rep0.n_static_new) > 30   # first frame always detects
    st1, rep1 = track_frame(
        st, jnp.asarray(base), jnp.asarray(img2), jnp.asarray(flow),
        jnp.asarray(mask2), cfg, use_klt=True, first_frame=False,
    )
    # healthy tracking (>50% of 60 target) -> detection skipped entirely
    assert int(rep1.n_static_tracked) > 30
    assert int(rep1.n_static_new) == 0


def test_tracker_flow_only_mode(rng):
    """use_klt=False (reference --use_flow_tracking): static features
    propagate by the DENSE FLOW alone — the merged flow/label sample path
    (tracker.py fl_s/fl_d) must move statics by the flow and keep dynamics
    on their object."""
    h, w = 96, 128
    base, img2, mask1, mask2, flow = make_scene(rng)
    cfg = TrackerConfig(
        max_features_per_frame=150,
        semantic_mask_step_size=4,
        max_feature_track_age=25,
    )
    st = TrackerState.create(ns=200, nd=512, no=8)
    zero_flow = jnp.zeros((h, w, 2), jnp.float32)
    st, _ = track_frame(
        st, jnp.asarray(base), jnp.asarray(base), zero_flow,
        jnp.asarray(mask1), cfg, use_klt=False, first_frame=True,
    )
    st1, rep1 = track_frame(
        st, jnp.asarray(base), jnp.asarray(img2), jnp.asarray(flow),
        jnp.asarray(mask2), cfg, use_klt=False, first_frame=False,
    )
    assert int(rep1.n_static_tracked) > 20
    assert int(rep1.n_dynamic_tracked) > 10
    moved = np.asarray(st1.s_uv - st.s_uv)[
        np.asarray(st1.s_active & (st1.s_age > 0))
    ]
    med = np.median(moved, axis=0)
    np.testing.assert_allclose(med, [-2.0, -1.0], atol=0.5)


def test_grid_subsample_matches_strided_slice(rng):
    """The MXU selection-matmul subsamples must equal the plain strided
    slices they replace (tracker.py candidate grid; round-5 trace showed
    the slices lowering to serialized lane-shuffle gathers on TPU)."""
    from dynosam_tpu.frontend.detect import (
        grid_subsample_i32, occupancy_at_grid, occupancy_mask,
    )

    h, w, step = 96, 256, 4
    img = jnp.asarray(rng.integers(0, 300, size=(h, w)), jnp.int32)
    got = grid_subsample_i32(img, step, step // 2)
    want = img[step // 2 :: step, step // 2 :: step]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    uv = jnp.asarray(rng.uniform(0, [w - 1, h - 1], size=(200, 2)), jnp.float32)
    valid = jnp.asarray(rng.random(200) > 0.3)
    occ = occupancy_mask((h, w), uv, valid, step // 2)
    want_occ = occ[step // 2 :: step, step // 2 :: step]
    got_occ = occupancy_at_grid((h, w), uv, valid, step // 2, step, step // 2)
    np.testing.assert_array_equal(np.asarray(got_occ), np.asarray(want_occ))
