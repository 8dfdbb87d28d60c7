"""ORB extractor + descriptor matcher (`frontend/orb.py`) — the analog of
the reference's `ORBextractor` (`frontend/vision/ORBextractor.hpp:58`) and
its detector/tracker wiring (`FeatureDetector.cc:55-83`,
`StaticFeatureTracker.cc:58-83`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.frontend.orb import (
    OrbFeatures,
    extract_orb,
    features_per_level,
    match_descriptors,
    orb_detections,
)


def _textured_image(rng, h=240, w=320):
    """Smooth random texture with strong corners (blurred blob field)."""
    from scipy.ndimage import gaussian_filter

    img = rng.normal(size=(h, w))
    img = gaussian_filter(img, 3.0)
    img = (img - img.min()) / np.ptp(img) * 255.0
    # add hard axis-aligned squares for unambiguous corners
    for _ in range(12):
        y = int(rng.uniform(30, h - 60))
        x = int(rng.uniform(30, w - 60))
        s = int(rng.uniform(10, 25))
        img[y:y + s, x:x + s] = 255.0 if rng.uniform() > 0.5 else 0.0
    return img.astype(np.float32)


def _rotate_image(img, deg):
    """scipy rotation about the image center, plus the 2x3 fwd transform."""
    from scipy.ndimage import affine_transform

    h, w = img.shape
    th = np.deg2rad(deg)
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    c = np.array([w / 2.0, h / 2.0])
    # affine_transform maps output->input with matrix in (row, col) order
    Rrc = R[::-1, ::-1].T
    off = np.array([h / 2.0, w / 2.0]) - Rrc @ np.array([h / 2.0, w / 2.0])
    out = affine_transform(img, Rrc, offset=off, order=1, mode="nearest")

    def fwd(uv):  # map original pixel (x, y) -> rotated-image pixel
        return (uv - c) @ R.T + c

    return out.astype(np.float32), fwd


def test_features_per_level_quota():
    q = features_per_level(1000, 8, 1.2)
    assert len(q) == 8 and sum(q) == 1000
    assert q[0] > q[1] > q[2]          # geometric decay
    assert all(v >= 0 for v in q)


def test_extract_static_shapes_and_corners(rng):
    img = _textured_image(rng)
    feats = extract_orb(jnp.asarray(img), n_features=500, n_levels=4)
    assert feats.uv.shape == (500, 2)
    assert feats.desc.shape == (500, 256)
    assert feats.desc.dtype == jnp.int8
    v = np.asarray(feats.valid)
    assert v.sum() > 100
    uv = np.asarray(feats.uv)[v]
    h, w = img.shape
    assert (uv[:, 0] >= 0).all() and (uv[:, 0] < w).all()
    assert (uv[:, 1] >= 0).all() and (uv[:, 1] < h).all()
    # multiple pyramid levels contribute
    assert len(np.unique(np.asarray(feats.level)[v])) >= 2
    # descriptors are ±1
    d = np.asarray(feats.desc)[v]
    assert set(np.unique(d)) <= {-1, 1}


def test_orientation_follows_rotation(rng):
    """Rotating the image rotates the intensity-centroid angles."""
    img = _textured_image(rng)
    rot, fwd = _rotate_image(img, 30.0)
    fa = extract_orb(jnp.asarray(img), n_features=300, n_levels=1)
    fb = extract_orb(jnp.asarray(rot), n_features=300, n_levels=1)
    m = match_descriptors(fa.desc, fa.valid, fb.desc, fb.valid)
    ok = np.asarray(m.ok)
    assert ok.sum() >= 20
    da = np.asarray(fb.angle)[np.asarray(m.index)[ok]] - np.asarray(fa.angle)[ok]
    da = (da + np.pi) % (2 * np.pi) - np.pi
    med = np.median(np.abs(da - np.deg2rad(30.0)))
    # median matched-pair angle shift tracks the in-plane rotation
    assert med < np.deg2rad(15.0)


def test_descriptor_matching_under_rotation(rng):
    """Steered-BRIEF matches survive a 25 degree in-plane rotation and land
    where the known transform says (ORB's rotation-invariance claim)."""
    img = _textured_image(rng)
    rot, fwd = _rotate_image(img, 25.0)
    fa = extract_orb(jnp.asarray(img), n_features=400, n_levels=2)
    fb = extract_orb(jnp.asarray(rot), n_features=400, n_levels=2)
    m = match_descriptors(fa.desc, fa.valid, fb.desc, fb.valid,
                          max_hamming=80.0)
    ok = np.asarray(m.ok)
    assert ok.sum() >= 25
    uva = np.asarray(fa.uv)[ok]
    uvb = np.asarray(fb.uv)[np.asarray(m.index)[ok]]
    pred = fwd(uva)
    err = np.linalg.norm(pred - uvb, axis=1)
    inlier = (err < 3.0).mean()
    assert inlier > 0.6, f"only {inlier:.0%} of matches map through the rotation"


def test_match_descriptors_equals_bruteforce(rng):
    da = np.where(rng.uniform(size=(40, 256)) > 0.5, 1, -1).astype(np.int8)
    db = np.where(rng.uniform(size=(50, 256)) > 0.5, 1, -1).astype(np.int8)
    # plant exact matches so gates pass deterministically
    db[:10] = da[:10]
    va = np.ones(40, bool)
    vb = np.ones(50, bool)
    va[-3:] = False
    vb[-4:] = False
    m = match_descriptors(jnp.asarray(da), jnp.asarray(va),
                          jnp.asarray(db), jnp.asarray(vb),
                          max_hamming=256.0, ratio=1.0, cross_check=False)
    ham = ((da.astype(np.int32)[:, None, :] !=
            db.astype(np.int32)[None, :, :]).sum(-1)).astype(np.float64)
    ham[:, ~vb] = 1e9
    np.testing.assert_array_equal(
        np.asarray(m.index)[va], ham.argmin(1)[va]
    )
    np.testing.assert_allclose(
        np.asarray(m.distance)[va], ham.min(1)[va]
    )
    assert not np.asarray(m.ok)[~va].any()
    # planted identical descriptors match at distance 0
    assert (np.asarray(m.distance)[:10] == 0).all()
    assert (np.asarray(m.index)[:10] == np.arange(10)).all()


def test_orb_detections_sorted():
    feats = OrbFeatures(
        uv=jnp.asarray([[1.0, 1], [2, 2], [3, 3]]),
        response=jnp.asarray([5.0, 20.0, 10.0]),
        angle=jnp.zeros(3),
        level=jnp.zeros(3, jnp.int32),
        scale=jnp.ones(3),
        desc=jnp.zeros((3, 256), jnp.int8),
        valid=jnp.asarray([True, True, False]),
    )
    d = orb_detections(feats)
    # valid rows first by response; the invalid row (10.0) sorts last
    assert np.asarray(d.score).tolist() == [20.0, 5.0, 10.0]
    assert not np.asarray(d.valid)[-1]


def test_tracker_orb_mode(rng):
    """`feature_detector_type="orb"` populates static slots and keeps
    tracking across frames (the ORB_SLAM_ORB detector mode end-to-end)."""
    import jax

    from dynosam_tpu.frontend.tracker import TrackerState, track_frame
    from dynosam_tpu.testing.render import RenderConfig, RenderedScene
    from dynosam_tpu.utils.config import TrackerConfig

    scene = RenderedScene(RenderConfig(n_frames=3, h=192, w=256))
    frames = scene.frames()
    cfg = TrackerConfig(
        max_features_per_frame=200,
        max_nr_keypoints_before_anms=400,
        feature_detector_type="orb",
        orb_n_levels=3,
        klt_window=13,
        klt_levels=2,
    )
    st = TrackerState.create(256, 256, 4)
    key = jax.random.PRNGKey(0)
    st, out0 = track_frame(
        st, frames[0].gray, frames[0].gray, frames[0].flow, frames[0].mask,
        cfg, key=key, first_frame=True,
    )
    n0 = int(np.asarray(out0.n_static_new))
    assert n0 > 50
    st, out1 = track_frame(
        st, frames[0].gray, frames[1].gray, frames[0].flow, frames[1].mask,
        cfg, key=key, first_frame=False,
    )
    n_tracked = int(np.asarray(out1.n_static_tracked))
    assert n_tracked > 0.5 * n0


def test_orb_reassociation_revives_slots(rng):
    """Descriptor re-association: killed tracklets are revived with the
    SAME slot id when their corner re-appears (the functional extension of
    the reference's unused descriptor path,
    `StaticFeatureTracker.cc:81-83`)."""
    import jax

    from dynosam_tpu.frontend.tracker import TrackerState, track_frame
    from dynosam_tpu.testing.render import RenderConfig, RenderedScene
    from dynosam_tpu.utils.config import TrackerConfig

    scene = RenderedScene(RenderConfig(n_frames=3, h=192, w=256))
    frames = scene.frames()
    cfg = TrackerConfig(
        max_features_per_frame=200,
        max_nr_keypoints_before_anms=400,
        feature_detector_type="orb",
        orb_n_levels=3,
        orb_reassociate=True,
        orb_reassoc_max_hamming=80.0,
        orb_reassoc_radius_px=60.0,
        klt_window=13,
        klt_levels=2,
    )
    st = TrackerState.create(256, 256, 4)
    key = jax.random.PRNGKey(0)
    st, out0 = track_frame(
        st, frames[0].gray, frames[0].gray, frames[0].flow, frames[0].mask,
        cfg, key=key, first_frame=True,
    )
    active = np.asarray(st.s_active)
    kill = np.where(active)[0][:40]
    assert len(kill) == 40
    s_active = active.copy()
    s_active[kill] = False
    s_cd = np.asarray(st.s_cooldown).copy()
    s_cd[kill] = 5
    st2 = st._replace(
        s_active=jnp.asarray(s_active), s_cooldown=jnp.asarray(s_cd)
    )
    st3, out1 = track_frame(
        st2, frames[0].gray, frames[1].gray, frames[0].flow, frames[1].mask,
        cfg, key=key, first_frame=False,
    )
    n_re = int(np.asarray(out1.n_reassociated))
    assert n_re >= 5, f"only {n_re} tracklets revived"
    # the revived ids are among the killed ones
    assert np.asarray(st3.s_active)[kill].sum() >= 5


def test_canvas_packed_kernel_matches_xla(rng, monkeypatch):
    """The TPU path packs every pyramid level into ONE canvas and runs a
    single Pallas sampling call; forced on CPU (interpret mode) it must
    reproduce the per-level XLA orientations/descriptors for all valid
    keypoints (canvas offsets + band isolation are exact)."""
    img = jnp.asarray(_textured_image(rng, h=170, w=250))  # unaligned dims

    ref = extract_orb(img, n_features=400, n_levels=4)
    monkeypatch.setenv("DYNO_ORB_FORCE_PALLAS", "1")
    extract_orb.clear_cache()
    got = extract_orb(img, n_features=400, n_levels=4)
    extract_orb.clear_cache()

    v = np.asarray(ref.valid) & np.asarray(got.valid)
    assert v.sum() >= 100
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    np.testing.assert_allclose(
        np.asarray(ref.uv)[v], np.asarray(got.uv)[v], atol=1e-5
    )
    da = np.abs(np.asarray(ref.angle)[v] - np.asarray(got.angle)[v])
    da = np.minimum(da, 2 * np.pi - da)
    assert da.max() < 1e-3
    agree = (np.asarray(ref.desc)[v] == np.asarray(got.desc)[v]).mean()
    assert agree > 0.995
