"""Vectorized RANSAC solver tests: Procrustes exactness, outlier rejection,
3d2d PnP accuracy, degenerate handling."""

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.core import camera as cam
from dynosam_tpu.core import lie
from dynosam_tpu.ops import ransac


def make_cam():
    return cam.CameraParams.create(320.0, 320.0, 320.0, 240.0, 640, 480)


def random_pose(rng, scale=0.5):
    return lie.se3_exp(jnp.asarray(rng.normal(size=6) * scale, jnp.float32))


def test_procrustes_exact(rng):
    T = random_pose(rng)
    src = jnp.asarray(rng.uniform(-5, 5, size=(30, 3)), jnp.float32)
    dst = lie.se3_apply(T, src)
    w = jnp.ones(30, jnp.float32)
    est = ransac.procrustes(src, dst, w)
    np.testing.assert_allclose(est.R, T.R, atol=1e-5)
    np.testing.assert_allclose(est.t, T.t, atol=1e-4)


def test_procrustes_batched(rng):
    T = lie.se3_exp(jnp.asarray(rng.normal(size=(7, 6)) * 0.4, jnp.float32))
    src = jnp.asarray(rng.uniform(-5, 5, size=(7, 20, 3)), jnp.float32)
    dst = jax.vmap(lie.se3_apply)(T, src)
    est = ransac.procrustes(src, dst, jnp.ones((7, 20), jnp.float32))
    np.testing.assert_allclose(est.t, T.t, atol=1e-4)


def test_ransac_3d3d_with_outliers(rng):
    T = random_pose(rng)
    n = 200
    src = jnp.asarray(rng.uniform(-10, 10, size=(n, 3)), jnp.float32)
    dst = lie.se3_apply(T, src) + jnp.asarray(
        rng.normal(size=(n, 3)) * 0.005, jnp.float32
    )
    # corrupt 30% with gross outliers
    n_out = 60
    out_idx = rng.choice(n, n_out, replace=False)
    dst = dst.at[out_idx].add(
        jnp.asarray(rng.uniform(1, 5, size=(n_out, 3)), jnp.float32)
    )
    valid = jnp.ones(n, bool)
    res = ransac.ransac_rigid(
        jax.random.PRNGKey(0), src, dst, valid, iters=300, threshold=0.05
    )
    assert int(res.status) == ransac.STATUS_VALID
    assert int(res.n_inliers) >= n - n_out - 5
    np.testing.assert_allclose(res.pose.t, T.t, atol=0.01)
    # outliers flagged
    inl = np.asarray(res.inliers)
    assert inl[out_idx].sum() <= 3


def test_ransac_pnp_3d2d(rng):
    params = make_cam()
    X = random_pose(rng, 0.3)  # camera pose ^wX_c
    n = 150
    uv_gt = jnp.asarray(rng.uniform(50, [590, 430], size=(n, 2)), jnp.float32)
    depth = jnp.asarray(rng.uniform(3, 25, size=(n,)), jnp.float32)
    p_world = cam.backproject_to_world(params, uv_gt, depth, X)
    uv_obs = uv_gt + jnp.asarray(rng.normal(size=(n, 2)) * 0.3, jnp.float32)
    xyz_cur = cam.backproject(params, uv_gt, depth) + jnp.asarray(
        rng.normal(size=(n, 3)) * 0.02, jnp.float32
    )
    # 25% outliers in both uv + xyz
    n_out = 38
    out_idx = rng.choice(n, n_out, replace=False)
    uv_obs = uv_obs.at[out_idx].add(
        jnp.asarray(rng.uniform(30, 120, size=(n_out, 2)), jnp.float32)
    )
    res = ransac.ransac_pose_3d2d(
        jax.random.PRNGKey(1), p_world, uv_obs, xyz_cur,
        jnp.ones(n, bool), params, iters=300, threshold_px=2.0,
    )
    assert int(res.status) == ransac.STATUS_VALID
    err = np.asarray(lie.se3_local(X, res.pose))
    assert np.linalg.norm(err[3:]) < 0.02, err
    assert np.linalg.norm(err[:3]) < 0.005, err
    assert np.asarray(res.inliers)[out_idx].sum() <= 2


def test_ransac_few_matches(rng):
    src = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    dst = src + 1.0
    valid = jnp.zeros(10, bool).at[:3].set(True)
    res = ransac.ransac_rigid(
        jax.random.PRNGKey(0), src, dst, valid, iters=50, threshold=0.1
    )
    assert int(res.status) == ransac.STATUS_FEW_MATCHES
    # identity fallback
    np.testing.assert_allclose(res.pose.t, 0.0, atol=1e-6)


def test_ransac_vmap_over_objects(rng):
    """Per-object motion solving as a single vmapped call."""
    n_obj, n = 4, 80
    Ts = lie.se3_exp(jnp.asarray(rng.normal(size=(n_obj, 6)) * 0.4, jnp.float32))
    src = jnp.asarray(rng.uniform(-5, 5, size=(n_obj, n, 3)), jnp.float32)
    dst = jax.vmap(lie.se3_apply)(Ts, src)
    valid = jnp.ones((n_obj, n), bool)
    keys = jax.random.split(jax.random.PRNGKey(2), n_obj)
    res = jax.vmap(
        lambda k, s, d, v: ransac.ransac_rigid(k, s, d, v, iters=100, threshold=0.05)
    )(keys, src, dst, valid)
    assert np.all(np.asarray(res.status) == ransac.STATUS_VALID)
    np.testing.assert_allclose(res.pose.t, Ts.t, atol=0.01)


def test_rigid_from_minimal_exact(rng):
    """Triad minimal-set solver recovers the exact rigid transform of
    noise-free 3-point sets (`ops/ransac.rigid_from_minimal`) and matches
    SVD-Kabsch on noisy sets to first order."""
    from dynosam_tpu.core.lie import se3_exp
    from dynosam_tpu.ops.ransac import procrustes, rigid_from_minimal

    K = 200
    src = jnp.asarray(rng.uniform(-2, 2, (K, 3, 3)), jnp.float32)
    T = se3_exp(jnp.asarray(rng.normal(size=(K, 6)) * 0.5, jnp.float32))
    dst = jnp.einsum("kij,knj->kni", T.R, src) + T.t[:, None, :]
    got, ok = rigid_from_minimal(src, dst)
    okn = np.asarray(ok)
    assert okn.mean() > 0.95
    dR = np.linalg.norm(np.asarray(got.R) - np.asarray(T.R), axis=(1, 2))
    dt = np.linalg.norm(np.asarray(got.t) - np.asarray(T.t), axis=1)
    assert dR[okn].max() < 1e-4
    assert dt[okn].max() < 1e-4
    # rotations are orthonormal with det +1
    RtR = np.einsum("kji,kjl->kil", np.asarray(got.R), np.asarray(got.R))
    np.testing.assert_allclose(
        RtR[okn], np.broadcast_to(np.eye(3), RtR[okn].shape), atol=1e-5
    )
    det = np.linalg.det(np.asarray(got.R)[okn])
    np.testing.assert_allclose(det, 1.0, atol=1e-5)
    # noisy: close to the least-squares (SVD) estimate
    dstn = dst + jnp.asarray(rng.normal(size=(K, 3, 3)) * 0.01, jnp.float32)
    got_n, ok_n = rigid_from_minimal(src, dstn)
    ref_n = procrustes(src, dstn, jnp.ones((K, 3), jnp.float32))
    dR = np.linalg.norm(
        np.asarray(got_n.R) - np.asarray(ref_n.R), axis=(1, 2)
    )[np.asarray(ok_n)]
    assert np.median(dR) < 0.05


def test_rigid_from_minimal_flags_collinear(rng):
    """(Near-)collinear minimal sets must be flagged degenerate."""
    from dynosam_tpu.ops.ransac import rigid_from_minimal

    p0 = jnp.asarray(rng.uniform(-1, 1, (8, 1, 3)), jnp.float32)
    d = jnp.asarray(rng.uniform(-1, 1, (8, 1, 3)), jnp.float32)
    src = jnp.concatenate([p0, p0 + d, p0 + 2 * d], axis=1)   # collinear
    _, ok = rigid_from_minimal(src, src)
    assert not np.asarray(ok).any()


def test_score_cap_exact_when_valid_fits(rng):
    """`score_cap` compaction is BIT-EXACT when n_valid <= cap: stable
    argsort keeps valid slots in slot order, so the inverse-CDF sampler's
    rank -> slot mapping picks the same physical points, and the inlier
    mask scatters back to identical pool coordinates."""
    c = make_cam()
    T = random_pose(rng)
    N = 256
    pts = jnp.asarray(rng.uniform(-4, 4, size=(N, 3)), jnp.float32)
    pts = pts.at[:, 2].set(jnp.abs(pts[:, 2]) + 3.0)
    p_world = lie.se3_apply(T, pts)
    uv, _ = cam.project_local(c, pts)
    valid = jnp.asarray(rng.random(N) < 0.4)
    valid = valid & (uv[:, 0] > 0) & (uv[:, 0] < 639) & (uv[:, 1] > 0) & (uv[:, 1] < 479)
    assert 20 < int(valid.sum()) < 128
    key = jax.random.PRNGKey(11)
    full = ransac.ransac_pose_3d2d(
        key, p_world, uv, pts, valid, c, iters=100,
    )
    capped = ransac.ransac_pose_3d2d(
        key, p_world, uv, pts, valid, c, iters=100, score_cap=128,
    )
    np.testing.assert_array_equal(np.asarray(full.pose.R), np.asarray(capped.pose.R))
    np.testing.assert_array_equal(np.asarray(full.pose.t), np.asarray(capped.pose.t))
    np.testing.assert_array_equal(np.asarray(full.inliers), np.asarray(capped.inliers))
    assert int(full.n_inliers) == int(capped.n_inliers)
