"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl


def test_shi_tomasi_pallas_matches_xla(rng):
    from dynosam_tpu.frontend.detect import shi_tomasi_response_fast
    from dynosam_tpu.ops.pallas import response as pr

    g = jnp.asarray(rng.uniform(0, 255, (64, 128)), jnp.float32)

    # interpret mode (CPU-safe)
    out = pl.pallas_call(
        pr._response_kernel,
        out_shape=jax.ShapeDtypeStruct(g.shape, g.dtype),
        interpret=True,
    )(g)
    ref = shi_tomasi_response_fast(g)
    a = np.asarray(out[4:-4, 4:-4])
    b = np.asarray(ref[4:-4, 4:-4])
    scale = np.abs(b).mean()
    assert np.abs(a - b).max() / scale < 0.02


def test_auto_dispatch_shapes(rng):
    from dynosam_tpu.ops.pallas.response import _VMEM_BUDGET_PX

    # KITTI-sized frames take the pallas path; huge frames fall back
    assert 384 * 1280 <= _VMEM_BUDGET_PX
    assert 2000 * 4000 > _VMEM_BUDGET_PX


def test_lk_kernel_matches_xla(rng):
    """Pallas LK level kernel (interpret mode) == ops.klt.klt_track to
    float tolerance, including near-border features where per-sample
    clamping matters (`ops/pallas/lk.py`)."""
    from dynosam_tpu.ops.klt import klt_track
    from dynosam_tpu.ops.pallas.lk import klt_track_pallas
    from dynosam_tpu.testing.render import RenderConfig, RenderedScene

    scene = RenderedScene(RenderConfig(n_frames=2, h=192, w=256))
    f0, f1 = scene.frames()
    uv = jnp.asarray(rng.uniform([5, 5], [250, 186], (64, 2)), jnp.float32)
    valid = jnp.ones((64,), bool)
    ref = klt_track(f0.gray, f1.gray, uv, valid, win=21, levels=3, iters=30)
    got = klt_track_pallas(
        f0.gray, f1.gray, uv, valid, win=21, levels=3, iters=30,
        interpret=True,
    )
    d = np.linalg.norm(np.asarray(ref.uv) - np.asarray(got.uv), axis=1)
    both = np.asarray(ref.ok) & np.asarray(got.ok)
    assert both.sum() >= 40
    assert d[both].max() < 0.05
    # ok masks agree except possibly at the error-gate boundary
    agree = (np.asarray(ref.ok) == np.asarray(got.ok)).mean()
    assert agree > 0.9


def test_lk_kernel_warm_start_matches_xla(rng):
    """g0 warm-start path: Pallas (interpret) == XLA klt_track with the
    same init, single level (the tracker's `klt_flow_warm_start` config)."""
    from dynosam_tpu.ops.klt import flow_at, klt_track
    from dynosam_tpu.ops.pallas.lk import klt_track_pallas
    from dynosam_tpu.testing.render import RenderConfig, RenderedScene

    scene = RenderedScene(RenderConfig(n_frames=2, h=192, w=256))
    f0, f1 = scene.frames()
    uv = jnp.asarray(rng.uniform([15, 15], [240, 176], (32, 2)), jnp.float32)
    valid = jnp.ones((32,), bool)
    g0 = flow_at(f0.flow, uv)
    ref = klt_track(
        f0.gray, f1.gray, uv, valid, win=21, levels=1, iters=10, g0=g0
    )
    got = klt_track_pallas(
        f0.gray, f1.gray, uv, valid, win=21, levels=1, iters=10, g0=g0,
        interpret=True,
    )
    d = np.linalg.norm(np.asarray(ref.uv) - np.asarray(got.uv), axis=1)
    both = np.asarray(ref.ok) & np.asarray(got.ok)
    assert both.sum() >= 20
    assert d[both].max() < 0.05


def test_orb_sample_kernel_matches_xla(rng):
    """Pallas ORB orientation/descriptor kernel (interpret mode) ==
    frontend.orb._orientations/_descriptors (`ops/pallas/orb_sample.py`)."""
    from dynosam_tpu.frontend.orb import (
        _descriptors,
        _gaussian_blur7,
        _orientations,
    )
    from dynosam_tpu.ops.pallas.orb_sample import orb_orientation_descriptors
    from dynosam_tpu.testing.render import RenderConfig, RenderedScene

    scene = RenderedScene(RenderConfig(n_frames=1, h=192, w=256))
    img = scene.frames()[0].gray
    blurred = _gaussian_blur7(img)
    uv = jnp.asarray(rng.uniform([20, 20], [236, 172], (32, 2)), jnp.float32)
    ang_ref = _orientations(img, uv)
    desc_ref = _descriptors(blurred, uv, ang_ref)
    ang, desc = orb_orientation_descriptors(img, blurred, uv, interpret=True)
    da = np.abs(np.asarray(ang) - np.asarray(ang_ref))
    da = np.minimum(da, 2 * np.pi - da)
    assert da.max() < 1e-3
    # identical bits except where a tap pair is a near-tie under float
    agree = (np.asarray(desc) == np.asarray(desc_ref)).mean()
    assert agree > 0.995


def test_orb_sample_kernel_unaligned_dims(rng):
    """Tile-UNALIGNED level dims (mid-pyramid shapes like 267x889) must be
    padded internally to keep 48x256 windows — results identical to the
    unpadded XLA reference, including keypoints near the image border."""
    from dynosam_tpu.frontend.orb import (
        _descriptors,
        _gaussian_blur7,
        _orientations,
    )
    from dynosam_tpu.ops.pallas.orb_sample import orb_orientation_descriptors

    h, w = 157, 331          # h%8=5, w%128=75 — both unaligned
    img = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    blurred = _gaussian_blur7(img)
    uv = jnp.concatenate([
        jnp.asarray(rng.uniform([19, 19], [w - 20, h - 20], (24, 2)),
                    jnp.float32),
        # corners at the edge-threshold keep-away distance
        jnp.asarray([[19.0, 19.0], [w - 20.0, 19.0],
                     [19.0, h - 20.0], [w - 20.0, h - 20.0]], jnp.float32),
    ])
    ang_ref = _orientations(img, uv)
    desc_ref = _descriptors(blurred, uv, ang_ref)
    ang, desc = orb_orientation_descriptors(img, blurred, uv, interpret=True)
    da = np.abs(np.asarray(ang) - np.asarray(ang_ref))
    da = np.minimum(da, 2 * np.pi - da)
    assert da.max() < 1e-3
    agree = (np.asarray(desc) == np.asarray(desc_ref)).mean()
    assert agree > 0.995


def test_point_sample_kernel_matches_xla(rng):
    """Pallas point sampler (interpret) == bilinear_sample / nearest_at /
    flow_at XLA semantics, incl. border-clamped coords
    (`ops/pallas/point_sample.py`)."""
    from dynosam_tpu.ops.klt import bilinear_sample, nearest_at
    from dynosam_tpu.ops.pallas.point_sample import point_sample

    h, w = 96, 160
    img = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 9, (h, w)), jnp.int32)
    flow = jnp.asarray(rng.normal(0, 3, (h, w, 2)), jnp.float32)
    # interior + border + out-of-range coords (clamped by both paths)
    uv = jnp.concatenate([
        jnp.asarray(rng.uniform([0, 0], [w - 1, h - 1], (40, 2)), jnp.float32),
        jnp.asarray([[0.0, 0.0], [w - 1.0, h - 1.0], [-3.0, 5.0],
                     [w + 4.0, h + 2.0], [2.25, h - 1.0]], jnp.float32),
    ])
    got = point_sample(
        jnp.stack([img, mask.astype(jnp.float32), flow[..., 0], flow[..., 1]]),
        uv, ("bilinear", "nearest", "bilinear", "bilinear"), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got[:, 0]), np.asarray(bilinear_sample(img, uv)),
        rtol=1e-5, atol=1e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(got[:, 1]).astype(np.int32), np.asarray(nearest_at(mask, uv))
    )
    fx = np.asarray(bilinear_sample(flow[..., 0], uv))
    fy = np.asarray(bilinear_sample(flow[..., 1], uv))
    np.testing.assert_allclose(np.asarray(got[:, 2]), fx, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[:, 3]), fy, rtol=1e-5, atol=1e-4)


def test_onehot_sampler_matches_xla(rng):
    """One-hot MXU sampler (`ops/onehot_sample.py`, the TPU production
    point-query path) == bilinear_sample / nearest_at XLA semantics,
    incl. border-clamped coords, valid masking and vmap."""
    from dynosam_tpu.ops.klt import bilinear_sample, nearest_at
    from dynosam_tpu.ops.onehot_sample import point_sample_mxu

    h, w = 96, 160
    img = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 9, (h, w)), jnp.int32)
    uv = jnp.concatenate([
        jnp.asarray(rng.uniform([0, 0], [w - 1, h - 1], (40, 2)), jnp.float32),
        jnp.asarray([[0.0, 0.0], [w - 1.0, h - 1.0], [-3.0, 5.0],
                     [w + 4.0, h + 2.0], [2.25, h - 1.0]], jnp.float32),
    ])
    got = point_sample_mxu(
        jnp.stack([img, mask.astype(jnp.float32)]), uv,
        ("bilinear", "nearest"),
    )
    np.testing.assert_allclose(
        np.asarray(got[:, 0]), np.asarray(bilinear_sample(img, uv)),
        rtol=1e-4, atol=2e-2,
    )
    np.testing.assert_array_equal(
        np.asarray(got[:, 1]).astype(np.int32), np.asarray(nearest_at(mask, uv))
    )
    # valid masking zeroes rows (incl. NaN coords)
    valid = jnp.asarray(rng.uniform(size=uv.shape[0]) > 0.4)
    uv_bad = uv.at[0].set(jnp.nan)
    vbad = valid.at[0].set(False)
    got_m = point_sample_mxu(img[None], uv_bad, ("bilinear",), valid=vbad)
    assert np.all(np.isfinite(np.asarray(got_m)))
    np.testing.assert_array_equal(np.asarray(got_m[~np.asarray(vbad), 0]), 0.0)
    # vmapped (the per-object solve path shape)
    uvv = jnp.asarray(rng.uniform([0, 0], [w - 1, h - 1], (4, 24, 2)),
                      jnp.float32)
    gv = jax.vmap(
        lambda u: point_sample_mxu(
            mask.astype(jnp.float32)[None], u, ("nearest",))[:, 0]
    )(uvv)
    wv = jax.vmap(lambda u: nearest_at(mask, u))(uvv)
    np.testing.assert_array_equal(np.asarray(gv).astype(np.int32),
                                  np.asarray(wv))


def test_point_sample_kernel_under_vmap(rng):
    """vmapped point_sample (the per-object solve path shape) matches
    per-lane XLA sampling."""
    from dynosam_tpu.ops.klt import nearest_at
    from dynosam_tpu.ops.pallas.point_sample import point_sample

    h, w = 64, 128
    mask = jnp.asarray(rng.integers(0, 5, (h, w)), jnp.int32)
    uv = jnp.asarray(rng.uniform([0, 0], [w - 1, h - 1], (4, 24, 2)), jnp.float32)
    got = jax.vmap(
        lambda u: point_sample(
            mask.astype(jnp.float32)[None], u, ("nearest",), interpret=True
        )[:, 0]
    )(uv)
    want = jax.vmap(lambda u: nearest_at(mask, u))(uv)
    np.testing.assert_array_equal(
        np.asarray(got).astype(np.int32), np.asarray(want)
    )


def test_lk_kernel_invalid_slots_frozen(rng):
    """Inactive pool slots must come back with their warm-start flow
    unchanged (the joint loop freezes them from iteration 0) and active
    features must be unaffected by inactive neighbours in the block."""
    from dynosam_tpu.ops.klt import flow_at
    from dynosam_tpu.ops.pallas.lk import klt_track_pallas
    from dynosam_tpu.testing.render import RenderConfig, RenderedScene

    scene = RenderedScene(RenderConfig(n_frames=2, h=192, w=256))
    f0, f1 = scene.frames()
    uv = jnp.asarray(rng.uniform([15, 15], [240, 176], (32, 2)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=32) < 0.5)
    g0 = flow_at(f0.flow, uv)
    mixed = klt_track_pallas(
        f0.gray, f1.gray, uv, valid, levels=1, iters=10, eps=0.01, g0=g0,
        interpret=True,
    )
    allv = klt_track_pallas(
        f0.gray, f1.gray, uv, jnp.ones(32, bool), levels=1, iters=10,
        eps=0.01, g0=g0, interpret=True,
    )
    v = np.asarray(valid)
    # frozen: uv = uv_prev + g0 exactly
    np.testing.assert_allclose(
        np.asarray(mixed.uv)[~v], np.asarray(uv + g0)[~v], atol=1e-6
    )
    # active features track identically to the all-valid run
    np.testing.assert_allclose(
        np.asarray(mixed.uv)[v], np.asarray(allv.uv)[v], atol=1e-5
    )
    assert not np.asarray(mixed.ok)[~v].any()


def test_lk_resident_variant_matches_reload(rng):
    """V2 'resident' kernel (cur window loaded once, iterations resample
    the VMEM-resident window) == the reload kernel for warm-started
    interior features whose iterates stay within the margin — the
    production warm-start regime (`ops/pallas/lk.py`)."""
    from dynosam_tpu.ops.klt import flow_at
    from dynosam_tpu.ops.pallas.lk import klt_track_pallas
    from dynosam_tpu.testing.render import RenderConfig, RenderedScene

    scene = RenderedScene(RenderConfig(n_frames=2, h=192, w=256))
    f0, f1 = scene.frames()
    uv = jnp.asarray(rng.uniform([15, 15], [240, 176], (32, 2)), jnp.float32)
    valid = jnp.ones((32,), bool)
    g0 = flow_at(f0.flow, uv) + jnp.asarray(
        rng.normal(0, 0.5, (32, 2)), jnp.float32
    )
    ref = klt_track_pallas(
        f0.gray, f1.gray, uv, valid, win=21, levels=1, iters=10, g0=g0,
        eps=0.01, interpret=True, variant="reload",
    )
    got = klt_track_pallas(
        f0.gray, f1.gray, uv, valid, win=21, levels=1, iters=10, g0=g0,
        eps=0.01, interpret=True, variant="resident",
    )
    both = np.asarray(ref.ok) & np.asarray(got.ok)
    d = np.linalg.norm(np.asarray(ref.uv) - np.asarray(got.uv), axis=1)
    assert both.sum() >= 25
    np.testing.assert_allclose(d[both], 0.0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ref.error)[both], np.asarray(got.error)[both], atol=1e-4
    )


def test_lk_fma_variant_matches_reload(rng):
    """V3 'fma' kernel (2-tap FMA sampling on dynamic slices, zero
    matmuls) == the reload kernel in the production warm-start regime:
    every patch tap shares one fractional offset, so the separable
    interpolation matrices are 2-hot with constant weights and the FMA
    form is the same bilinear sum in the same order
    (`ops/pallas/lk.py:_make_kernel_fma`)."""
    from dynosam_tpu.ops.klt import flow_at
    from dynosam_tpu.ops.pallas.lk import klt_track_pallas
    from dynosam_tpu.testing.render import RenderConfig, RenderedScene

    scene = RenderedScene(RenderConfig(n_frames=2, h=192, w=256))
    f0, f1 = scene.frames()
    uv = jnp.asarray(rng.uniform([15, 15], [240, 176], (32, 2)), jnp.float32)
    valid = jnp.ones((32,), bool)
    g0 = flow_at(f0.flow, uv) + jnp.asarray(
        rng.normal(0, 0.5, (32, 2)), jnp.float32
    )
    ref = klt_track_pallas(
        f0.gray, f1.gray, uv, valid, win=21, levels=1, iters=10, g0=g0,
        eps=0.01, interpret=True, variant="reload",
    )
    got = klt_track_pallas(
        f0.gray, f1.gray, uv, valid, win=21, levels=1, iters=10, g0=g0,
        eps=0.01, interpret=True, variant="fma",
    )
    both = np.asarray(ref.ok) & np.asarray(got.ok)
    d = np.linalg.norm(np.asarray(ref.uv) - np.asarray(got.uv), axis=1)
    assert both.sum() >= 25
    np.testing.assert_allclose(d[both], 0.0, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ref.error)[both], np.asarray(got.error)[both], atol=1e-3
    )


def test_lk_stack_variant_matches_reload(rng):
    """Block-batched 'stack' kernel (whole feat_block as rank-3 batched
    iota builds + two batched dot_generals) == the reload kernel: the
    batch dimension changes no per-feature accumulation order, and the
    mixed pool exercises both the all-inactive block skip and the joint
    eps freeze (`ops/pallas/lk.py:_make_kernel_stacked`)."""
    from dynosam_tpu.ops.klt import flow_at
    from dynosam_tpu.ops.pallas.lk import klt_track_pallas
    from dynosam_tpu.testing.render import RenderConfig, RenderedScene

    scene = RenderedScene(RenderConfig(n_frames=2, h=192, w=256))
    f0, f1 = scene.frames()
    uv = jnp.asarray(rng.uniform([15, 15], [240, 176], (48, 2)), jnp.float32)
    valid = jnp.asarray(rng.random(48) > 0.3)    # mixed live/dead slots
    g0 = flow_at(f0.flow, uv) + jnp.asarray(
        rng.normal(0, 0.5, (48, 2)), jnp.float32
    )
    ref = klt_track_pallas(
        f0.gray, f1.gray, uv, valid, win=21, levels=1, iters=10, g0=g0,
        eps=0.01, interpret=True, variant="reload",
    )
    got = klt_track_pallas(
        f0.gray, f1.gray, uv, valid, win=21, levels=1, iters=10, g0=g0,
        eps=0.01, interpret=True, variant="stack",
    )
    np.testing.assert_array_equal(np.asarray(ref.ok), np.asarray(got.ok))
    both = np.asarray(ref.ok) & np.asarray(got.ok)
    d = np.linalg.norm(np.asarray(ref.uv) - np.asarray(got.uv), axis=1)
    assert both.sum() >= 20
    np.testing.assert_allclose(d[both], 0.0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ref.error)[both], np.asarray(got.error)[both], atol=1e-4
    )
