"""Pallas TPU kernel: batched pyramidal Lucas-Kanade feature tracking.

Why this kernel exists: the XLA formulation (`ops/klt.py`) samples every
patch pixel with arbitrary-coordinate gathers (`img[y, x]`), and TPU
serializes per-element gathers at ~40 cycles each — measured 3.9 s/frame
for 2048 features x 21x21 x 3 levels x 30 iterations (95M samples).  The
hardware-native access pattern is the *dynamic slice*: each feature's
patch is one contiguous (rows, lanes) window.  This kernel keeps both
pyramid level images VMEM-resident and, per feature,

  * loads ONE (win+3)x(win+3) window from the previous image, forms the
    bilinear-interpolated template and its central-difference gradients
    (all static slices of the window — pure VPU);
  * runs the LK normal-equation iterations in a `fori_loop`, each
    iteration loading one (win+1)x(win+1) window from the current image
    at the updated position via `pl.ds` — a handful of tile reads
    instead of 441 scalar gathers;
  * writes the final flow and photometric error.

The grid runs over feature blocks; the image BlockSpecs use a constant
index map, so Pallas fetches each level image into VMEM once and reuses
it across all programs.  Borders: windows are clamped to the image, which
changes values only for features whose patch leaves the image — exactly
the features the caller's in-bounds/error mask discards (same contract as
`ops/klt.py`, whose edge-clamped `bilinear_sample` differs there too).

Replaces the tracking stage of the reference's
`KltFeatureTracker::trackPoints` (`StaticFeatureTracker.cc:230-518`,
cv::calcOpticalFlowPyrLK).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..klt import KLTResult, build_pyramid

# MXU precision of the interpolation matmuls.  HIGHEST (6-pass f32) keeps
# the kernel bit-comparable to the XLA path; "float32" (3-pass) is ~equal
# accuracy for image interpolation in practice.  Module-level so
# experiments can override before trace; DYNO_LK_PRECISION=float32|default
# selects at import for the TPU bench sweep.
import os as _os

_DOT_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    # Mosaic lowers only DEFAULT/HIGHEST (Precision.HIGH raises
    # NotImplementedError); DEFAULT = bf16-rounded MXU inputs
    "float32": jax.lax.Precision.DEFAULT,
    "default": jax.lax.Precision.DEFAULT,
}[_os.environ.get("DYNO_LK_PRECISION", "highest")]


def _run_iters(step, feat_block: int, iters: int, eps: float, gu0, gv0, vv,
               unroll: int = 1):
    """Shared LK iteration loop over one feature block (all kernel
    variants).

    `unroll` > 1 advances `unroll` LK steps per `while_loop` iteration and
    checks the eps gate once per group: every loop iteration on TPU carries
    a fixed scheduling cost that the device trace showed FLAT across all
    kernel-body variants, so fewer/fatter iterations amortize it.  A
    feature frozen at group entry stays frozen for the group (identical to
    unroll=1); an active feature may take up to unroll-1 refinement steps
    past its eps crossing.  NOTE: with unroll > 1 the step count can
    OVERSHOOT `iters` by up to unroll-1 steps — the eps path tests
    `it < iters` before advancing a whole group, and the eps=0 path runs
    ceil(iters/unroll)*unroll steps.  Accepted for this experimental knob
    (extra Newton steps on a converged iterate are benign); the production
    default unroll=1 matches `iters` exactly."""
    if eps > 0.0:
        eps2 = jnp.float32(eps * eps)

        def cond(c):
            it, _, _, d2 = c
            return jnp.logical_and(it < iters, jnp.max(d2) > eps2)

        def wbody(c):
            it, gu, gv_, d2 = c
            act = [d2[f] > eps2 for f in range(feat_block)]
            for _ in range(unroll):
                dus, dvs = [], []
                for f in range(feat_block):
                    du_f, dv_f = step(f, gu[f], gv_[f])
                    dus.append(jnp.where(act[f], du_f, 0.0))
                    dvs.append(jnp.where(act[f], dv_f, 0.0))
                du = jnp.stack(dus)
                dv = jnp.stack(dvs)
                gu = gu + du
                gv_ = gv_ + dv
            return (it + unroll, gu, gv_, du * du + dv * dv)

        # inactive pool slots start frozen (d2 = 0): an all-inactive
        # block never enters the loop, a mixed block stops with its
        # last ACTIVE feature instead of iterating on stale positions
        _, gu, gv_, _ = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), gu0, gv0, vv * 1e9),
        )
        return gu, gv_

    def body(_, c):
        gu, gv_ = c
        for _ in range(unroll):
            dus, dvs = [], []
            for f in range(feat_block):
                du_f, dv_f = step(f, gu[f], gv_[f])
                dus.append(du_f * vv[f])
                dvs.append(dv_f * vv[f])
            gu = gu + jnp.stack(dus)
            gv_ = gv_ + jnp.stack(dvs)
        return (gu, gv_)

    n_groups = (iters + unroll - 1) // unroll
    return jax.lax.fori_loop(0, n_groups, body, (gu0, gv0))


def _make_kernel_resident(
    h: int, w: int, win: int, iters: int, feat_block: int, eps: float,
    margin: int = 8, unroll: int = 1,
):
    """V2 kernel: the CURRENT-image window is loaded ONCE per feature
    (anchored at the warm-start position with ±`margin` rows of headroom)
    and every LK iteration resamples from the VMEM-RESIDENT window instead
    of re-slicing the image — one (SY2, SX) load per feature instead of one
    per iteration.

    Semantics vs the reload kernel: identical while the iterate stays
    within `margin` rows (x headroom is ~the 128-lane alignment slack,
    >=100 px) of the warm start; a runaway feature clamps at the window
    edge instead of the image edge, raises its photometric error, and is
    discarded by the caller's error gate — the same fate the reload kernel
    gives features that clamp at the image border.
    """
    hw = win // 2
    pwin = win + 2
    SY = min(h, ((pwin + 1 + 2 * margin + 7) + 7) // 8 * 8)
    SX = min(w, ((pwin + 1 + 127) + 127) // 128 * 128)
    if SY != h and (h - SY) % 8 != 0:
        SY = h
    if SX != w and (w - SX) % 128 != 0:
        SX = w

    def kernel(p_ref, g_ref, v_ref, prev_ref, cur_ref, gout_ref, err_ref):
        def anchor(x0f, y0f):
            if SY == h:
                jy0 = 0
            else:
                jy0 = jnp.clip(
                    ((jnp.floor(y0f).astype(jnp.int32) - margin) // 8) * 8,
                    0, h - SY,
                )
                jy0 = pl.multiple_of(jy0, 8)
            if SX == w:
                jx0 = 0
            else:
                jx0 = jnp.clip(
                    (jnp.floor(x0f).astype(jnp.int32) // 128) * 128,
                    0, w - SX,
                )
                jx0 = pl.multiple_of(jx0, 128)
            return jx0, jy0

        def interp(win_, jx0, jy0, x0f, y0f, size):
            """Bilinear (size, size) patch at (x0f, y0f) from the resident
            window value `win_` anchored at (jx0, jy0).  Coordinates clamp
            to the window extent (== the image extent wherever the window
            touches the border)."""
            rr_y = jax.lax.broadcasted_iota(
                jnp.int32, (size, SY), 0).astype(jnp.float32)
            jj_y = jax.lax.broadcasted_iota(
                jnp.int32, (size, SY), 1).astype(jnp.float32)
            rr_x = jax.lax.broadcasted_iota(
                jnp.int32, (size, SX), 0).astype(jnp.float32)
            jj_x = jax.lax.broadcasted_iota(
                jnp.int32, (size, SX), 1).astype(jnp.float32)
            y_lo, y_hi = jy0 * 1.0, jy0 + (SY - 1.0)
            x_lo, x_hi = jx0 * 1.0, jx0 + (SX - 1.0)
            ly = jnp.clip(y0f + rr_y, y_lo, y_hi) - jy0 * 1.0
            lx = jnp.clip(x0f + rr_x, x_lo, x_hi) - jx0 * 1.0
            R = jnp.maximum(0.0, 1.0 - jnp.abs(ly - jj_y))
            C = jnp.maximum(0.0, 1.0 - jnp.abs(lx - jj_x))
            # column-first: (SY,SX)@(SX,size) contracts the full 256-lane
            # K on the MXU; row-first's K=SY(32) pass runs 1/4-utilized
            # and leaves the big (size,SX) product for the second dot
            # (323k vs 205k MACs per sample)
            cw = jnp.dot(win_, C.T, preferred_element_type=jnp.float32,
                         precision=_DOT_PRECISION)
            return jnp.dot(R, cw, preferred_element_type=jnp.float32,
                           precision=_DOT_PRECISION)

        base = pl.program_id(0) * feat_block
        if feat_block % 8 == 0:
            base = pl.multiple_of(base, 8)
        pv = p_ref[pl.ds(base, feat_block), :]
        gv = g_ref[pl.ds(base, feat_block), :]
        vv = v_ref[pl.ds(base, feat_block), 0]

        # ---- all-inactive block: skip template/iteration/error work
        # entirely (callers compact active slots to the front, so whole
        # blocks of dead pool slots cost one predicate each).  Passthrough
        # writes keep the output buffers defined: unchanged flow, zero
        # error (inactive slots are masked by the caller's `valid` gate
        # either way).
        any_act = jnp.max(vv) > 0.0

        @pl.when(jnp.logical_not(any_act))
        def _():
            gout_ref[pl.ds(base, feat_block), :] = gv
            err_ref[pl.ds(base, feat_block), :] = jnp.zeros(
                (feat_block, 1), gv.dtype
            )

        @pl.when(any_act)
        def _():

            # ---- templates/gradients from prev (window loaded once each) ----
            ts, gxs, gys, coefs = [], [], [], []
            cur_wins, cur_anchor = [], []
            for f in range(feat_block):
                px, py = pv[f, 0], pv[f, 1]
                jx0, jy0 = anchor(px - hw - 1, py - hw - 1)
                wp = prev_ref[pl.ds(jy0, SY), pl.ds(jx0, SX)]
                b = interp(wp, jx0, jy0, px - hw - 1, py - hw - 1, pwin)
                t = b[1:win + 1, 1:win + 1]
                gx = (b[1:win + 1, 2:win + 2] - b[1:win + 1, 0:win]) * 0.5
                gy = (b[2:win + 2, 1:win + 1] - b[0:win, 1:win + 1]) * 0.5
                gxx = jnp.sum(gx * gx)
                gxy = jnp.sum(gx * gy)
                gyy = jnp.sum(gy * gy)
                det = gxx * gyy - gxy * gxy
                inv_ok = det > 1e-6
                det_safe = jnp.where(inv_ok, det, 1.0)
                ts.append(t)
                gxs.append(gx)
                gys.append(gy)
                coefs.append((gxx, gxy, gyy, det_safe, inv_ok))
                # resident CURRENT window, anchored at the warm start
                cx0, cy0 = anchor(
                    px + gv[f, 0] - hw - 1, py + gv[f, 1] - hw - 1
                )
                cur_wins.append(cur_ref[pl.ds(cy0, SY), pl.ds(cx0, SX)])
                cur_anchor.append((cx0, cy0))

            def sample_cur(f, gu_f, gv_f):
                cx0, cy0 = cur_anchor[f]
                p = interp(
                    cur_wins[f], cx0, cy0,
                    pv[f, 0] + gu_f - hw - 1, pv[f, 1] + gv_f - hw - 1, pwin,
                )
                return p[1:win + 1, 1:win + 1]

            def step(f, gu_f, gv_f):
                r = sample_cur(f, gu_f, gv_f) - ts[f]
                bx = jnp.sum(r * gxs[f])
                by = jnp.sum(r * gys[f])
                gxx, gxy, gyy, det_safe, inv_ok = coefs[f]
                du = -(gyy * bx - gxy * by) / det_safe
                dv = -(-gxy * bx + gxx * by) / det_safe
                du = jnp.where(inv_ok, jnp.clip(du, -win, win), 0.0)
                dv = jnp.where(inv_ok, jnp.clip(dv, -win, win), 0.0)
                return du, dv

            gu, gv_ = _run_iters(
                step, feat_block, iters, eps, gv[:, 0], gv[:, 1], vv, unroll
            )

            errs = [
                jnp.mean(jnp.abs(sample_cur(f, gu[f], gv_[f]) - ts[f]))
                for f in range(feat_block)
            ]
            gout_ref[pl.ds(base, feat_block), :] = jnp.stack([gu, gv_], axis=-1)
            err_ref[pl.ds(base, feat_block), :] = jnp.stack(errs)[:, None]

    return kernel


def _make_kernel_fma(
    h: int, w: int, win: int, iters: int, feat_block: int, eps: float,
    margin: int | None = None, unroll: int = 1,
):
    """V3 kernel: bilinear sampling WITHOUT matmuls.

    Every tap of a patch at float origin (x0, y0) shares one fractional
    offset (fy, fx) — the taps sit on a unit grid — so the separable
    interpolation matrices of the other kernels are 2-hot with CONSTANT
    weights, and the whole patch is

        rows = (1-fy) * W[k0 : k0+s, :] + fy * W[k0+1 : k0+s+1, :]
        patch = (1-fx) * rows[:, l0 : l0+s] + fx * rows[:, l0+1 : l0+s+1]

    — two FMAs on the VPU replacing two (s, SY)x(SY, SX)-class MXU dots
    AND their per-sample iota-built weight matrices (the frontend device
    trace showed lk_level at 5.4 ms/frame ~flat across dot precisions, so
    the kernel is weight-build/VPU bound, not MXU bound).  Mosaic has no
    lowering for `dynamic_slice` on VALUES (only tile-aligned `pl.ds` ref
    loads), so the dynamic window offsets (k0, l0) are applied with
    `pltpu.roll` — the TPU's dynamic sublane/lane rotate — followed by
    STATIC slices: roll(win, -k0)[0:s+1] == win[k0:k0+s+1] whenever
    k0+s+1 <= SY (guaranteed by the clip), wrap-around never reaches the
    kept rows.  Like the resident kernel, the current-image window is
    loaded once per feature; out-of-window iterates clamp at the window
    edge and die by the caller's error gate (same border contract as the
    other variants).
    """
    hw = win // 2
    pwin = win + 2
    # margin: resident-window drift headroom in rows.  0 keeps the rotate
    # operand minimal (SY = 32 for win = 21); iterates that drift more than
    # the anchor's 8-row alignment slack clamp at the window edge and die
    # by the caller's error gate, exactly like the >margin case at
    # margin = 8.
    if margin is None:
        margin = _LK_FMA_MARGIN
    SY = min(h, ((pwin + 1 + 2 * margin + 7) + 7) // 8 * 8)
    SX = min(w, ((pwin + 1 + 127) + 127) // 128 * 128)
    if SY != h and (h - SY) % 8 != 0:
        SY = h
    if SX != w and (w - SX) % 128 != 0:
        SX = w

    def kernel(p_ref, g_ref, v_ref, prev_ref, cur_ref, gout_ref, err_ref):
        def anchor(x0f, y0f):
            if SY == h:
                jy0 = 0
            else:
                jy0 = jnp.clip(
                    ((jnp.floor(y0f).astype(jnp.int32) - margin) // 8) * 8,
                    0, h - SY,
                )
                jy0 = pl.multiple_of(jy0, 8)
            if SX == w:
                jx0 = 0
            else:
                jx0 = jnp.clip(
                    (jnp.floor(x0f).astype(jnp.int32) // 128) * 128,
                    0, w - SX,
                )
                jx0 = pl.multiple_of(jx0, 128)
            return jx0, jy0

        def interp(win_, jx0, jy0, x0f, y0f, size):
            y0 = jnp.floor(y0f)
            x0 = jnp.floor(x0f)
            fy = (y0f - y0).astype(jnp.float32)
            fx = (x0f - x0).astype(jnp.float32)
            k0 = jnp.clip(y0.astype(jnp.int32) - jy0, 0, SY - size - 1)
            l0 = jnp.clip(x0.astype(jnp.int32) - jx0, 0, SX - size - 1)
            # dynamic start -> rotate + static slice (see docstring).
            # Mosaic's dynamic_rotate rejects unaligned operands
            # ("unsupported unaligned shape"), so every roll operand keeps
            # 8-aligned sublanes: the row roll runs on the full (SY, SX)
            # window, is sliced to the 8-ALIGNED size+1=24 rows (win=21),
            # and only then does the lane roll run — (24, SX) instead of
            # (SY, SX), halving the second rotate's register footprint.
            srows = (size + 1 + 7) // 8 * 8
            rows = pltpu.roll(win_, -k0, 0)[:srows]            # (srows, SX)
            cols = pltpu.roll(rows, -l0, 1)[: size + 1, : size + 1]
            rw = cols[:size] * (1.0 - fy) + cols[1:] * fy      # (size, size+1)
            return rw[:, :size] * (1.0 - fx) + rw[:, 1:] * fx

        base = pl.program_id(0) * feat_block
        if feat_block % 8 == 0:
            base = pl.multiple_of(base, 8)
        pv = p_ref[pl.ds(base, feat_block), :]
        gv = g_ref[pl.ds(base, feat_block), :]
        vv = v_ref[pl.ds(base, feat_block), 0]

        # ---- all-inactive block: skip template/iteration/error work
        # entirely (callers compact active slots to the front, so whole
        # blocks of dead pool slots cost one predicate each).  Passthrough
        # writes keep the output buffers defined: unchanged flow, zero
        # error (inactive slots are masked by the caller's `valid` gate
        # either way).
        any_act = jnp.max(vv) > 0.0

        @pl.when(jnp.logical_not(any_act))
        def _():
            gout_ref[pl.ds(base, feat_block), :] = gv
            err_ref[pl.ds(base, feat_block), :] = jnp.zeros(
                (feat_block, 1), gv.dtype
            )

        @pl.when(any_act)
        def _():

            ts, gxs, gys, coefs = [], [], [], []
            cur_wins, cur_anchor = [], []
            for f in range(feat_block):
                px, py = pv[f, 0], pv[f, 1]
                jx0, jy0 = anchor(px - hw - 1, py - hw - 1)
                wp = prev_ref[pl.ds(jy0, SY), pl.ds(jx0, SX)]
                b = interp(wp, jx0, jy0, px - hw - 1, py - hw - 1, pwin)
                t = b[1:win + 1, 1:win + 1]
                gx = (b[1:win + 1, 2:win + 2] - b[1:win + 1, 0:win]) * 0.5
                gy = (b[2:win + 2, 1:win + 1] - b[0:win, 1:win + 1]) * 0.5
                gxx = jnp.sum(gx * gx)
                gxy = jnp.sum(gx * gy)
                gyy = jnp.sum(gy * gy)
                det = gxx * gyy - gxy * gxy
                inv_ok = det > 1e-6
                det_safe = jnp.where(inv_ok, det, 1.0)
                ts.append(t)
                gxs.append(gx)
                gys.append(gy)
                coefs.append((gxx, gxy, gyy, det_safe, inv_ok))
                cx0, cy0 = anchor(
                    px + gv[f, 0] - hw - 1, py + gv[f, 1] - hw - 1
                )
                cur_wins.append(cur_ref[pl.ds(cy0, SY), pl.ds(cx0, SX)])
                cur_anchor.append((cx0, cy0))

            def sample_cur(f, gu_f, gv_f):
                cx0, cy0 = cur_anchor[f]
                p = interp(
                    cur_wins[f], cx0, cy0,
                    pv[f, 0] + gu_f - hw - 1, pv[f, 1] + gv_f - hw - 1, pwin,
                )
                return p[1:win + 1, 1:win + 1]

            def step(f, gu_f, gv_f):
                r = sample_cur(f, gu_f, gv_f) - ts[f]
                bx = jnp.sum(r * gxs[f])
                by = jnp.sum(r * gys[f])
                gxx, gxy, gyy, det_safe, inv_ok = coefs[f]
                du = -(gyy * bx - gxy * by) / det_safe
                dv = -(-gxy * bx + gxx * by) / det_safe
                du = jnp.where(inv_ok, jnp.clip(du, -win, win), 0.0)
                dv = jnp.where(inv_ok, jnp.clip(dv, -win, win), 0.0)
                return du, dv

            gu, gv_ = _run_iters(
                step, feat_block, iters, eps, gv[:, 0], gv[:, 1], vv, unroll
            )

            errs = [
                jnp.mean(jnp.abs(sample_cur(f, gu[f], gv_[f]) - ts[f]))
                for f in range(feat_block)
            ]
            gout_ref[pl.ds(base, feat_block), :] = jnp.stack([gu, gv_], axis=-1)
            err_ref[pl.ds(base, feat_block), :] = jnp.stack(errs)[:, None]

    return kernel


def _make_kernel(
    h: int, w: int, win: int, iters: int, feat_block: int, eps: float,
    unroll: int = 1,
):
    hw = win // 2
    pwin = win + 2          # template+gradient patch extent
    # Loaded window sizes: Mosaic vector loads need the dynamic start
    # aligned to the f32 (8, 128) tile grid, so the window start is
    # rounded DOWN to the tile grid and sized to still cover the patch
    # (+ up to 7 rows / 127 lanes of alignment slack).  The separable
    # interpolation matrices absorb the in-window offset for free.
    SY = min(h, ((pwin + 1 + 7) + 7) // 8 * 8)        # 32 for win=21
    SX = min(w, ((pwin + 1 + 127) + 127) // 128 * 128)  # 256 for win=21
    # the clip bound (h-SY, w-SX) must ITSELF be tile-aligned or clipping
    # would break the alignment promised to Mosaic (runtime fault)
    if SY != h and (h - SY) % 8 != 0:
        SY = h
    if SX != w and (w - SX) % 128 != 0:
        SX = w

    def kernel(p_ref, g_ref, v_ref, prev_ref, cur_ref, gout_ref, err_ref):
        def sample(ref, x0f, y0f, size):
            """(size, size) bilinear patch at float origin (x0f, y0f).

            Per-sample edge clamping EXACTLY like `ops.klt.bilinear_sample`
            (coords clipped to the image before interpolation), built as
            two separable interpolation matrices:
                patch = R @ W @ C^T,
            where W is ONE contiguous tile-aligned (SY, SX) window
            (`pl.ds` dynamic slice — the TPU-native access) and
            R[r, j] = max(0, 1 - |rowpos_r - j|) are the bilinear weights
            of the clipped row positions against the window rows (2-hot
            rows).  No per-element gathers anywhere.
            """
            if SY == h:
                jy0 = 0
            else:
                jy0 = jnp.clip(
                    (jnp.floor(y0f).astype(jnp.int32) // 8) * 8, 0, h - SY
                )
                jy0 = pl.multiple_of(jy0, 8)
            if SX == w:
                jx0 = 0
            else:
                jx0 = jnp.clip(
                    (jnp.floor(x0f).astype(jnp.int32) // 128) * 128,
                    0, w - SX,
                )
                jx0 = pl.multiple_of(jx0, 128)
            win_ = ref[pl.ds(jy0, SY), pl.ds(jx0, SX)]     # (SY, SX)
            rr_y = jax.lax.broadcasted_iota(
                jnp.int32, (size, SY), 0).astype(jnp.float32)
            jj_y = jax.lax.broadcasted_iota(
                jnp.int32, (size, SY), 1).astype(jnp.float32)
            rr_x = jax.lax.broadcasted_iota(
                jnp.int32, (size, SX), 0).astype(jnp.float32)
            jj_x = jax.lax.broadcasted_iota(
                jnp.int32, (size, SX), 1).astype(jnp.float32)
            ly = jnp.clip(y0f + rr_y, 0.0, h - 1.0) - jy0 * 1.0
            lx = jnp.clip(x0f + rr_x, 0.0, w - 1.0) - jx0 * 1.0
            R = jnp.maximum(0.0, 1.0 - jnp.abs(ly - jj_y))  # (size, SY)
            C = jnp.maximum(0.0, 1.0 - jnp.abs(lx - jj_x))  # (size, SX)
            # column-first (see the resident kernel note): full-K MXU
            # utilization on the big dot, 205k vs 323k MACs per sample
            cw = jnp.dot(win_, C.T, preferred_element_type=jnp.float32,
                         precision=_DOT_PRECISION)
            return jnp.dot(R, cw, preferred_element_type=jnp.float32,
                           precision=_DOT_PRECISION)

        # Full arrays live in VMEM (tiny); each program addresses its rows
        # with pl.ds — (1, 2)-style blocks violate the (8, 128) block
        # tiling rule, full-array blocks don't.
        base = pl.program_id(0) * feat_block
        if feat_block % 8 == 0:
            base = pl.multiple_of(base, 8)
        pv = p_ref[pl.ds(base, feat_block), :]   # (F, 2) value; scalars
        gv = g_ref[pl.ds(base, feat_block), :]   # extracted from the value
        vv = v_ref[pl.ds(base, feat_block), 0]

        # ---- all-inactive block: skip template/iteration/error work
        # entirely (callers compact active slots to the front, so whole
        # blocks of dead pool slots cost one predicate each).  Passthrough
        # writes keep the output buffers defined: unchanged flow, zero
        # error (inactive slots are masked by the caller's `valid` gate
        # either way).
        any_act = jnp.max(vv) > 0.0

        @pl.when(jnp.logical_not(any_act))
        def _():
            gout_ref[pl.ds(base, feat_block), :] = gv
            err_ref[pl.ds(base, feat_block), :] = jnp.zeros(
                (feat_block, 1), gv.dtype
            )

        @pl.when(any_act)
        def _():       # (F,) 1.0 = active slot

            # ---- per-feature templates + gradients (unrolled, independent) --
            ts, gxs, gys, coefs = [], [], [], []
            for f in range(feat_block):
                px, py = pv[f, 0], pv[f, 1]
                b = sample(prev_ref, px - hw - 1, py - hw - 1, pwin)
                t = b[1:win + 1, 1:win + 1]                # (win, win)
                gx = (b[1:win + 1, 2:win + 2] - b[1:win + 1, 0:win]) * 0.5
                gy = (b[2:win + 2, 1:win + 1] - b[0:win, 1:win + 1]) * 0.5
                gxx = jnp.sum(gx * gx)
                gxy = jnp.sum(gx * gy)
                gyy = jnp.sum(gy * gy)
                det = gxx * gyy - gxy * gxy
                inv_ok = det > 1e-6
                det_safe = jnp.where(inv_ok, det, 1.0)
                ts.append(t)
                gxs.append(gx)
                gys.append(gy)
                coefs.append((gxx, gxy, gyy, det_safe, inv_ok))

            def sample_cur(f, gu_f, gv_f):
                p = sample(
                    cur_ref, pv[f, 0] + gu_f - hw - 1, pv[f, 1] + gv_f - hw - 1,
                    pwin,
                )
                return p[1:win + 1, 1:win + 1]             # (win, win)

            def step(f, gu_f, gv_f):
                r = sample_cur(f, gu_f, gv_f) - ts[f]
                bx = jnp.sum(r * gxs[f])
                by = jnp.sum(r * gys[f])
                gxx, gxy, gyy, det_safe, inv_ok = coefs[f]
                du = -(gyy * bx - gxy * by) / det_safe
                dv = -(-gxy * bx + gxx * by) / det_safe
                du = jnp.where(inv_ok, jnp.clip(du, -win, win), 0.0)
                dv = jnp.where(inv_ok, jnp.clip(dv, -win, win), 0.0)
                return du, dv

            # ---- JOINT iteration loop over the whole feature block ----------
            # One loop whose body advances all F features (per-feature freeze
            # mask for the eps gate) instead of F sequential per-feature
            # loops: the F samples inside one body are independent, so their
            # window loads/matmuls pipeline, and the sequential depth drops
            # from sum_f(iters_f) to max_f(iters_f).  See _run_iters for the
            # unroll semantics.
            gu, gv_ = _run_iters(
                step, feat_block, iters, eps, gv[:, 0], gv[:, 1], vv, unroll
            )

            errs = [
                jnp.mean(jnp.abs(sample_cur(f, gu[f], gv_[f]) - ts[f]))
                for f in range(feat_block)
            ]
            gout_ref[pl.ds(base, feat_block), :] = jnp.stack([gu, gv_], axis=-1)
            err_ref[pl.ds(base, feat_block), :] = jnp.stack(errs)[:, None]

    return kernel


def _make_kernel_stacked(
    h: int, w: int, win: int, iters: int, feat_block: int, eps: float,
    unroll: int = 1,
):
    """Block-BATCHED variant of `_make_kernel` ("stack"): the round-5 trace
    showed the reload kernel OP-COUNT bound — ~12 small ops per sample per
    feature (iota 2-hot builds, tiny dots, slices), each carrying fixed
    Mosaic scheduling cost, with per-op work far below a VPU/MXU tile.
    Here every phase processes the WHOLE feat_block as rank-3 batched
    arrays:

      * the F windows are copied into one (F, SY, SX) VMEM scratch
        (the per-feature `pl.ds` loads are the only remaining small ops);
      * the bilinear weight matrices build as (F, pwin, SY/SX) fat iota
        ops with per-feature origins broadcast from (F, 1) columns;
      * interpolation is TWO batched `dot_general`s (batch F, the same
        column-first order as the reload kernel — per-feature results are
        bit-identical since the extra batch dim changes no accumulation);
      * gradients/residual reductions are (F, win, win) -> (F,) fat ops.

    Op count per block drops ~4x (measured composition: template ~36 ops
    vs ~160, iteration ~40 vs ~144).  Semantics == reload: same clamped
    sampling, same joint eps loop (per-feature freeze at group entry),
    same all-inactive block skip."""
    hw = win // 2
    pwin = win + 2
    SY = min(h, ((pwin + 1 + 7) + 7) // 8 * 8)
    SX = min(w, ((pwin + 1 + 127) + 127) // 128 * 128)
    if SY != h and (h - SY) % 8 != 0:
        SY = h
    if SX != w and (w - SX) % 128 != 0:
        SX = w
    F = feat_block

    def kernel(p_ref, g_ref, v_ref, prev_ref, cur_ref, gout_ref, err_ref,
               wstk_ref):
        base = pl.program_id(0) * F
        if F % 8 == 0:
            base = pl.multiple_of(base, 8)
        pv = p_ref[pl.ds(base, F), :]   # (F, 2)
        gv = g_ref[pl.ds(base, F), :]
        vv = v_ref[pl.ds(base, F), 0]

        any_act = jnp.max(vv) > 0.0

        @pl.when(jnp.logical_not(any_act))
        def _():
            gout_ref[pl.ds(base, F), :] = gv
            err_ref[pl.ds(base, F), :] = jnp.zeros((F, 1), gv.dtype)

        @pl.when(any_act)
        def _():
            def sample_stack(ref, x0s, y0s):
                """(F, pwin, pwin) bilinear patches; x0s/y0s are length-F
                lists of scalar float origins (needed for pl.ds)."""
                jy0s, jx0s = [], []
                for f in range(F):
                    if SY == h:
                        jy0 = 0
                    else:
                        jy0 = jnp.clip(
                            (jnp.floor(y0s[f]).astype(jnp.int32) // 8) * 8,
                            0, h - SY,
                        )
                        jy0 = pl.multiple_of(jy0, 8)
                    if SX == w:
                        jx0 = 0
                    else:
                        jx0 = jnp.clip(
                            (jnp.floor(x0s[f]).astype(jnp.int32) // 128)
                            * 128, 0, w - SX,
                        )
                        jx0 = pl.multiple_of(jx0, 128)
                    wstk_ref[f] = ref[pl.ds(jy0, SY), pl.ds(jx0, SX)]
                    jy0s.append(jy0)
                    jx0s.append(jx0)
                Ws = wstk_ref[...]                          # (F, SY, SX)
                x0v = jnp.stack(x0s)[:, None]               # (F, 1)
                y0v = jnp.stack(y0s)[:, None]
                jy0v = jnp.stack(
                    [jnp.asarray(j, jnp.float32) * 1.0 for j in jy0s]
                )[:, None]
                jx0v = jnp.stack(
                    [jnp.asarray(j, jnp.float32) * 1.0 for j in jx0s]
                )[:, None]
                ii = jax.lax.broadcasted_iota(
                    jnp.int32, (F, pwin), 1).astype(jnp.float32)
                ly = jnp.clip(y0v + ii, 0.0, h - 1.0) - jy0v   # (F, pwin)
                lx = jnp.clip(x0v + ii, 0.0, w - 1.0) - jx0v
                jw = jax.lax.broadcasted_iota(
                    jnp.int32, (F, pwin, SY), 2).astype(jnp.float32)
                R = jnp.maximum(0.0, 1.0 - jnp.abs(ly[:, :, None] - jw))
                cc = jax.lax.broadcasted_iota(
                    jnp.int32, (F, pwin, SX), 2).astype(jnp.float32)
                C = jnp.maximum(0.0, 1.0 - jnp.abs(lx[:, :, None] - cc))
                # column-first like the reload kernel: WC[f] = W_f @ C_f^T,
                # P[f] = R_f @ WC[f] — identical per-feature accumulation
                WC = jax.lax.dot_general(
                    Ws, C, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=_DOT_PRECISION,
                )                                            # (F, SY, pwin)
                return jax.lax.dot_general(
                    R, WC, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=_DOT_PRECISION,
                )                                            # (F, pwin, pwin)

            # ---- template + gradients (one batched phase) ----------------
            px = [pv[f, 0] - hw - 1 for f in range(F)]
            py = [pv[f, 1] - hw - 1 for f in range(F)]
            def _rsum12(x):
                # Mosaic crashes on multi-axis reduces of rank-3 values
                # (layout.h rank check) — reduce one axis at a time
                return jnp.sum(jnp.sum(x, axis=2), axis=1)

            b = sample_stack(prev_ref, px, py)
            t = b[:, 1:win + 1, 1:win + 1]                   # (F, win, win)
            gx = (b[:, 1:win + 1, 2:win + 2] - b[:, 1:win + 1, 0:win]) * 0.5
            gy = (b[:, 2:win + 2, 1:win + 1] - b[:, 0:win, 1:win + 1]) * 0.5
            gxx = _rsum12(gx * gx)                           # (F,)
            gxy = _rsum12(gx * gy)
            gyy = _rsum12(gy * gy)
            det = gxx * gyy - gxy * gxy
            inv_ok = det > 1e-6
            det_safe = jnp.where(inv_ok, det, 1.0)

            def sample_cur(gu, gv_):
                xs = [pv[f, 0] + gu[f] - hw - 1 for f in range(F)]
                ys = [pv[f, 1] + gv_[f] - hw - 1 for f in range(F)]
                p = sample_stack(cur_ref, xs, ys)
                return p[:, 1:win + 1, 1:win + 1]

            def step_all(gu, gv_):
                r = sample_cur(gu, gv_) - t                  # (F, win, win)
                bx = _rsum12(r * gx)
                by = _rsum12(r * gy)
                du = -(gyy * bx - gxy * by) / det_safe
                dv = -(-gxy * bx + gxx * by) / det_safe
                du = jnp.where(inv_ok, jnp.clip(du, -win, win), 0.0)
                dv = jnp.where(inv_ok, jnp.clip(dv, -win, win), 0.0)
                return du, dv

            gu0, gv0 = gv[:, 0], gv[:, 1]
            if eps > 0.0:
                eps2 = jnp.float32(eps * eps)

                def cond(c):
                    it, _, _, d2 = c
                    return jnp.logical_and(it < iters, jnp.max(d2) > eps2)

                def wbody(c):
                    it, gu, gv_, d2 = c
                    act = d2 > eps2                          # (F,) freeze
                    for _ in range(unroll):
                        du, dv = step_all(gu, gv_)
                        du = jnp.where(act, du, 0.0)
                        dv = jnp.where(act, dv, 0.0)
                        gu = gu + du
                        gv_ = gv_ + dv
                    return (it + unroll, gu, gv_, du * du + dv * dv)

                _, gu, gv_, _ = jax.lax.while_loop(
                    cond, wbody, (jnp.int32(0), gu0, gv0, vv * 1e9),
                )
            else:
                def body(_, c):
                    gu, gv_ = c
                    for _ in range(unroll):
                        du, dv = step_all(gu, gv_)
                        gu = gu + du * vv
                        gv_ = gv_ + dv * vv
                    return (gu, gv_)

                n_groups = (iters + unroll - 1) // unroll
                gu, gv_ = jax.lax.fori_loop(0, n_groups, body, (gu0, gv0))

            errs = _rsum12(
                jnp.abs(sample_cur(gu, gv_) - t)
            ) * (1.0 / (win * win))                          # (F,)
            gout_ref[pl.ds(base, F), :] = jnp.stack([gu, gv_], axis=-1)
            err_ref[pl.ds(base, F), :] = errs[:, None]

    return kernel, (F, SY, SX)


# kernel variant: "stack" (round-5 production) batches the whole
# feat_block per phase — in-pipeline A/B 171.6 fps vs reload's 125.8;
# "reload" re-slices the image per iteration (round-2..4 production);
# "resident" loads one margin-padded window per feature and iterates
# within it; "fma" 2-tap rolls (negative in-pipeline, session 9)
_LK_VARIANT = _os.environ.get("DYNO_LK_VARIANT", "stack")
# fma resident-window row headroom (see _make_kernel_fma)
_LK_FMA_MARGIN = int(_os.environ.get("DYNO_LK_MARGIN", "8"))
# LK steps per while-loop iteration (see _run_iters)
_LK_UNROLL = int(_os.environ.get("DYNO_LK_UNROLL", "1"))
# features per kernel program: smaller blocks exit the eps while-loop at a
# finer granularity (a block waits for its slowest ACTIVE feature); ILP
# from larger blocks measured ~nil (session 9 fb sweep)
_LK_FEAT_BLOCK = int(_os.environ.get("DYNO_LK_FEAT_BLOCK", "8"))


@functools.partial(
    jax.jit,
    static_argnames=("win", "iters", "feat_block", "eps", "interpret",
                     "variant", "unroll")
)
def lk_level(
    prev_img: jax.Array,
    cur_img: jax.Array,
    p_lvl: jax.Array,        # (N, 2) feature positions at this level's scale
    g0: jax.Array,           # (N, 2) incoming flow estimate (level pixels)
    valid: jax.Array | None = None,   # (N,) active-slot mask
    win: int = 21,
    iters: int = 30,
    feat_block: int = 8,   # features per program; 8 keeps the per-program
    #                        row I/O tile-aligned (Mosaic dynamic sublane
    #                        accesses must be provably 8-aligned) and
    #                        unrolls the kernel 8x for ILP
    eps: float = 0.0,
    interpret: bool = False,
    variant: str | None = None,
    unroll: int | None = None,
):
    """One pyramid level of LK for all features.  Returns (g, err).

    `valid` freezes inactive pool slots: an all-inactive feature block
    exits the joint loop before its first iteration."""
    v = variant or _LK_VARIANT
    if v == "fma":
        # Mosaic's dynamic_rotate (pltpu.roll) requires (8, 128)-aligned
        # operands; pyramid level widths like 320 (=1280/4) are not.  Edge
        # padding is VALUE-IDENTICAL to the kernels' clamp-to-border
        # sampling (a clamped coordinate reads the border pixel; a padded
        # coordinate reads its replica), so this changes no output.
        hpad = (-prev_img.shape[0]) % 8
        wpad = (-prev_img.shape[1]) % 128
        if hpad or wpad:
            prev_img = jnp.pad(prev_img, ((0, hpad), (0, wpad)), mode="edge")
            cur_img = jnp.pad(cur_img, ((0, hpad), (0, wpad)), mode="edge")
    h, w = prev_img.shape
    n = p_lvl.shape[0]
    if valid is None:
        valid = jnp.ones((n,), jnp.float32)
    vf = valid.astype(jnp.float32)[:, None]
    pad = (-n) % feat_block
    if pad:
        p_lvl = jnp.pad(p_lvl, ((0, pad), (0, 0)))
        g0 = jnp.pad(g0, ((0, pad), (0, 0)))
        vf = jnp.pad(vf, ((0, pad), (0, 0)))
    np_ = p_lvl.shape[0]
    grid = (np_ // feat_block,)

    u = unroll if unroll is not None else _LK_UNROLL
    scratch_shapes = ()
    if v == "resident":
        kernel = _make_kernel_resident(h, w, win, iters, feat_block, eps,
                                       unroll=u)
    elif v == "fma":
        kernel = _make_kernel_fma(h, w, win, iters, feat_block, eps,
                                  unroll=u)
    elif v == "stack":
        kernel, (F_, SY_, SX_) = _make_kernel_stacked(
            h, w, win, iters, feat_block, eps, unroll=u
        )
        scratch_shapes = (pltpu.VMEM((F_, SY_, SX_), jnp.float32),)
    else:
        kernel = _make_kernel(h, w, win, iters, feat_block, eps, unroll=u)
    g, err = pl.pallas_call(
        kernel,
        grid=grid,
        scratch_shapes=scratch_shapes,
        in_specs=[
            pl.BlockSpec((np_, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((np_, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, 2), p_lvl.dtype),
            jax.ShapeDtypeStruct((np_, 1), p_lvl.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_lvl, g0, vf, prev_img, cur_img)
    return g[:n], err[:n, 0]


@functools.partial(
    jax.jit,
    static_argnames=("win", "levels", "iters", "eps", "interpret",
                     "variant", "feat_block", "unroll")
)
def klt_track_pallas(
    prev_gray: jax.Array,
    cur_gray: jax.Array,
    uv_prev: jax.Array,
    valid: jax.Array,
    win: int = 21,
    levels: int = 3,
    iters: int = 30,
    max_error: float = 20.0,
    eps: float = 0.0,
    interpret: bool = False,
    g0: jax.Array | None = None,
    variant: str | None = None,
    feat_block: int | None = None,
    unroll: int | None = None,
) -> KLTResult:
    """Drop-in replacement for `ops.klt.klt_track` backed by the Pallas
    level kernel (same pyramid, same update equations, same result
    contract; border-window clamping differs only for features whose
    patches leave the image — those fail the in-bounds/error gates).
    `g0` (level-0 pixels) warm-starts the flow like `klt_track`.

    ACTIVE-SLOT COMPACTION: slot ids are pool identities, so at steady
    state the live features are scattered across the pool and nearly every
    feat_block contains at least one — the all-inactive block early-exit
    never fires.  A rank permutation (sort-free cumsum) moves active slots
    to the front before the kernel and inverts after, making kernel time
    track the ACTIVE count, not the pool capacity (per-slot results are
    permutation-exact)."""
    if feat_block is None:
        feat_block = _LK_FEAT_BLOCK
    dtype = prev_gray.dtype
    pyr_prev = build_pyramid(prev_gray, levels)
    pyr_cur = build_pyramid(cur_gray, levels)
    n = uv_prev.shape[0]

    act = valid
    r_act = jnp.cumsum(act) - 1
    r_inact = jnp.sum(act) + jnp.cumsum(~act) - 1
    rank = jnp.where(act, r_act, r_inact).astype(jnp.int32)  # slot -> pos
    order = jnp.zeros((n,), jnp.int32).at[rank].set(
        jnp.arange(n, dtype=jnp.int32)
    )                                                        # pos -> slot
    uv_prev = uv_prev[order]
    valid = valid[order]
    if g0 is not None:
        g0 = g0[order]

    if g0 is None:
        g = jnp.zeros((n, 2), dtype)
    else:
        g = g0.astype(dtype) / (2.0 ** (levels - 1))
    err = jnp.zeros((n,), dtype)
    for lvl in range(levels - 1, -1, -1):
        scale = 2.0 ** lvl
        p_lvl = uv_prev / scale
        g, err = lk_level(
            pyr_prev[lvl], pyr_cur[lvl], p_lvl, g, valid, win=win,
            iters=iters, eps=eps, interpret=interpret, variant=variant,
            feat_block=feat_block, unroll=unroll,
        )
        if lvl > 0:
            g = g * 2.0

    uv_cur = uv_prev + g
    h, w = cur_gray.shape
    inb = (
        (uv_cur[:, 0] >= 0)
        & (uv_cur[:, 0] <= w - 1)
        & (uv_cur[:, 1] >= 0)
        & (uv_cur[:, 1] <= h - 1)
    )
    ok = valid & inb & (err < max_error) & jnp.all(
        jnp.isfinite(uv_cur), axis=-1
    )
    # invert the active-slot compaction: original slot i sits at rank[i]
    return KLTResult(uv=uv_cur[rank], ok=ok[rank], error=err[rank])
