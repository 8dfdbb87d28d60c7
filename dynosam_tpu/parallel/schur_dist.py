"""Distributed direct reduced (Schur) solver over the TPU mesh.

Round 1 only sharded the matrix-free PCG path; the PRODUCTION window solver
— exact landmark elimination + dense Cholesky (`backend/schur.py`) — ran on
one device.  This module distributes it over the `frames x tracks` mesh,
replacing the reference's single-threaded gtsam optimizer
(`src/backend/RGBDBackendModule.cc:201-234`) with a solver whose
per-iteration work scales with devices (SURVEY §2.31 / §5.7 keyframe-block
partitioning).

Two implementations:

  * **Explicit-collective path (default, WorldMotion)** — the whole LM loop
    runs inside ONE `shard_map` with hand-placed collectives: 7 per
    iteration (2 dp-ghost ppermutes, 1 error psum, 1 packed static-family
    psum reassembling the frame-sharded Hll/b_sp/Us partials, 1 SPIKE halo
    ppermute, 1 packed SPIKE all_gather, 1 packed psum of every contracted
    small quantity), independent of pool size.  See the section comment at
    `_optimize_schur_explicit` for the domain decomposition.
  * **Legacy GSPMD path** (`DYNO_DIST_GSPMD=1`, and WorldPose) — sharding
    annotations + the shard_map SPIKE chain solver, everything else left to
    GSPMD.  Measured ~97 GSPMD-inserted collectives per LM iteration on the
    8-device mesh (frame-axis band shifts on small tensors each lower to a
    permute/gather), which is what motivated the explicit path.

Shared core: the per-tracklet block-tridiagonal chain systems run along the
FRAME axis — a `lax.scan`, which XLA cannot partition over its scan axis.
`spike_chain_solve_local` substructures it by hand: each frame block
eliminates its interior with the local block-Thomas solve, the cross-block
coupling blocks are halo-exchanged with `lax.ppermute`, the per-block
boundary rows ("spikes") are `all_gather`ed over the frame axis (one packed
buffer), every device solves the small per-chain interface system
redundantly (6*B dims, B = frame shards), and interiors are corrected
locally.  Scan length drops from W to W/B + O(1); per-device flops drop by
~B.  The tracks axis needs no communication at all: chains are independent,
so the track dimension of every chain/spike tensor stays sharded
end-to-end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..backend import formulation as fm
from ..backend.map import MeasurementMap, slice_window
from ..backend.schur import chain_solve, lm_optimize_schur
from ..backend.solver import LMConfig, LMResult
from ..core.lie import SE3
from ..utils.config import BackendConfig
from .mesh import FRAME_AXIS, TRACK_AXIS, make_mesh, shard_map_data

_mm = functools.partial(jnp.matmul, precision="highest")


# --------------------------------------------------------------------------
# Frame-sharded SPIKE chain solve
# --------------------------------------------------------------------------


def spike_chain_solve_local(A, B, rhs, n_blocks, scalars=None, alpha=None):
    """Shard-LOCAL SPIKE solve of the (W, N) block-tridiagonal chains with
    the frame axis split into `n_blocks` — call INSIDE a `shard_map` whose
    mesh has `FRAME_AXIS` (the legacy GSPMD path wraps it via
    `make_spike_chain_solver`; the explicit LM path calls it directly).

    Local shapes: A, B (S, n, 3, 3) with B[0] the coupling to the LEFT
    block's last row; rhs (S, n, 3, M).  Exactly TWO collectives: one halo
    `ppermute` and one packed boundary `all_gather`.  Requires S >= 2.

    `scalars=(c_damped, T)` selects the cancellation-free ternary interior
    elimination (`backend.schur.chain_solve_ternary`; c must include the
    lambda damping): the interior system zeroes the cross coupling B[0], so
    its scalar diagonal keeps the TRUE alpha by folding T[0] into c[0].
    `alpha=` selects the generic scalar-diagonal interior solve
    (`chain_solve_scalar`, used for the Woodbury capacitance chain M; the
    diagonal is unaffected by zeroing B[0]).  `A` is ignored by both.
    """
    S = B.shape[0]
    b_idx = jax.lax.axis_index(FRAME_AXIS)

    # split the cross-block coupling out of the local system
    B0 = B[0]                                   # couples to left block
    B_int = B.at[0].set(jnp.zeros_like(B0))
    # halo: fetch the RIGHT neighbour's B0 (this block's right coupling);
    # the last block receives zeros (ppermute fills missing sources).  In
    # ternary-scalars mode the neighbour's coupling SCALAR T[0] rides the
    # same buffer: the local last row's TRUE diagonal includes it
    # (alpha = c + T + T_next), and chain_solve_ternary's internal T_next
    # truncates at the block edge — fold it into c[-1] instead.
    perm = [(i, i - 1) for i in range(1, n_blocks)]
    n0 = B0.shape[0]
    if scalars is not None:
        c_dmp, T_s = scalars
        buf = jnp.concatenate([B0.reshape(n0, 9), T_s[0][:, None]], axis=-1)
        buf = jax.lax.ppermute(buf, FRAME_AXIS, perm)
        B_next = buf[:, :9].reshape(n0, 3, 3)
        T_right = buf[:, 9]
    else:
        B_next = jax.lax.ppermute(B0, FRAME_AXIS, perm)

    # augment the RHS with the two spike columns:
    #   V-col: row 0 gets B0^T   (coupling to x_last of the left block)
    #   W-col: row S-1 gets B_next (coupling to x_first of the right)
    M = rhs.shape[-1]
    Bt0 = jnp.swapaxes(B0, -1, -2)
    v_col = jnp.zeros((S, *Bt0.shape), Bt0.dtype).at[0].set(Bt0)
    w_col = jnp.zeros_like(v_col).at[S - 1].set(B_next)
    rhs_aug = jnp.concatenate([rhs, v_col, w_col], axis=-1)

    if alpha is not None:
        Y = chain_solve_scalar(alpha, B_int, rhs_aug)
    elif scalars is not None:
        c_loc = c_dmp.at[0].add(T_s[0]).at[-1].add(T_right)
        T_loc = T_s.at[0].set(jnp.zeros_like(T_s[0]))
        Y = chain_solve_ternary(c_loc, T_loc, B_int, rhs_aug)
    else:
        Y = chain_solve(A, B_int, rhs_aug)      # (S, n, 3, M+6)

    # gather the boundary (first/last) rows of y and the spikes — ONE
    # packed all_gather (y, V, W ride the same column axis they already
    # share in Y)
    bnd = jnp.stack([Y[0], Y[S - 1]])           # (2, n, 3, M+6)
    bb = jax.lax.all_gather(bnd, FRAME_AXIS)    # (Bb, 2, n, 3, M+6)
    y, V, Wm = Y[..., :M], Y[..., M : M + 3], Y[..., M + 3 :]
    yb = bb[..., :M]                            # (Bb, 2, n, 3, M)
    Vb = bb[..., M : M + 3]                     # (Bb, 2, n, 3, 3)
    Wb = bb[..., M + 3 :]

    # ---- per-chain interface system over u = [f_0,l_0,...,f_{B-1},l_{B-1}]
    #   f_b + V0_b l_{b-1} + W0_b f_{b+1} = y0_b
    #   l_b + V1_b l_{b-1} + W1_b f_{b+1} = y1_b
    # This is 6x6-BLOCK TRIDIAGONAL (identity diagonal,
    # lower L_b = [0 V0_b; 0 V1_b], upper U_b = [W0_b 0; W1_b 0]): a
    # batched dense LU (`jnp.linalg.solve` on (n, 6B, 6B)) is a
    # serialized small-LAPACK kernel on TPU (CLAUDE.md rule), so solve
    # with an unrolled LANE-MAJOR block-Thomas over the B blocks —
    # every step is broadcast mul+reduce at full 128-lane occupancy.
    from ..ops.linalg import _mm_lanes, inv6_lanes

    n = B.shape[1]
    Bb = n_blocks
    dt = B.dtype
    z33 = jnp.zeros((3, 3, n), dt)

    def _l(b):                                  # (6, 6, n)
        v0 = jnp.transpose(Vb[b, 0], (1, 2, 0))
        v1 = jnp.transpose(Vb[b, 1], (1, 2, 0))
        return jnp.concatenate(
            [
                jnp.concatenate([z33, v0], axis=1),
                jnp.concatenate([z33, v1], axis=1),
            ],
            axis=0,
        )

    def _u(b):
        w0 = jnp.transpose(Wb[b, 0], (1, 2, 0))
        w1 = jnp.transpose(Wb[b, 1], (1, 2, 0))
        return jnp.concatenate(
            [
                jnp.concatenate([w0, z33], axis=1),
                jnp.concatenate([w1, z33], axis=1),
            ],
            axis=0,
        )

    def _y(b):                                  # (6, M, n)
        return jnp.concatenate(
            [
                jnp.transpose(yb[b, 0], (1, 2, 0)),
                jnp.transpose(yb[b, 1], (1, 2, 0)),
            ],
            axis=0,
        )

    eye6 = jnp.broadcast_to(jnp.eye(6, dtype=dt)[..., None], (6, 6, n))
    Dinvs, yps = [], []
    for b in range(Bb):
        if b == 0:
            Dp, yp = eye6, _y(0)
        else:
            G = _mm_lanes(_l(b), Dinvs[b - 1])
            Dp = eye6 - _mm_lanes(G, _u(b - 1))
            yp = _y(b) - _mm_lanes(G, yps[b - 1])
        Dinvs.append(inv6_lanes(Dp) if b > 0 else eye6)
        yps.append(yp)
    xs = [None] * Bb
    xs[Bb - 1] = _mm_lanes(Dinvs[Bb - 1], yps[Bb - 1])
    for b in range(Bb - 2, -1, -1):
        xs[b] = _mm_lanes(
            Dinvs[b], yps[b] - _mm_lanes(_u(b), xs[b + 1])
        )
    u = jnp.transpose(jnp.stack(xs), (3, 0, 1, 2))  # (n, Bb, 6, M)
    u = u.reshape(n, Bb, 2, 3, M)

    # neighbour boundary values for this block (clamped indices are
    # multiplied by zero spikes at the edges)
    x_last_prev = u[:, jnp.maximum(b_idx - 1, 0), 1]          # (n, 3, M)
    x_first_next = u[:, jnp.minimum(b_idx + 1, Bb - 1), 0]

    # local correction: x = y - V x_last_prev - W x_first_next
    x = (
        y
        - _mm(V, x_last_prev[None])
        - _mm(Wm, x_first_next[None])
    )
    return x


def make_spike_chain_solver(mesh):
    """Returns chain_solver(A, B, rhs) solving the (W, N) block-tridiagonal
    chain systems with W sharded over `frames` and N over `tracks` — the
    legacy GSPMD-path wrapper around `spike_chain_solve_local`.

    A (W, N, 3, 3) SPD diagonal blocks, B (W, N, 3, 3) with B[k] the
    (row k-1, col k) coupling (B[0] == 0), rhs (W, N, 3, M).  Requires the
    per-device frame block size W/B >= 2 (first/last boundary rows must be
    distinct).
    """
    n_blocks = mesh.shape[FRAME_AXIS]
    spec = P(FRAME_AXIS, TRACK_AXIS, None, None)
    sspec = P(FRAME_AXIS, TRACK_AXIS)

    def solver(A, B, rhs, scalars=None):
        if scalars is not None:
            return jax.shard_map(
                lambda a, b, r, c, t: spike_chain_solve_local(
                    a, b, r, n_blocks, scalars=(c, t)
                ),
                mesh=mesh,
                in_specs=(spec, spec, spec, sspec, sspec),
                out_specs=spec,
                check_vma=False,
            )(A, B, rhs, *scalars)
        return jax.shard_map(
            lambda a, b, r: spike_chain_solve_local(a, b, r, n_blocks),
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            check_vma=False,
        )(A, B, rhs)

    return solver


# --------------------------------------------------------------------------
# Distributed window optimization (direct Schur, both formulations)
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("window", "cfg", "lm_cfg", "updater", "mesh")
)
def _optimize_schur_sharded(
    m: MeasurementMap,
    window: int,
    cfg: BackendConfig,
    lm_cfg: LMConfig,
    updater: int,
    mesh,
):
    if not _DIST_GSPMD:
        return _optimize_schur_explicit(m, window, cfg, lm_cfg, mesh, updater)
    w = slice_window(m, 0, window)
    masks = fm.build_masks(w, cfg)
    if updater == 0:
        values = fm.init_values(w, masks, cfg)
    else:
        values = fm.init_values_world_pose(w, masks, cfg)
    solver = make_spike_chain_solver(mesh)
    return lm_optimize_schur(
        values, w, masks, cfg, lm_cfg, w.X_init[0],
        formulation=updater, chain_solver=solver,
    )


def distributed_schur_optimize(
    m: MeasurementMap,
    window: int,
    cfg: BackendConfig,
    mesh=None,
    updater: int = 0,
    lm_cfg: LMConfig | None = None,
) -> LMResult:
    """Shard the measurement map over the mesh and run the direct reduced
    LM solve with the frame-partitioned SPIKE chain elimination.

    `window` must be divisible by the mesh's frame axis with blocks >= 2.
    Single-chip callers can pass a 1-device mesh; the program is identical.
    """
    mesh = mesh or make_mesh()
    nb = mesh.shape[FRAME_AXIS]
    if window % nb != 0 or window // nb < 2:
        raise ValueError(
            f"window {window} must split into >=2-frame blocks over the "
            f"{nb}-way frame axis"
        )
    lm_cfg = lm_cfg or LMConfig(max_iterations=cfg.lm_max_iterations)
    # "compute" layout: every input arrives in the sharding the explicit
    # shard_map consumes (static grids track-sharded/frame-replicated) —
    # the frame-fed layout made GSPMD fully rematerialize the static grids
    # per dispatch (MULTICHIP r4 warning)
    m_sharded = shard_map_data(m, mesh, layout="compute")
    return _optimize_schur_sharded(m_sharded, window, cfg, lm_cfg, updater, mesh)


# --------------------------------------------------------------------------
# Explicit-collective distributed LM (WorldMotion) — default dist path
# --------------------------------------------------------------------------
#
# The legacy path above annotates shardings and lets GSPMD insert the
# collectives.  Measured on the 8-virtual-device mesh, that compiles to ~97
# collective instructions PER LM ITERATION inside the while body (every
# frame-axis band shift / scatter-add on the small (W, O, 6, 6)-class
# tensors lowers to its own permute/gather), which makes multi-host scaling
# latency-bound regardless of byte volume (VERDICT r3 weak #5;
# `scripts/collective_census.py`).  This path runs the WHOLE LM loop inside
# ONE `shard_map` with hand-placed collectives:
#
#   per iteration (F frame blocks x T track blocks):
#     2x ppermute      dp boundary-row ghosts (the ternary motion factor is
#                      the only LARGE family coupling consecutive frames)
#     1x psum          total_error scalar
#     1x ppermute +
#     1x all_gather    SPIKE chain-elimination boundaries (packed: y/V/W
#                      spikes ride one gathered buffer)
#     1x psum          ONE packed flat vector carrying EVERY track/frame-
#                      contracted small quantity: the normal-system partials
#                      (Dcam, g_pts, ternary Dmm/g_mot) AND the Schur
#                      corrections (d_cc, d_bc, d_cm, d_mm, d_bm)
#   = 6 collectives per iteration (4 when F == 1), independent of pool size.
#
# Domain decomposition:
#   * X, H (poses/motions) and every pose-family quantity are REPLICATED —
#     tiny, and recomputing them redundantly deletes all small-tensor comm.
#   * dynamic grids shard (frames x tracks); each block owns ternary factor
#     slot s <-> global current frame fi*S+s (slot 0 needs the LEFT
#     neighbour's last dp row; the boundary factor owned by the right
#     neighbour is recomputed locally from the RIGHT ghost row instead of
#     halo-adding its contributions back).
#   * the static family is FRAME-SHARDED like the dynamic one: residuals,
#     Jacobians and elimination blocks are built for the local S frames
#     only (the earlier frame-REPLICATED build was the dominant N=4 total-
#     work blowup, W(4)/W(1) ~ 1.6-1.75 in scripts/scaling_1proc.py).  The
#     cross-frame reductions (landmark Hessian Hll, rhs b_sp, and the
#     per-frame coupling rows Us) are reassembled by ONE packed psum in
#     step_fn (~1.2 MB at W=16/512-cap); the per-lambda camera couplings
#     d_cc_s/d_bc_s are computed on local rows and ride the final psum.
#   * the object one-hot table is mask-derived (constant across LM
#     iterations) and gathered ONCE in the prologue — no per-iteration mask
#     communication at all.
#
# The LM schedule itself (accept/reject, lambda, NaN ratchet, system cache)
# is byte-identical to the single-chip solver: `lm_optimize_schur` runs
# inside the shard_map with residual/build/step overrides.  The system
# cached across rejected steps stores PRE-psum partials, so the psum can sit
# OUTSIDE the rebuild `cond` (collectives under a divergent conditional are
# illegal SPMD; the pre-reduction partials make the unconditional psum
# idempotent across cache hits).

from types import SimpleNamespace

from ..backend.schur import (
    _damp_blocks,
    _floor_consts,
    _inv3,
    _odo_anchor_blocks,
    _pose_direct_blocks,
    _pose_point_jacobians,
    _pose_sigmas,
    _smoothing_blocks,
    _static_blocks,
    _ternary_jacobians,
    assemble_reduced,
    chain_solve_scalar,
    chain_solve_ternary,
)
from ..backend.formulation import (world_motion_families,
                                   world_pose_families)
from ..backend.solver import robust_loss
from ..core.lie import se3_compose, se3_inverse, so3_hat
from ..ops import factors

import os as _os

_DIST_GSPMD = _os.environ.get("DYNO_DIST_GSPMD", "0") == "1"

_es = functools.partial(jnp.einsum, precision="highest")


def _pack_psum(tree: dict, axes):
    """psum a pytree of same-dtype arrays as ONE flat vector (one collective
    instead of one per leaf)."""
    leaves, treedef = jax.tree.flatten(tree)
    flat = jnp.concatenate([l.reshape(-1) for l in leaves])
    flat = jax.lax.psum(flat, axes)
    out, off = [], 0
    for l in leaves:
        out.append(flat[off : off + l.size].reshape(l.shape))
        off += l.size
    return jax.tree.unflatten(treedef, out)


def _embed_rows(part, n_rows: int, start):
    """Place local frame-block rows at their global positions (zeros
    elsewhere) so a cross-device psum assembles the full array."""
    z = jnp.zeros((n_rows, *part.shape[1:]), part.dtype)
    return jax.lax.dynamic_update_slice_in_dim(z, part, start, 0)


def _embed_rows_shiftm1(part, n_rows: int, start):
    """Embed at rows start-1.. (the correction term computed at factor row
    k that belongs to the PREVIOUS frame's camera row).  Row -1 (block 0's
    slot 0) is dropped — it is the structurally-masked s=0 slot."""
    z = jnp.zeros((n_rows + 1, *part.shape[1:]), part.dtype)
    return jax.lax.dynamic_update_slice_in_dim(z, part, start, 0)[1:]


def _optimize_schur_explicit(
    m: MeasurementMap,
    window: int,
    cfg: BackendConfig,
    lm_cfg: LMConfig,
    mesh,
    updater: int = 0,
) -> LMResult:
    """Window solve with hand-placed collectives (see the section
    comment), both formulations (updater 0 = WorldMotion, 1 = WorldPose —
    the same STABLE square-root elimination with the pose factor's band
    orientation, mirroring `schur_step`'s formulation branches).
    Equivalent to the single-chip `lm_optimize_schur` (f64 cross-checks in
    tests/f64_check.py)."""
    FA, TA = FRAME_AXIS, TRACK_AXIS
    F = mesh.shape[FA]
    T = mesh.shape[TA]
    w = slice_window(m, 0, window)
    masks = fm.build_masks(w, cfg)
    if updater == 0:
        values = fm.init_values(w, masks, cfg)
        pose_key = "H"
    else:
        values = fm.init_values_world_pose(w, masks, cfg)
        pose_key = "L"

    W_ = window
    NS = w.static_xyz.shape[1]
    ND = w.dyn_xyz.shape[1]
    O = w.motion_init.batch_shape[1]
    if W_ % F != 0 or W_ // F < 2:
        raise ValueError(f"window {W_} must split into >=2-frame blocks / {F}")
    if NS % T or ND % T:
        raise ValueError(f"track pools ({NS}, {ND}) must divide {T}")
    S = W_ // F
    dtype = values["sp"].dtype

    def cons(x, *spec):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec))
        )

    def cons_se3(x: SE3) -> SE3:
        return SE3(cons(x.R), cons(x.t))

    args = dict(
        vals={
            "X": cons_se3(values["X"]),
            pose_key: cons_se3(values[pose_key]),
            "sp": cons(values["sp"], TA, None),
            "dp": cons(values["dp"], FA, TA, None),
        },
        static_xyz=cons(w.static_xyz, None, TA, None),
        static_obs=cons(masks.static_obs, None, TA),
        dyn_xyz=cons(w.dyn_xyz, FA, TA, None),
        dyn_obj=cons(w.dyn_obj, FA, TA),
        dyn_obs=cons(masks.dyn_obs, FA, TA),
        ternary=cons(masks.ternary, FA, TA),
        X_init=cons_se3(w.X_init),
        odometry=cons(masks.odometry),
        smoothing=cons(masks.smoothing),
        frame=cons(masks.frame),
        anchor=cons_se3(w.X_init[0]),
        motion_init=cons_se3(w.motion_init),
        motion_valid=cons(w.motion_valid),
    )
    in_specs = dict(
        vals={
            "X": SE3(P(), P()),
            pose_key: SE3(P(), P()),
            "sp": P(TA, None),
            "dp": P(FA, TA, None),
        },
        static_xyz=P(None, TA, None),
        static_obs=P(None, TA),
        dyn_xyz=P(FA, TA, None),
        dyn_obj=P(FA, TA),
        dyn_obs=P(FA, TA),
        ternary=P(FA, TA),
        X_init=SE3(P(), P()),
        odometry=P(),
        smoothing=P(),
        frame=P(),
        anchor=SE3(P(), P()),
        motion_init=SE3(P(), P()),
        motion_valid=P(),
    )
    out_specs = LMResult(
        values={
            "X": SE3(P(), P()),
            pose_key: SE3(P(), P()),
            "sp": P(TA, None),
            "dp": P(FA, TA, None),
        },
        error=P(),
        initial_error=P(),
        iterations=P(),
        lam=P(),
        converged=P(),
    )

    spec = (world_motion_families(cfg) if updater == 0
            else world_pose_families(cfg))
    sig_s = cfg.static_point_noise_sigma
    sig_d = cfg.dynamic_point_noise_sigma
    sig_t = cfg.motion_ternary_factor_noise_sigma
    nc = 6 * W_

    def run(vals, static_xyz, static_obs, dyn_xyz, dyn_obj, dyn_obs,
            ternary, X_init, odometry, smoothing, frame, anchor,
            motion_init, motion_valid):
        fi = jax.lax.axis_index(FA)
        start = fi * S
        pose_sigma, smooth_sigma = _pose_sigmas(cfg, dtype)
        w_proxy = SimpleNamespace(X_init=X_init)
        m_proxy = SimpleNamespace(odometry=odometry, frame=frame)
        nd_ = dyn_obj.shape[1]

        # ---- prologue (one-off): object one-hot table + ghosts ----------
        if F > 1:
            tern_r = jax.lax.ppermute(
                ternary[0], FA, [(i, i - 1) for i in range(1, F)]
            )
        else:
            tern_r = jnp.zeros_like(ternary[0])
        tern_next = jnp.concatenate([ternary[1:], tern_r[None]], axis=0)
        active = ternary | tern_next
        oh_loc = jax.nn.one_hot(
            jnp.where(active, dyn_obj, -1), O, dtype=dtype
        )                                               # (S, nd, O)
        if F > 1:
            onehot_full = jax.lax.all_gather(oh_loc, FA, axis=0, tiled=True)
        else:
            onehot_full = oh_loc                         # (W, nd, O)
        act_full_T = jnp.transpose(jnp.sum(onehot_full, -1))   # (nd, W)
        # padded on BOTH sides: row -1 (pose formulation's prev-frame
        # selection at the block edge) and row W (ghost slot)
        ohp = jnp.concatenate(
            [jnp.zeros_like(onehot_full[:1]), onehot_full,
             jnp.zeros_like(onehot_full[:1])], axis=0
        )
        oh_ext = jax.lax.dynamic_slice_in_dim(ohp, start + 1, S + 1, 0)
        oh_next = jax.lax.dynamic_slice_in_dim(ohp, start + 2, S, 0)
        tern_ext = jnp.concatenate([ternary, tern_r[None]], axis=0)

        eyeO = jnp.eye(3, dtype=dtype)
        Hp_pad_R = jnp.broadcast_to(eyeO, (1, O, 3, 3))
        rows_gl = start + jnp.arange(S)
        eye_rows = (
            jnp.arange(W_)[None, :] == rows_gl[:, None]
        ).astype(dtype)                                  # (S, W)
        static_obs_loc = jax.lax.dynamic_slice_in_dim(
            static_obs, start, S, 0
        )                                                # (S, ns) local rows

        def _x_loc(X: SE3) -> SE3:
            return SE3(
                jax.lax.dynamic_slice_in_dim(X.R, start, S, 0),
                jax.lax.dynamic_slice_in_dim(X.t, start, S, 0),
            )

        def _select_rows(Pp: SE3, row0, n: int) -> SE3:
            """Object-selected pose per (row, track) for n global frame
            rows starting at `row0` (identity where no object is active;
            rows -1/W read the zero padding and fix to identity).  `Pp` is
            the replicated pose table padded with one identity row on each
            side, aligned with `ohp`."""
            P_ext = SE3(
                jax.lax.dynamic_slice_in_dim(Pp.R, row0 + 1, n, 0),
                jax.lax.dynamic_slice_in_dim(Pp.t, row0 + 1, n, 0),
            )
            oh_rows = jax.lax.dynamic_slice_in_dim(ohp, row0 + 1, n, 0)
            Rk = _es("sno,soij->snij", oh_rows, P_ext.R)
            tk = _es("sno,soj->snj", oh_rows, P_ext.t)
            sel = jnp.any(oh_rows > 0, axis=-1)[..., None, None]
            return SE3(jnp.where(sel, Rk, eyeO), tk)

        def _pad_pose(H: SE3) -> SE3:
            return SE3(
                jnp.concatenate([Hp_pad_R, H.R, Hp_pad_R], axis=0),
                jnp.concatenate(
                    [jnp.zeros((1, O, 3), dtype), H.t,
                     jnp.zeros((1, O, 3), dtype)], axis=0,
                ),
            )

        def _select_H_ext(H: SE3) -> SE3:
            # current-frame rows start..start+S (motion selection)
            return _select_rows(_pad_pose(H), start, S + 1)

        def _dp_ext(dp, dp_l, dp_r):
            dp_prev = jnp.concatenate([dp_l[None], dp], axis=0)
            dp_cur = jnp.concatenate([dp, dp_r[None]], axis=0)
            return dp_prev, dp_cur

        # ---- residuals (2 ppermutes; ghosts ride the res list) ----------
        def residual_fn(v):
            X, Hm, sp, dp = v["X"], v[pose_key], v["sp"], v["dp"]
            r_anchor = factors.prior_residual(X[0], anchor)[None, :] / (
                cfg.initial_pose_prior_sigma
            )
            odo_meas = jax.vmap(lambda a, b: se3_compose(se3_inverse(a), b))(
                X_init[:-1], X_init[1:]
            )
            r_odo = factors.between_residual(X[:-1], X[1:], odo_meas) / (
                pose_sigma
            )
            r_odo = jnp.where(odometry[1:, None], r_odo, 0.0)

            # static family is FRAME-SHARDED: residuals only for the local
            # S frames (the frame-REPLICATED static build was the dominant
            # N=4 work blowup measured by scripts/scaling_1proc.py,
            # W(4)/W(1) ~ 1.6-1.75); the cross-frame reductions are
            # reassembled with one small packed psum + one Us all_gather
            # per linearization in build_fn
            X_loc = _x_loc(X)
            static_xyz_loc = jax.lax.dynamic_slice_in_dim(
                static_xyz, start, S, 0
            )
            r_static = jax.vmap(
                lambda Xk, zk: factors.pose_to_point_residual(Xk, sp, zk)
            )(X_loc, static_xyz_loc) / sig_s
            r_static = jnp.where(static_obs_loc[..., None], r_static, 0.0)

            r_dyn = jax.vmap(
                lambda Xk, mk, zk: factors.pose_to_point_residual(Xk, mk, zk)
            )(X_loc, dp, dyn_xyz) / sig_d
            r_dyn = jnp.where(dyn_obs[..., None], r_dyn, 0.0)

            if F > 1:
                dp_l = jax.lax.ppermute(
                    dp[-1], FA, [(i, i + 1) for i in range(F - 1)]
                )
                dp_r = jax.lax.ppermute(
                    dp[0], FA, [(i, i - 1) for i in range(1, F)]
                )
            else:
                dp_l = jnp.zeros_like(dp[0])
                dp_r = jnp.zeros_like(dp[0])
            dp_prev, dp_cur = _dp_ext(dp, dp_l, dp_r)
            if updater == 0:
                r_stiff = factors.landmark_motion_ternary_residual(
                    dp_prev, dp_cur, _select_H_ext(Hm)
                ) / sig_t
                r_smooth = factors.motion_smoothing_residual(
                    SE3(Hm.R[:-1], Hm.t[:-1]), SE3(Hm.R[1:], Hm.t[1:])
                ) / smooth_sigma
                r_smooth = jnp.where(
                    smoothing[1:, ..., None], r_smooth, 0.0
                )
                pose_fams = [r_smooth]
            else:
                Lp = _pad_pose(Hm)
                r_stiff = factors.landmark_motion_pose_residual(
                    dp_prev, dp_cur,
                    _select_rows(Lp, start - 1, S + 1),
                    _select_rows(Lp, start, S + 1),
                ) / sig_t
                r_ps = factors.landmark_pose_smoothing_residual(
                    SE3(Hm.R[:-2], Hm.t[:-2]),
                    SE3(Hm.R[1:-1], Hm.t[1:-1]),
                    SE3(Hm.R[2:], Hm.t[2:]),
                ) / smooth_sigma
                triple = smoothing[1:-1] & smoothing[2:]
                pose_fams = [jnp.where(triple[..., None], r_ps, 0.0)]
                if cfg.use_object_kinematic_factor:
                    r_kin = factors.object_kinematic_residual(
                        SE3(motion_init.R[1:], motion_init.t[1:]),
                        SE3(Hm.R[:-1], Hm.t[:-1]),
                        SE3(Hm.R[1:], Hm.t[1:]),
                    ) / cfg.object_kinematic_sigma
                    kin_mask = smoothing[1:] & motion_valid[1:]
                    pose_fams.append(
                        jnp.where(kin_mask[..., None], r_kin, 0.0)
                    )
            r_stiff = jnp.where(tern_ext[..., None], r_stiff, 0.0)
            # dp ghosts ride along (ignored by the spec zip) so the build
            # reuses them without re-permuting
            return [r_anchor, r_odo, r_static, r_dyn, r_stiff, *pose_fams,
                    dp_l, dp_r]

        n_fam = len(spec.robust)

        def error_fn(res):
            loc = (
                jnp.sum(robust_loss(res[3], spec.robust[3]))
                + jnp.sum(robust_loss(res[4][:S], spec.robust[4]))
                + jnp.sum(robust_loss(res[2], spec.robust[2]))
            )
            tot = jax.lax.psum(loc, (FA, TA))
            repl = (
                jnp.sum(robust_loss(res[0], spec.robust[0]))
                + jnp.sum(robust_loss(res[1], spec.robust[1]))
                + sum(
                    jnp.sum(robust_loss(res[i], spec.robust[i]))
                    for i in range(5, n_fam)
                )
            )
            return tot + repl

        # ---- build: all partials LOCAL (psum deferred to the step) ------
        # STABLE (Woodbury) scheme, mirroring schur_step's stable branch:
        # the ternary information is carried in square-root form (s, R, G,
        # phi ~ 1e5 scale) and the 1e10-scale normal blocks are never
        # formed — see backend/schur.py for the derivation and the NaN-
        # reject pathology it removes.  Slot s <-> global factor with
        # current frame start+s; the ghost slot S (owned by the right
        # neighbour) supplies s/R for boundary quantities.
        mi_proxy = SimpleNamespace(
            motion_init=motion_init, motion_valid=motion_valid
        )
        sm_proxy = SimpleNamespace(smoothing=smoothing)

        def build_fn(v, sqrt_w, res0):
            X, Hm, sp, dp = v["X"], v[pose_key], v["sp"], v["dp"]
            r_anchor, r_odo, r_static, r_dyn, r_stiff = res0[:5]
            dp_l, dp_r = res0[-2], res0[-1]
            wgt_static = sqrt_w[2] ** 2 * static_obs_loc.astype(dtype)
            wgt_dyn = sqrt_w[3] ** 2 * dyn_obs.astype(dtype)
            sqw_t = sqrt_w[4] * tern_ext.astype(dtype)     # (S+1, nd)
            wt = sqw_t**2

            Hcc0, g_cam0 = _odo_anchor_blocks(
                X, w_proxy, m_proxy, cfg, anchor, r_anchor, r_odo, dtype
            )
            _, dp_cur = _dp_ext(dp, dp_l, dp_r)
            if updater == 0:
                wgt_smooth = smoothing[1:].astype(dtype)
                Dmm_sm, Omm1, g_mot_sm = _smoothing_blocks(
                    Hm, wgt_smooth, res0[5], smooth_sigma, dtype
                )
                Omm2 = jnp.zeros((max(W_ - 2, 0), O, 6, 6), dtype)
                Hk_ext = _select_H_ext(Hm)
                _, _, y_ext = _ternary_jacobians(Hk_ext, dp_cur, sig_t)
                eyeG = jnp.broadcast_to(
                    jnp.eye(3, dtype=dtype), (*y_ext.shape, 3)
                )
                G_ext = jnp.concatenate(
                    [-so3_hat(y_ext), eyeG], axis=-1
                )
                st_R = Hk_ext.R
            else:
                triple = (smoothing[1:-1] & smoothing[2:]).astype(dtype)
                r_kin = (res0[6] if cfg.use_object_kinematic_factor
                         else None)
                Dmm_sm, Omm1, Omm2, g_mot_sm = _pose_direct_blocks(
                    Hm, mi_proxy, sm_proxy, cfg, triple, res0[5], r_kin,
                    smooth_sigma, dtype,
                )
                Lp = _pad_pose(Hm)
                dp_prev, _ = _dp_ext(dp, dp_l, dp_r)
                Lpv = _select_rows(Lp, start - 1, S + 1)
                Lcv = _select_rows(Lp, start, S + 1)
                # rel = L_cur L_prev^-1;  q = L_prev^-1 m_prev
                st_R = _mm(Lcv.R, jnp.swapaxes(Lpv.R, -1, -2))
                q = _es(
                    "snab,snb->sna",
                    jnp.swapaxes(Lpv.R, -1, -2), dp_prev - Lpv.t,
                )
                G_ext = jnp.concatenate(
                    [-_mm(Lcv.R, so3_hat(q)), Lcv.R], axis=-1
                )

            X_loc = _x_loc(X)
            Jx_s, Jp_s, _ = _pose_point_jacobians(
                X_loc, jnp.broadcast_to(sp[None], (S, *sp.shape)), sig_s
            )
            Jx_d, Jp_d, _ = _pose_point_jacobians(X_loc, dp, sig_d)

            # square-root stiff-factor pieces (ext slots 0..S)
            s_ext = sqw_t / sig_t                          # (S+1, nd)
            phi_ext = sqw_t[..., None] * r_stiff           # (S+1, nd, 3)

            # psum partials (static family frame-sharded like dyn: local
            # rows embedded at `start`, the cross-device psum assembles)
            Dcam = _embed_rows(
                _es("kn,knra,knrb->kab", wgt_dyn, Jx_d, Jx_d)
                + _es("kn,knra,knrb->kab", wgt_static, Jx_s, Jx_s),
                W_, start,
            )
            g_pts = _embed_rows(
                _es("kn,knra,knr->ka", wgt_dyn, Jx_d, r_dyn)
                + _es("kn,knra,knr->ka", wgt_static, Jx_s, r_static),
                W_, start,
            )
            # stiff-factor diagonal of the full Dmm (damping only — the
            # matrix itself arrives additively via the Woodbury correction)
            Gsq = jnp.sum(G_ext[:S] ** 2, axis=2)          # (S, nd, 6)
            T_loc = wt[:S] / sig_t**2
            dd_t = _es("kd,kdo,kda->koa", T_loc, oh_ext[:S], Gsq)
            if updater == 0:
                ddiag_t = _embed_rows(dd_t, W_, start)
            else:
                # B~ touches L_{k-1} AND L_k
                ddiag_t = (
                    _embed_rows_shiftm1(dd_t, W_, start)
                    + _embed_rows(dd_t, W_, start)
                )

            # static elimination blocks from the LOCAL frames only.  The
            # cached system stores the PRE-psum partials (build runs under
            # the rebuild cond — no collectives here); step_fn reassembles
            # them with one packed psum per trial.
            Hll_s, Us, b_sp = _static_blocks(
                wgt_static, Jx_s, Jp_s, r_static, dtype
            )
            ch_c = wgt_dyn / sig_d**2 + _floor_consts(dtype)[1]
            Rc = _es("kd,kra,kdrb->kdab", wgt_dyn, Jp_d, Jx_d)
            g_dp_obs = _es("kd,kra,kdr->kda", wgt_dyn, Jp_d, r_dyn)

            return {
                "part": {
                    "Dcam": Dcam, "g_pts": g_pts, "ddiag_t": ddiag_t,
                },
                "loc": {
                    "Hll_s": Hll_s, "Us": Us, "b_sp": b_sp,
                    "ch_c": ch_c,
                    "ch_T": T_loc, "ch_Tn": wt[1:] / sig_t**2,
                    "Rc": Rc, "b_dp": -g_dp_obs,
                    "st_s": s_ext, "st_R": st_R,
                    "st_G": G_ext, "st_phi": phi_ext,
                },
                "repl": {
                    "Hcc0": Hcc0, "g_cam0": g_cam0, "Dmm_sm": Dmm_sm,
                    "Omm1": Omm1, "Omm2": Omm2, "g_mot_sm": g_mot_sm,
                },
            }

        # ---- step: Woodbury elimination + ONE packed psum ----------------
        def step_fn(sys, lam):
            loc, repl = sys["loc"], sys["repl"]
            floor = lm_cfg.diag_floor
            alpha_z = loc["ch_c"] + loc["ch_T"] + loc["ch_Tn"]
            c_lam = loc["ch_c"] + lam * jnp.maximum(alpha_z, floor)
            inv_c = 1.0 / c_lam

            # static family: the cached system carries PRE-psum local
            # partials (frame-sharded build); ONE packed psum assembles
            # the landmark Hessian/rhs frame-sums and the per-frame Us
            # rows (embedded at this device's rows).  Idempotent across
            # the rebuild cache, legal SPMD (unconditional).
            Us_loc = loc["Us"]                             # (S, ns, 6, 3)
            ns_ = Us_loc.shape[1]
            if F > 1:
                reds = _pack_psum(
                    {
                        "Hll": loc["Hll_s"],
                        "b_sp": loc["b_sp"],
                        "Us": _embed_rows(Us_loc, W_, start),
                    },
                    (FA,),
                )
                # _static_blocks adds its tiny*I floor once per device;
                # keep exactly one copy after the frame-sum
                tiny_s = _floor_consts(dtype)[1]
                Hll_full = reds["Hll"] - (F - 1) * tiny_s * jnp.eye(
                    3, dtype=dtype
                )
                b_sp_full = reds["b_sp"]
                Us = reds["Us"]                            # (W, ns, 6, 3)
            else:
                Hll_full, b_sp_full, Us = (
                    loc["Hll_s"], loc["b_sp"], Us_loc,
                )
            Hll_s = _damp_blocks(Hll_full, lam, floor)
            Us_t = jnp.swapaxes(Us, -1, -2)
            Us_cols = jnp.transpose(Us_t, (1, 2, 0, 3)).reshape(ns_, 3, nc)
            rhs_s = jnp.concatenate([Us_cols, b_sp_full[..., None]], -1)
            Ys = _mm(_inv3(Hll_s), rhs_s)
            Yc_s, yb_s = Ys[..., :nc], Ys[..., nc]
            # camera-camera/rhs couplings: only the LOCAL frame rows (the
            # full-W reduction was per-lambda replicated work; rows embed
            # at `start` and ride the final packed psum)
            d_cc_s = _es("knam,nmq->kaq", Us_loc, Yc_s)    # (S, 6, nc)
            d_bc_s = _es("knam,nm->ka", Us_loc, yb_s)      # (S, 6)

            s_ext = loc["st_s"]
            s_loc = s_ext[:S]
            Rt_ext = jnp.swapaxes(loc["st_R"], -1, -2)
            Rt_loc = Rt_ext[:S]
            RcC = loc["Rc"] * inv_c[..., None, None]       # (S, nd, 3, 6)
            bzoC = loc["b_dp"] * inv_c[..., None]

            # per-lambda LEFT ghosts: the boundary factor's prev-frame
            # quantities live on the left neighbour (ONE packed ppermute)
            nd_l = s_ext.shape[1]
            if F > 1:
                gbuf = jnp.concatenate(
                    [
                        RcC[-1].reshape(nd_l, 18),
                        bzoC[-1],
                        inv_c[-1][:, None],
                        s_ext[S - 1][:, None],
                        Rt_ext[S - 1].reshape(nd_l, 9),
                    ],
                    axis=-1,
                )                                           # (nd, 31)
                gbuf = jax.lax.ppermute(
                    gbuf, FA, [(i, i + 1) for i in range(F - 1)]
                )
                RcC_l = gbuf[:, :18].reshape(nd_l, 3, 6)
                bzoC_l = gbuf[:, 18:21]
                inv_c_l = gbuf[:, 21]
                s_l = gbuf[:, 22]
                Rt_l = gbuf[:, 23:32].reshape(nd_l, 3, 3)
            else:
                RcC_l = jnp.zeros_like(RcC[0])
                bzoC_l = jnp.zeros_like(bzoC[0])
                inv_c_l = jnp.zeros_like(inv_c[0])
                s_l = jnp.zeros_like(s_ext[0])
                Rt_l = jnp.broadcast_to(
                    jnp.eye(3, dtype=dtype), Rt_ext[0].shape
                )
            inv_c_prev = jnp.concatenate([inv_c_l[None], inv_c[:-1]], 0)
            RcC_prev = jnp.concatenate([RcC_l[None], RcC[:-1]], 0)
            bzoC_prev = jnp.concatenate([bzoC_l[None], bzoC[:-1]], 0)
            s_prev = jnp.concatenate([s_l[None], s_loc[:-1]], 0)
            R_prevT = jnp.concatenate([Rt_l[None], Rt_loc[:-1]], 0)

            # capacitance chain M (see schur_step stable branch; the pose
            # formulation carries the rotation on the PREV side, so M's
            # off-diagonal uses the CURRENT row's rel_R and B~ couples the
            # +/- bands at h-columns k-1/k)
            alpha_M = 1.0 + s_loc * s_loc * (inv_c_prev + inv_c)
            Bcol = s_loc[..., None, None] * loc["st_G"][:S]
            dn_rows = (
                jnp.arange(W_)[None, :] == (rows_gl - 1)[:, None]
            ).astype(dtype)
            if updater == 0:
                B_M = (
                    -(s_prev * s_loc * inv_c_prev)[..., None, None]
                    * R_prevT
                )
                AU_prev = s_loc[..., None, None] * RcC_prev  # col rows_gl-1
                AU_cur = -s_loc[..., None, None] * _mm(Rt_loc, RcC)
                phi_hat = s_loc[..., None] * (
                    bzoC_prev - _es("kdab,kdb->kda", Rt_loc, bzoC)
                ) + loc["st_phi"][:S]
                Bcol_nc = (
                    Bcol[:, :, :, None, :]
                    * eye_rows[:, None, None, :, None]
                ).reshape(S, nd_, 3, nc)
            else:
                R_loc = loc["st_R"][:S]
                B_M = (
                    -(s_prev * s_loc * inv_c_prev)[..., None, None]
                    * Rt_loc
                )
                AU_prev = -s_loc[..., None, None] * _mm(R_loc, RcC_prev)
                AU_cur = s_loc[..., None, None] * RcC
                phi_hat = s_loc[..., None] * (
                    bzoC - _es("kdab,kdb->kda", R_loc, bzoC_prev)
                ) + loc["st_phi"][:S]
                Bcol_nc = (
                    Bcol[:, :, :, None, :]
                    * dn_rows[:, None, None, :, None]
                    - Bcol[:, :, :, None, :]
                    * eye_rows[:, None, None, :, None]
                ).reshape(S, nd_, 3, nc)
            AU_nc = (
                AU_prev[:, :, :, None, :] * dn_rows[:, None, None, :, None]
                + AU_cur[:, :, :, None, :] * eye_rows[:, None, None, :, None]
            ).reshape(S, nd_, 3, nc)
            rhs_M = jnp.concatenate(
                [AU_nc, Bcol_nc, phi_hat[..., None]], axis=-1
            )
            if F > 1:
                Z = spike_chain_solve_local(
                    None, B_M, rhs_M, F, alpha=alpha_M
                )
            else:
                Z = chain_solve_scalar(alpha_M, B_M, rhs_M)
            Z_U = Z[..., :nc]
            Nh = Z[..., nc : 2 * nc].reshape(S, nd_, 3, W_, 6)
            Z_phi = Z[..., -1]

            dcc_diag = _es("kdia,kd,kdib->kab", loc["Rc"], inv_c, loc["Rc"])
            d_cc1 = _embed_rows(
                (
                    dcc_diag[:, :, None, :]
                    * eye_rows[:, None, :, None]
                ).reshape(S, 6, nc),
                W_, start,
            ).reshape(nc, nc)
            d_cc2 = jax.lax.dot_general(
                AU_nc, Z_U,
                (((0, 1, 2), (0, 1, 2)), ((), ())), precision="highest",
            )
            d_bc1 = _embed_rows(
                _es("kdia,kdi->ka", loc["Rc"], bzoC), W_, start
            ).reshape(nc)
            d_bc2 = _es("kdic,kdi->c", AU_nc, Z_phi)

            Nh_act = Nh * act_full_T[None, :, None, :, None]
            Rdot = Nh_act.reshape(S, nd_ * 3, nc)
            oh_row0 = oh_ext[:S]

            def _couple_dot(Brow, oh_row):
                oh_i = jnp.repeat(oh_row, 3, axis=1)
                L = jnp.tile(Brow.reshape(S, nd_ * 3, 6), (1, 1, O)) * (
                    jnp.repeat(oh_i, 6, axis=2)
                )
                out = jax.lax.dot_general(
                    L, Rdot, (((1,), (1,)), ((0,), (0,))),
                    precision="highest",
                )
                return out.reshape(S, O, 6, W_, 6)

            C_hh = _couple_dot(Bcol, oh_row0)
            cm_cur = _couple_dot(AU_cur, oh_row0)
            cm_prev = _couple_dot(AU_prev, oh_row0)        # camera row k-1
            bphi = _es("kdia,kdi,kdo->koa", Bcol, Z_phi, oh_row0)
            if updater == 0:
                d_mm_p = -_embed_rows(C_hh, W_, start)
                d_bm_p = _embed_rows(bphi, W_, start)
            else:
                # B~'s rows live at h-frames k-1 (+) and k (-)
                d_mm_p = -(
                    _embed_rows_shiftm1(C_hh, W_, start)
                    - _embed_rows(C_hh, W_, start)
                )
                d_bm_p = (
                    _embed_rows_shiftm1(bphi, W_, start)
                    - _embed_rows(bphi, W_, start)
                )

            pk = _pack_psum(
                {
                    **sys["part"],
                    "d_cc": d_cc1 - d_cc2
                    + _embed_rows(d_cc_s, W_, start).reshape(nc, nc),
                    "d_bc": d_bc1 - d_bc2
                    + _embed_rows(d_bc_s, W_, start).reshape(nc),
                    "d_cm": _embed_rows(cm_cur, W_, start)
                    + _embed_rows_shiftm1(cm_prev, W_, start),
                    "d_mm": d_mm_p,
                    "d_bm": d_bm_p,
                },
                (FA, TA),
            )

            # replicated assembly + Cholesky (redundant on every device)
            idx = jnp.arange(W_)
            Hcc = repl["Hcc0"].at[idx, :, idx, :].add(pk["Dcam"])
            b_cam = -(repl["g_cam0"] + pk["g_pts"])
            diag_cc = Hcc[idx, :, idx, :]
            Hcc_d = Hcc.at[idx, :, idx, :].set(
                _damp_blocks(diag_cc, lam, floor)
            )
            Dmm_sm = repl["Dmm_sm"]
            diag_full = (
                jnp.diagonal(Dmm_sm, axis1=-2, axis2=-1) + pk["ddiag_t"]
            )
            Dmm_d = Dmm_sm + (
                lam * jnp.maximum(diag_full, floor)
            )[..., None] * jnp.eye(6, dtype=dtype)
            b_mot = -repl["g_mot_sm"]
            d_cm = pk["d_cm"].transpose(0, 2, 3, 1, 4).reshape(
                nc, W_, O, 6
            )
            sys_proxy = SimpleNamespace(
                Omm1=repl["Omm1"], Omm2=repl["Omm2"],
                b_cam=b_cam, b_mot=b_mot,
            )
            Hred, bred = assemble_reduced(
                sys_proxy, Hcc_d, Dmm_d,
                pk["d_cc"], pk["d_bc"],
                d_cm, pk["d_mm"], pk["d_bm"],
            )
            cho = jax.scipy.linalg.cho_factor(Hred)
            delta_p = jax.scipy.linalg.cho_solve(cho, bred)
            dc = delta_p[:nc]
            dm = delta_p[nc:].reshape(W_, O, 6)

            # back-substitution (local; one v-ghost ppermute)
            d_sp = yb_s - _es("nmq,q->nm", Yc_s, dc)
            dm_sel = _es("gdo,gob->gdb", onehot_full, dm)   # (W, nd, 6)
            v = (
                Z_phi
                - _es("kdic,c->kdi", Z_U, dc)
                + _es("kdigb,gdb->kdi", Nh, dm_sel)
            )
            if F > 1:
                v_r = jax.lax.ppermute(
                    v[0], FA, [(i, i - 1) for i in range(1, F)]
                )
            else:
                v_r = jnp.zeros_like(v[0])
            v_next = jnp.concatenate([v[1:], v_r[None]], axis=0)
            s_next = s_ext[1:]                              # slots 1..S
            if updater == 0:
                Atv = (
                    -s_loc[..., None]
                    * _es("kdab,kdb->kda", loc["st_R"][:S], v)
                    + s_next[..., None] * v_next
                )
            else:
                RT_next = Rt_ext[1:]                        # slots 1..S
                Atv = (
                    s_loc[..., None] * v
                    - s_next[..., None]
                    * _es("kdab,kdb->kda", RT_next, v_next)
                )
            dc_loc = jax.lax.dynamic_slice_in_dim(
                dc.reshape(W_, 6), start, S, 0
            )
            r1 = loc["b_dp"] - _es("kdia,ka->kdi", loc["Rc"], dc_loc)
            d_dp = (r1 - Atv) * inv_c[..., None]
            return {"X": dc.reshape(W_, 6), "P": dm, "sp": d_sp, "dp": d_dp}

        return lm_optimize_schur(
            vals, None, None, cfg, lm_cfg, anchor, formulation=updater,
            overrides={
                "residual_fn": residual_fn,
                "error_fn": error_fn,
                "build_fn": build_fn,
                "step_fn": step_fn,
            },
        )

    return jax.shard_map(
        run, mesh=mesh,
        in_specs=tuple(in_specs.values()),
        out_specs=out_specs,
        check_vma=False,
    )(*args.values())
