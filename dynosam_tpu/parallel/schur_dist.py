"""Distributed direct reduced (Schur) solver over the TPU mesh.

Round 1 only sharded the matrix-free PCG path; the PRODUCTION window solver
— exact landmark elimination + dense Cholesky (`backend/schur.py`) — ran on
one device.  This module distributes it over the `frames x tracks` mesh,
replacing the reference's single-threaded gtsam optimizer
(`src/backend/RGBDBackendModule.cc:201-234`) with a solver whose
per-iteration work scales with devices (SURVEY §2.31 / §5.7 keyframe-block
partitioning).

What is communicated, and how (the parts GSPMD cannot derive):

  * The per-tracklet block-tridiagonal chain systems run along the FRAME
    axis — a `lax.scan`, which XLA cannot partition over its scan axis.  We
    substructure it by hand inside `shard_map` (`chain_solve_spike`): each
    frame block eliminates its interior with the local block-Thomas solve,
    the cross-block coupling blocks are halo-exchanged with
    `lax.ppermute`, the per-block boundary rows ("spikes") are
    `all_gather`ed over the frame axis, every device solves the small
    per-chain interface system redundantly (6*B dims, B = frame shards),
    and interiors are corrected locally.  Scan length drops from W to
    W/B + O(1); per-device flops drop by ~B.
  * Everything else — the normal-system build (pure einsums after the
    hand-derived Jacobians), the psum of the reduced {X, H|L} Hessian
    corrections over frame blocks, the static-landmark reduction, and the
    replicated few-hundred-dim Cholesky — is expressed with sharding
    annotations and partitioned by GSPMD, which inserts the psum/all-gather
    collectives over ICI (SURVEY §5.8).

The tracks axis needs no communication at all: chains are independent, so
the track dimension of every chain/spike tensor stays sharded end-to-end.
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


def make_spike_chain_solver(mesh):
    """Returns chain_solver(A, B, rhs) solving the (W, N) block-tridiagonal
    chain systems with W sharded over `frames` and N over `tracks`.

    A (W, N, 3, 3) SPD diagonal blocks, B (W, N, 3, 3) with B[k] the
    (row k-1, col k) coupling (B[0] == 0), rhs (W, N, 3, M).  Requires the
    per-device frame block size W/B >= 2 (first/last boundary rows must be
    distinct).
    """
    n_blocks = mesh.shape[FRAME_AXIS]

    def local_solve(A, B, rhs):
        # local shapes: A, B (S, n, 3, 3); rhs (S, n, 3, M)
        S = A.shape[0]
        b_idx = jax.lax.axis_index(FRAME_AXIS)

        # split the cross-block coupling out of the local system
        B0 = B[0]                                   # couples to left block
        B_int = B.at[0].set(jnp.zeros_like(B0))
        # halo: fetch the RIGHT neighbour's B0 (this block's right coupling);
        # the last block receives zeros (ppermute fills missing sources)
        B_next = jax.lax.ppermute(
            B0, FRAME_AXIS, [(i, i - 1) for i in range(1, n_blocks)]
        )

        # augment the RHS with the two spike columns:
        #   V-col: row 0 gets B0^T   (coupling to x_last of the left block)
        #   W-col: row S-1 gets B_next (coupling to x_first of the right)
        M = rhs.shape[-1]
        Bt0 = jnp.swapaxes(B0, -1, -2)
        v_col = jnp.zeros((S, *Bt0.shape), Bt0.dtype).at[0].set(Bt0)
        w_col = jnp.zeros_like(v_col).at[S - 1].set(B_next)
        rhs_aug = jnp.concatenate([rhs, v_col, w_col], axis=-1)

        Y = chain_solve(A, B_int, rhs_aug)          # (S, n, 3, M+6)
        y, V, Wm = Y[..., :M], Y[..., M : M + 3], Y[..., M + 3 :]

        # gather the boundary (first/last) rows of y and the spikes
        def gather(x):                              # (2, n, 3, c) -> (Bb, ...)
            return jax.lax.all_gather(x, FRAME_AXIS)

        yb = gather(jnp.stack([y[0], y[S - 1]]))    # (Bb, 2, n, 3, M)
        Vb = gather(jnp.stack([V[0], V[S - 1]]))    # (Bb, 2, n, 3, 3)
        Wb = gather(jnp.stack([Wm[0], Wm[S - 1]]))

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

        n = A.shape[1]
        Bb = n_blocks
        dt = A.dtype
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

    spec = P(FRAME_AXIS, TRACK_AXIS, None, None)

    def solver(A, B, rhs):
        return jax.shard_map(
            local_solve,
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
    m_sharded = shard_map_data(m, mesh)
    return _optimize_schur_sharded(m_sharded, window, cfg, lm_cfg, updater, mesh)
