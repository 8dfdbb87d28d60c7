"""Multi-sequence batched evaluation (data parallelism over sequences).

The reference processes one sequence per run; the batch-eval driver maps
the whole frontend over a *batch of sequences* with `vmap` and shards the
batch axis over the device mesh — BASELINE.json's "multi-sequence batch
(all KITTI tracking + OMD) with distributed BA" configuration.  All
sequences in a batch must share an image resolution (pad/crop upstream
otherwise).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.camera import CameraParams
from ..frontend.frontend import FrameImages, FrontendState, frontend_step
from ..utils.config import FrontendConfig


def make_batched_step(cfg: FrontendConfig, use_klt: bool = True):
    """vmapped frontend step over a leading sequence axis.

    Returns step(states, prev_images, images, cams, keys, first_frame) —
    every argument batched on axis 0 (cams too: per-sequence intrinsics).
    """

    def one(state, prev_images, images, cam, key, first):
        return frontend_step(
            state, prev_images, images, cam, cfg, key,
            use_klt=use_klt, first_frame=first,
        )

    from ..core.camera import CameraParams

    # batch intrinsics but keep width/height static (python ints)
    cam_axes = CameraParams(0, 0, 0, 0, None, None)
    # first_frame must be static -> two specializations
    step_first = jax.jit(
        jax.vmap(
            lambda s, p, i, c, k: one(s, p, i, c, k, True),
            in_axes=(0, 0, 0, cam_axes, 0),
        )
    )
    step_rest = jax.jit(
        jax.vmap(
            lambda s, p, i, c, k: one(s, p, i, c, k, False),
            in_axes=(0, 0, 0, cam_axes, 0),
        )
    )

    def step(states, prev_images, images, cams, keys, first_frame: bool):
        f = step_first if first_frame else step_rest
        return f(states, prev_images, images, cams, keys)

    return step


def shard_batch(tree, mesh: Mesh, axis_name: str = "frames"):
    """Shard a batched pytree's leading axis over one mesh axis."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return x

    return jax.tree.map(put, tree)


class MultiSequencePipeline:
    """Run S sequences lockstep-batched (optionally sharded over devices)."""

    def __init__(
        self,
        datasets: Sequence,
        cfg: FrontendConfig,
        caps=(1200, 4096, 16),
        use_klt: bool = True,
        mesh: Mesh | None = None,
    ):
        self.datasets = list(datasets)
        self.cfg = cfg
        self.mesh = mesh
        self.step = make_batched_step(cfg, use_klt)
        ns, nd, no = caps
        states = [FrontendState.create(ns, nd, no) for _ in self.datasets]
        self.states = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        from ..core.camera import CameraParams

        all_cams = [d.camera_params() for d in self.datasets]
        w0 = all_cams[0]
        self.cams = CameraParams(
            fx=jnp.stack([c.fx for c in all_cams]),
            fy=jnp.stack([c.fy for c in all_cams]),
            cx=jnp.stack([c.cx for c in all_cams]),
            cy=jnp.stack([c.cy for c in all_cams]),
            width=w0.width,
            height=w0.height,
        )

    def run(self, n_frames: int):
        iters = [d.frames() for d in self.datasets]
        prev = None
        packets = []
        for k in range(n_frames):
            frames = [next(it) for it in iters]
            batch = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
            if self.mesh is not None:
                batch = shard_batch(batch, self.mesh)
            if prev is None:
                prev = batch
            keys = jax.random.split(
                jax.random.PRNGKey(k), len(self.datasets)
            )
            self.states, pkt, report, _ = self.step(
                self.states, prev, batch, self.cams, keys, k == 0
            )
            packets.append(pkt)
            prev = batch
        return packets
