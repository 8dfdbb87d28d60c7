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
