"""Test config: run on a virtual 8-device CPU mesh.

The environment may pre-register a TPU backend (axon plugin) at interpreter
startup; `jax.config.update` after import reliably forces CPU, and
`jax_num_cpu_devices` gives us an 8-device virtual mesh for multi-chip
sharding tests without hardware.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# NOTE: do NOT enable jax_compilation_cache_dir here — the persistent-cache
# write path segfaults in this environment (zstd backend).

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
