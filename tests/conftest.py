"""Test config: run on a virtual 8-device CPU mesh.

The environment may pre-register a TPU backend (axon plugin) at interpreter
startup; `jax.config.update` after import reliably forces CPU, and
`jax_num_cpu_devices` gives us an 8-device virtual mesh for multi-chip
sharding tests without hardware.
"""

import os

# Mitigation for intermittent abort() inside XLA:CPU compilation observed
# after ~45+ compiles in one long pytest process (parallel LLVM codegen
# suspect).  Serialize codegen; compile time cost is minor on this host.
_flags = os.environ.get("XLA_FLAGS", "")
if "parallel_codegen" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_cpu_parallel_codegen_split_count=1"
    ).strip()

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


def pytest_collection_modifyitems(config, items):
    """Run the biggest-compile tests first.

    XLA:CPU intermittently segfaults/aborts when compiling the large
    frontend/pipeline programs late in a long pytest process (after ~50
    prior compilations).  Individually every test passes; front-loading the
    big compiles while the process is fresh sidesteps the crash.
    """
    early = ("test_frontend", "test_pipeline", "test_batch_eval")

    def rank(item):
        for i, name in enumerate(early):
            if name in item.nodeid:
                return (0, i)
        return (1, 0)

    items.sort(key=rank)
