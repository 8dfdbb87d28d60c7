"""Numerical debugging & determinism tools.

The reference has no sanitizers configured (SURVEY §5.2); its thread-safety
bugs are a class this functional design cannot have.  The analogous risks
here are NaN propagation and nondeterminism, covered by:

  * `nan_debug()`: context manager enabling `jax_debug_nans` (eager NaN
    tracebacks) for a scope.
  * `check_finite(tree, name)`: host-side assertion over a pytree.
  * `deterministic_replay(fn, *args)`: runs `fn` twice and verifies
    bit-identical outputs — the replacement for race detection (XLA
    programs are deterministic; this catches accidental host-side RNG or
    iteration-order leaks).
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def nan_debug():
    """Enable eager NaN checking inside the scope."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_finite(tree, name: str = "tree"):
    """Raise with the offending leaf path if any value is non-finite."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)}: {n_bad} non-finite "
                f"values (shape {arr.shape})"
            )
    return True


def deterministic_replay(fn: Callable, *args, atol: float = 0.0):
    """Run fn twice; assert outputs are identical (or within atol).

    Returns the first output.  The functional replacement for the
    reference's thread-safety stress tests: any nondeterminism (host RNG
    leaking in, unstable reductions across runs) fails loudly.
    """
    out1 = jax.tree.map(np.asarray, fn(*args))
    out2 = jax.tree.map(np.asarray, fn(*args))

    def cmp(a, b):
        if a.dtype.kind in "fc":
            if atol == 0.0:
                np.testing.assert_array_equal(a, b)
            else:
                np.testing.assert_allclose(a, b, atol=atol)
        else:
            np.testing.assert_array_equal(a, b)

    jax.tree.map(cmp, out1, out2)
    return out1
