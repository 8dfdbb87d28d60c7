"""Frontend packet serialization: save/replay (checkpoint & decoupling).

Analog of the reference's `--save_frontend_json` / `--frontend_from_file`
BSON path (`RGBDInstanceFrontendModule.cc:75-83`,
`src/pipeline/PipelineManager.cc:228-256`): every `FrontendOutput` is saved
(stacked, compressed npz — tensors, not JSON) and can be replayed through
the backend with no vision, which is also how backend experiments decouple
from the frontend.  Solver/optimizer state checkpointing uses orbax
(`save_checkpoint`/`load_checkpoint`).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.lie import SE3
from ..core.types import FrontendOutput, stack_outputs


def save_packets(path: str, packets: List[FrontendOutput]):
    stacked = stack_outputs(packets)
    leaves, treedef = jax.tree.flatten(stacked)
    np.savez_compressed(
        path,
        n=len(packets),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_packets(path: str) -> List[FrontendOutput]:
    data = np.load(path)
    n = int(data["n"])
    template = FrontendOutput.empty(1, 1, 1)
    treedef = jax.tree.structure(template)
    leaves = [
        jnp.asarray(data[f"leaf_{i}"]) for i in range(treedef.num_leaves)
    ]
    stacked = jax.tree.unflatten(treedef, leaves)
    return [jax.tree.map(lambda x: x[k], stacked) for k in range(n)]


def save_checkpoint(path: str, state_pytree):
    """Orbax checkpoint of arbitrary solver/pipeline state."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state_pytree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template_pytree):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template_pytree)
