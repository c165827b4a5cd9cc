"""Tensor-parallel parameter sharding rules over the 'model' mesh axis.

The reference is single-device; TP here is the config-flip capability
promised in SURVEY §2.5: large matmul weights (fusion head, classifier,
MLP projections — where the flagship's FLOPs concentrate outside convs)
are sharded over ('model',) and XLA/GSPMD inserts the all-gathers /
reduce-scatters. Small weights (conv kernels, BN scales) replicate —
sharding them would cost more in collectives than it saves.

Heuristic rule: for a parameter with ndim ≥ 2, shard its LAST axis over
'model' when that axis is divisible by the axis size and the parameter
has ≥ ``min_elements`` entries; otherwise replicate. The last axis of a
Dense kernel is the output-features axis → column-parallel linear.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from surya_tpu.core.mesh import MODEL_AXIS


def param_partition_spec(path_unused, value, model_size: int,
                         min_elements: int = 1 << 16) -> P:
    shape = np.shape(value)
    if (len(shape) >= 2 and value.size >= min_elements
            and shape[-1] % model_size == 0 and model_size > 1):
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    return P()


def partition_params(params, mesh: Mesh, min_elements: int = 1 << 16):
    """Device-put a param pytree with TP shardings per the rule above."""
    model_size = mesh.shape[MODEL_AXIS]

    def place(v):
        spec = param_partition_spec(None, v, model_size, min_elements)
        return jax.device_put(v, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)


def count_sharded(params, mesh: Mesh,
                  min_elements: int = 1 << 16) -> tuple[int, int]:
    """(num sharded params, num total params) under the rule — for
    logging/tests."""
    model_size = mesh.shape[MODEL_AXIS]
    leaves = jax.tree.leaves(params)
    n_sharded = sum(
        1 for v in leaves
        if param_partition_spec(None, v, model_size,
                                min_elements) != P())
    return n_sharded, len(leaves)
