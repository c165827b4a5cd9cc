"""Parallelism strategies over explicit device meshes.

- DP: batch-axis sharding (core.mesh.shard_batch) — the primary axis.
- TP: column-parallel placement of large matmul params (sharding.py).
- SP/CP: ring attention over the seq axis (ring_attention.py).
- PP: GPipe microbatch schedule for the FACT fusion encoder over a
  'pipe' axis (pipeline.py) — the one homogeneous layer stack; CNN
  stages are shape-heterogeneous and scale via DP/TP instead.
- EP: Switch/GShard MoE fusion FFN with experts over an 'expert' axis
  (moe.py) — beyond-reference extension, off by default.
- ZeRO-1: Adam moments sharded over 'data' (zero.py) — pure
  annotation; GSPMD derives reduce-scatter/all-gather.
"""

from surya_tpu.parallel.ring_attention import ring_attention  # noqa: F401
from surya_tpu.parallel.sharding import count_sharded, partition_params  # noqa: F401
from surya_tpu.parallel.zero import apply_zero1, zero1_shardings  # noqa: F401
