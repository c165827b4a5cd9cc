"""Parallelism strategies over the ('data','model','seq') mesh.

- DP: batch-axis sharding (core.mesh.shard_batch) — the primary axis.
- TP: column-parallel placement of large matmul params (sharding.py).
- SP/CP: ring attention over the seq axis (ring_attention.py).
- PP: deliberately out of scope — every model here fits one chip with
  room to spare (≤115M params), so pipeline stages would only add
  bubble overhead (SURVEY §2.5).
- EP: out of scope — no mixture-of-experts models in this domain.
"""

from surya_tpu.parallel.ring_attention import ring_attention  # noqa: F401
from surya_tpu.parallel.sharding import count_sharded, partition_params  # noqa: F401
