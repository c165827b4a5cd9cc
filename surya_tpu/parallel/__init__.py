from surya_tpu.parallel.ring_attention import ring_attention  # noqa: F401
from surya_tpu.parallel.sharding import count_sharded, partition_params  # noqa: F401
