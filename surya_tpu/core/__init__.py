from surya_tpu.core.config import (  # noqa: F401
    Config,
    DataConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
    get_preset,
    list_presets,
)
from surya_tpu.core.mesh import MeshSpec, create_mesh, data_sharding, replicated  # noqa: F401
from surya_tpu.core.prng import PRNG  # noqa: F401
