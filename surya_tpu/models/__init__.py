from surya_tpu.models.registry import (  # noqa: F401
    TEMPORAL_MODELS,
    get_model,
    list_models,
)
