from surya_tpu.models.registry import get_model, list_models  # noqa: F401
