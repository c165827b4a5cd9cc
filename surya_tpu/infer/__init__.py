from surya_tpu.infer.serve import (  # noqa: F401
    Predictor,
    export_model,
    load_exported,
)
