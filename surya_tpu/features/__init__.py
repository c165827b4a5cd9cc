from surya_tpu.features.pose47 import (  # noqa: F401
    FEATURE_NAMES_47,
    NUM_FEATURES,
    extract_features_47,
)
