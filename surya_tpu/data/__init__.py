from surya_tpu.data.pipeline import ArrayDataSource  # noqa: F401
from surya_tpu.data.synthetic import (  # noqa: F401
    make_synthetic_capability,
    make_synthetic_spatial,
    make_synthetic_temporal,
)
