from surya_tpu.data.pipeline import ArrayDataSource  # noqa: F401
from surya_tpu.data.synthetic import make_synthetic_spatial, make_synthetic_temporal  # noqa: F401
