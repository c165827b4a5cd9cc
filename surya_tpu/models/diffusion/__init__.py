from surya_tpu.models.diffusion.euler_ancestral import (  # noqa: F401
    EulerAncestralSchedule,
    sample,
)
from surya_tpu.models.diffusion.tiny_unet import TinyDenoiser  # noqa: F401
