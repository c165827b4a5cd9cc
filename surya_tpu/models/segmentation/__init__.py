from surya_tpu.models.segmentation.u2net import (  # noqa: F401
    U2Net,
    import_u2net,
    saliency_fn,
    u2net_loss,
)
