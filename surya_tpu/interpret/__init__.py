from surya_tpu.interpret.gradcam import grad_cam, overlay_heatmap  # noqa: F401
