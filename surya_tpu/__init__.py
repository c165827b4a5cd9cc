"""surya_tpu — TPU-native multimodal hierarchical CNN framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
repo `Avirup221/Multimodal-Hierarchical-CNN-for-Sun-Salutation-Pose-
Classification` ("SURYA"): multimodal (image + 47 engineered pose features)
spatial and temporal pose classification, quadtree hierarchical feature
models, training/eval loops, Grad-CAM interpretability, and offline data
engineering — all designed TPU-first (NHWC layouts, bfloat16 MXU compute,
pjit/shard_map over explicit device meshes, Pallas kernels on the hot path).

The package layout (see SURVEY.md for the reference layer map L0-L7):

- ``core``      — config tree, mesh/sharding, PRNG, metrics, checkpointing
- ``data``      — dataset indexing, input pipeline, on-device augmentation
- ``features``  — the 47/575 engineered pose-feature math as batched jnp
- ``models``    — backbones + spatial + temporal model families
- ``ops``       — Pallas TPU kernels (quadrant gather, fused fusion head)
- ``parallel``  — data-parallel sharding rules, ring-attention CP path
- ``train``     — generic jitted train/eval loops (replaces 9 ref scripts)
- ``interpret`` — Grad-CAM via jax.vjp, hierarchical feature-map viz
- ``infer``     — video inference
- ``augmentgen``— offline generative augmentation (rembg / multiview grid)
"""

__version__ = "0.1.0"
