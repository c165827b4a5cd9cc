from surya_tpu.ops.quadtree import quadrant_split, quadrant_merge  # noqa: F401
