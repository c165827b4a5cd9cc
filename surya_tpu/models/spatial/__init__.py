from surya_tpu.models.spatial.quadtree import QuadtreeCNN  # noqa: F401
from surya_tpu.models.spatial.hierarchical import (  # noqa: F401
    AttentionHierarchicalCNN,
    HierarchicalQuadtreeCNN,
)
from surya_tpu.models.spatial.standard import (  # noqa: F401
    StandardMultimodalCNN,
    StandardResNetCNN,
)
