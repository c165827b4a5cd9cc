from surya_tpu.models.temporal.cnn_lstm import CnnLstm  # noqa: F401
from surya_tpu.models.temporal.conv3d import Ji3DCNN, Quadtree3DCNN  # noqa: F401
from surya_tpu.models.temporal.resnet3d_video import (  # noqa: F401
    HybridQuadtree3DCNN,
    ResNet3DVideo,
)
from surya_tpu.models.temporal.fact import FactModel  # noqa: F401
