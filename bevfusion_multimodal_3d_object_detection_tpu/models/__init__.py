from .detector import MultiModal3DDetector, create_detector  # noqa: F401
from .encoders import (  # noqa: F401
    ResNetCameraEncoder,
    PointNetLiDAREncoder,
    VoxelNetLiDAREncoder,
    RadarEncoder,
    MultiRadarEncoder,
)
from .fusion import (  # noqa: F401
    FlexibleBEVFusion,
    FlexibleAttentionFusion,
    FlexibleLateFusion,
    SpatialReshaper,
)
from .heads import CenterNetHead, MLPDetectionHead  # noqa: F401
