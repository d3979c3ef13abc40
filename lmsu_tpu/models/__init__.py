"""Model zoo: camera/LiDAR encoders, fusion variants, complete model."""

from lmsu_tpu.models.camera_encoder import TwinLiteEncoder
from lmsu_tpu.models.fusion import (CameraFPNLite, CompleteSegmentationModel,
                                    ConcatenationFusion,
                                    LightweightSegmentationHead,
                                    GatedSumFusion,
                                    MinimalFusion,
                                    SameResolutionSegmentationHead,
                                    WeightedFusion)
from lmsu_tpu.models.lidar_encoder import (LiDAREncoder,
                                           PointPillarsLiDAREncoder,
                                           SpatialLiDAREncoder,
                                           create_test_point_cloud)
from lmsu_tpu.models.factory import (count_parameters, create_model,
                                     get_architecture_summary, init_model)

__all__ = [
    "TwinLiteEncoder", "LiDAREncoder", "SpatialLiDAREncoder",
    "PointPillarsLiDAREncoder",
    "create_test_point_cloud", "CameraFPNLite", "CompleteSegmentationModel",
    "ConcatenationFusion", "MinimalFusion", "WeightedFusion",
    "GatedSumFusion",
    "LightweightSegmentationHead", "SameResolutionSegmentationHead",
    "count_parameters", "create_model", "init_model",
    "get_architecture_summary",
]
