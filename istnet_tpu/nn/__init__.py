from istnet_tpu.nn.estimators import (
    FeatureDeformer,
    HeavyEstimator,
    ImplicitTransformation,
    LightEstimator,
)
from istnet_tpu.nn.layers import BatchNorm, Dropout2d, PReLU, TorchConv, TorchDense
from istnet_tpu.nn.pointnet2_msg import PointNet2MSG, PointnetFPModule, PointnetSAModuleMSG
from istnet_tpu.nn.resnet_psp import ModifiedResnet
from istnet_tpu.nn.rotation import ortho6d_to_mat

__all__ = [
    "BatchNorm", "Dropout2d", "PReLU", "TorchConv", "TorchDense",
    "FeatureDeformer", "HeavyEstimator", "ImplicitTransformation", "LightEstimator",
    "PointNet2MSG", "PointnetFPModule", "PointnetSAModuleMSG",
    "ModifiedResnet", "ortho6d_to_mat",
]
