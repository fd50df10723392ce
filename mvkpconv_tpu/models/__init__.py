"""Flax models: KPConv blocks, KPFCNN + fusion variants, UNet-ResNet34,
PointNet++ (PN2SSG), FeatureAggregation, MVPNet3D."""

from mvkpconv_tpu.models.kernel_points import kernel_point_positions
from mvkpconv_tpu.models import blocks
from mvkpconv_tpu.models.kpfcnn import KPCNN, KPFCNN
from mvkpconv_tpu.models.unet2d import UNetResNet34
from mvkpconv_tpu.models.feature_aggregation import FeatureAggregation
from mvkpconv_tpu.models.pn2 import PN2SSG
from mvkpconv_tpu.models.mvpnet3d import MVPNet3D
from mvkpconv_tpu.models.mvkpconv import MVKPConv

__all__ = [
    "MVKPConv",
    "KPCNN",
    "kernel_point_positions",
    "blocks",
    "KPFCNN",
    "UNetResNet34",
    "FeatureAggregation",
    "PN2SSG",
    "MVPNet3D",
]
