"""Data pipelines: scene synthesis, ScanNet IO, sphere/chunk sampling,
feature assembly, augmentation."""

from mvkpconv_tpu.data import meta, synthetic
from mvkpconv_tpu.data.spheres import SphereDataset, assemble_features
from mvkpconv_tpu.data.transforms import augment_points

__all__ = ["meta", "synthetic", "SphereDataset", "assemble_features", "augment_points"]
