"""Pallas TPU kernels for the hot ops."""

from mvkpconv_tpu.ops.pallas.kpconv import kpconv_fused, pallas_supported

__all__ = ["kpconv_fused", "pallas_supported"]
