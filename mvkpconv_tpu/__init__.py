"""mvkpconv_tpu — TPU-native multi-modal 3D point cloud segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of MV-KPConv (Du et al., ECPPM 2022):
3D semantic segmentation of indoor point clouds enhanced by fusing per-pixel
features from a 2D CNN (UNet-ResNet34 over multi-view RGB-D frames) into a
KPConv point-convolution network, plus the MVPNet (PointNet++) and KPConv
baselines.

Reference capability map (see SURVEY.md): the reference's CUDA ops
(mvpnet/ops/cuda/*) and C++ wrappers (KPConv-PyTorch/cpp_wrappers/*) become
static-shape JAX/Pallas device ops in :mod:`mvkpconv_tpu.ops`; the PyTorch
models become Flax modules in :mod:`mvkpconv_tpu.models`; the dual training
harnesses become one iteration-based trainer in :mod:`mvkpconv_tpu.training`;
scaling is expressed over a ``jax.sharding.Mesh`` in
:mod:`mvkpconv_tpu.parallel`.

Design pillars (TPU-first, not a port):
  * static shapes everywhere — fixed per-level point/neighbor budgets with a
    shadow-slot padding convention (index == N means "no neighbor");
  * the whole multiscale input pyramid (grid subsampling + radius neighbors)
    is built **on device inside jit**, not on CPU dataloader workers;
  * brute-force distance matrices ride the MXU; hot paths run in bfloat16;
  * batch = dense ``(B, N, ...)`` arrays (vmap), not stacked ragged clouds;
  * data parallelism via ``jax.sharding`` over a device mesh.
"""

__version__ = "0.1.0"

from mvkpconv_tpu import ops  # noqa: F401
