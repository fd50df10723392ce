"""UNet on a ResNet34 encoder for 2D semantic segmentation (Flax, NHWC).

Re-design of mvpnet/models/unet_resnet34.py:9-139: ResNet34 encoder with a
stride-1 stem conv (full-resolution first feature map, unet_resnet34.py:19-20),
four deconv+concat decoder stages, pad-to-16/crop, and two outputs:
``seg_logit`` (num_classes) and ``feature`` (64 channels at input resolution)
— the 64-d per-pixel features are what gets lifted onto points by the fusion
models.

TPU notes: NHWC layout, bf16-friendly convs (set ``compute_dtype``), BN with
torch-equivalent momentum. Weights can be imported from a torchvision
ResNet34 checkpoint via ``load_torch_resnet34_encoder`` (no network access is
assumed; training from scratch is the default).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    """torchvision ResNet BasicBlock (two 3×3 convs + identity/proj)."""

    filters: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(
            self.filters, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = _bn(self.dtype, train, "bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.filters, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="conv2",
        )(y)
        y = _bn(self.dtype, train, "bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.filters:
            residual = nn.Conv(
                self.filters, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="proj",
            )(x)
            residual = _bn(self.dtype, train, "proj_bn")(residual)
        return nn.relu(y + residual)


class _DeconvBlock(nn.Module):
    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            self.filters, (2, 2), strides=(2, 2), dtype=self.dtype, name="deconv"
        )(x)
        x = _bn(self.dtype, train, "bn")(x)
        return nn.relu(x)


class _ConvBlock(nn.Module):
    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.filters, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="conv",
        )(x)
        x = _bn(self.dtype, train, "bn")(x)
        return nn.relu(x)


def _bn(dtype, train: bool, name: str):
    """BatchNorm in ``dtype`` at eval, f32 under train.

    At eval BN is a pure scale+shift, so running it in the surrounding
    compute dtype (bf16) keeps activations bf16 end-to-end — the UNet is
    HBM-bound on its full-resolution stem activations (RESULTS.md), and
    f32 BN outputs were doubling that traffic. Under train the batch
    moments keep f32 accumulation (flax computes statistics in dtype, so
    we pin f32 there — same numerics as before this optimization)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        dtype=None if train else dtype,
        name=name,
    )


RESNET34_LAYERS = ((64, 3), (128, 4), (256, 6), (512, 3))


class UNetResNet34(nn.Module):
    """Returns {'seg_logit': (B,H,W,num_classes), 'feature': (B,H,W,64)}."""

    num_classes: int = 20
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False):
        h, w = image.shape[1], image.shape[2]
        pad_h = (-h) % 16
        pad_w = (-w) % 16
        x = jnp.pad(image, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

        # ----- encoder -----
        skips = []
        x = nn.Conv(
            64, (7, 7), strides=(1, 1), padding=3, use_bias=False,
            dtype=self.dtype, name="encoder0",
        )(x)
        x = _bn(self.dtype, train, "bn0")(x)
        x = nn.relu(x)
        skips.append(x)  # full res, 64ch
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (filters, depth) in enumerate(RESNET34_LAYERS):
            stride = 1 if stage == 0 else 2
            for i in range(depth):
                x = BasicBlock(
                    filters, stride if i == 0 else 1, self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train)
            if stage == 2 and self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            if stage < 3:
                skips.append(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)

        # ----- decoder (unet_resnet34.py:33-45 channel plan) -----
        for stage, (filters, skip) in enumerate(zip((256, 128, 64, 64), reversed(skips))):
            x = _DeconvBlock(filters, self.dtype, name=f"deconv{4 - stage}")(x, train)
            x = jnp.concatenate([x, skip], axis=-1)
            out_c = 64 if filters == 64 else filters
            x = _ConvBlock(out_c, self.dtype, name=f"decoder{3 - stage}")(x, train)

        if pad_h or pad_w:
            x = x[:, :h, :w, :]
        seg_logit = nn.Conv(self.num_classes, (1, 1), name="logit")(x)
        return {"seg_logit": seg_logit, "feature": x}


def load_torch_resnet34_encoder(variables, state_dict):
    """Import torchvision-ResNet34 weights into the UNet encoder subtree.

    The reference builds its 2D net on ImageNet-pretrained torchvision
    weights (mvpnet/models/unet_resnet34.py:17-31: ``resnet34(pretrained)``,
    with ``conv1.weight`` copied into the stride-1 stem). This is the JAX
    equivalent: map a torch-format ResNet34 state dict onto the Flax
    ``UNetResNet34`` encoder params + batch stats (OIHW→HWIO kernel
    transposes, BN weight/bias→scale/bias, running stats). Decoder/logit
    params are left untouched (the reference's decoder also trains from
    scratch).

    Args:
      variables: the UNet's own ``{'params', 'batch_stats'}`` variables.
      state_dict: a torchvision ``resnet34().state_dict()`` — either a
        mapping of numpy/torch arrays, or a path to a ``torch.save``d file
        (loaded with CPU torch; files wrapping the dict under a
        ``'state_dict'`` key are unwrapped).

    Returns:
      New variables with the encoder leaves replaced (shape-checked).
    """
    import numpy as np
    from pathlib import Path as _Path

    if isinstance(state_dict, (str, _Path)):
        import torch

        raw = torch.load(str(state_dict), map_location="cpu")
        if isinstance(raw, dict) and "state_dict" in raw:
            raw = raw["state_dict"]
        state_dict = raw
    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v)

    from flax import traverse_util

    params = traverse_util.flatten_dict(dict(variables["params"]), sep="/")
    stats = traverse_util.flatten_dict(dict(variables["batch_stats"]), sep="/")

    def put(tree, key, val):
        if key not in tree:
            raise KeyError(f"UNet variables have no leaf {key!r}")
        cur = np.asarray(tree[key])
        val = np.asarray(val)
        if val.shape != cur.shape:
            raise ValueError(
                f"{key}: torch weight shape {val.shape} != flax {cur.shape}"
            )
        tree[key] = val.astype(cur.dtype)

    def put_conv(flax_name, torch_name):
        # OIHW → HWIO
        put(params, f"{flax_name}/kernel", sd[torch_name].transpose(2, 3, 1, 0))

    def put_bn(flax_name, torch_prefix):
        put(params, f"{flax_name}/scale", sd[f"{torch_prefix}.weight"])
        put(params, f"{flax_name}/bias", sd[f"{torch_prefix}.bias"])
        put(stats, f"{flax_name}/mean", sd[f"{torch_prefix}.running_mean"])
        put(stats, f"{flax_name}/var", sd[f"{torch_prefix}.running_var"])

    put_conv("encoder0", "conv1.weight")
    put_bn("bn0", "bn1")
    for stage, (_, depth) in enumerate(RESNET34_LAYERS):
        for i in range(depth):
            t = f"layer{stage + 1}.{i}"
            f = f"layer{stage + 1}_{i}"
            put_conv(f"{f}/conv1", f"{t}.conv1.weight")
            put_bn(f"{f}/bn1", f"{t}.bn1")
            put_conv(f"{f}/conv2", f"{t}.conv2.weight")
            put_bn(f"{f}/bn2", f"{t}.bn2")
            if f"{t}.downsample.0.weight" in sd:
                put_conv(f"{f}/proj", f"{t}.downsample.0.weight")
                put_bn(f"{f}/proj_bn", f"{t}.downsample.1")

    new_vars = dict(variables)
    new_vars["params"] = traverse_util.unflatten_dict(params, sep="/")
    new_vars["batch_stats"] = traverse_util.unflatten_dict(stats, sep="/")
    return new_vars
