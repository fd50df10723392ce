"""Tests for the torch→Flax ResNet34 encoder import (unet2d.py).

The reference's 2D net starts from ImageNet-pretrained torchvision weights
(mvpnet/models/unet_resnet34.py:17-31). No torchvision/network here, so a
torch-layout ResNet34 state dict is fabricated with the exact torchvision key
schema, saved with torch.save, imported, and validated two ways: leaf-level
round trip (with the OIHW→HWIO transposes) and a numeric forward parity check
of the stem + layer1 stage against a pure-torch functional forward.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mvkpconv_tpu.models.unet2d import (
    RESNET34_LAYERS,
    UNetResNet34,
    load_torch_resnet34_encoder,
)
from mvkpconv_tpu.training.init import jit_init

torch = pytest.importorskip("torch")


def fabricate_resnet34_state_dict(rng):
    """Torch-format resnet34().state_dict() with random (well-scaled) values."""
    sd = {}

    def conv(name, cout, cin, k):
        sd[name] = torch.from_numpy(
            (rng.randn(cout, cin, k, k) * 0.05).astype(np.float32)
        )

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.from_numpy(
            (1.0 + 0.1 * rng.randn(c)).astype(np.float32)
        )
        sd[f"{prefix}.bias"] = torch.from_numpy(
            (0.1 * rng.randn(c)).astype(np.float32)
        )
        sd[f"{prefix}.running_mean"] = torch.from_numpy(
            (0.1 * rng.randn(c)).astype(np.float32)
        )
        sd[f"{prefix}.running_var"] = torch.from_numpy(
            (1.0 + 0.1 * rng.rand(c)).astype(np.float32)
        )

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for stage, (cout, depth) in enumerate(RESNET34_LAYERS):
        for i in range(depth):
            t = f"layer{stage + 1}.{i}"
            conv(f"{t}.conv1.weight", cout, cin if i == 0 else cout, 3)
            bn(f"{t}.bn1", cout)
            conv(f"{t}.conv2.weight", cout, cout, 3)
            bn(f"{t}.bn2", cout)
            if i == 0 and cin != cout:
                conv(f"{t}.downsample.0.weight", cout, cin, 1)
                bn(f"{t}.downsample.1", cout)
        cin = cout
    # classifier leaves a real torchvision dict also carries (ignored by the
    # importer)
    sd["fc.weight"] = torch.zeros(1000, 512)
    sd["fc.bias"] = torch.zeros(1000)
    return sd


@pytest.fixture(scope="module")
def unet_and_import(tmp_path_factory):
    rng = np.random.RandomState(0)
    sd = fabricate_resnet34_state_dict(rng)
    path = tmp_path_factory.mktemp("ckpt") / "resnet34.pth"
    torch.save(sd, str(path))

    model = UNetResNet34(num_classes=5)
    img = rng.rand(1, 32, 32, 3).astype(np.float32)
    variables = jit_init(model, jnp.asarray(img))
    loaded = load_torch_resnet34_encoder(variables, path)
    return model, img, sd, variables, loaded


def test_leaf_round_trip(unet_and_import):
    _, _, sd, variables, loaded = unet_and_import
    p = loaded["params"]
    s = loaded["batch_stats"]
    np.testing.assert_array_equal(
        np.asarray(p["encoder0"]["kernel"]),
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        np.asarray(p["layer4_2"]["conv2"]["kernel"]),
        sd["layer4.2.conv2.weight"].numpy().transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        np.asarray(p["layer2_0"]["proj"]["kernel"]),
        sd["layer2.0.downsample.0.weight"].numpy().transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        np.asarray(s["layer3_4"]["bn2"]["var"]),
        sd["layer3.4.bn2.running_var"].numpy(),
    )
    # decoder params untouched
    np.testing.assert_array_equal(
        np.asarray(p["decoder0"]["conv"]["kernel"]),
        np.asarray(variables["params"]["decoder0"]["conv"]["kernel"]),
    )


def test_forward_parity_stem_and_layer1(unet_and_import):
    """Stem+layer1 output must match a pure-torch functional forward."""
    import torch.nn.functional as F

    model, img, sd, _, loaded = unet_and_import

    # ---- torch side: conv1(stride 1, the reference's stem surgery) →
    # bn → relu → maxpool → layer1 (3 BasicBlocks, no downsample)
    def t_bn(x, prefix):
        return F.batch_norm(
            x,
            sd[f"{prefix}.running_mean"],
            sd[f"{prefix}.running_var"],
            sd[f"{prefix}.weight"],
            sd[f"{prefix}.bias"],
            training=False,
        )

    x = torch.from_numpy(img.transpose(0, 3, 1, 2))
    x = F.conv2d(x, sd["conv1.weight"], stride=1, padding=3)
    x = F.relu(t_bn(x, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for i in range(3):
        t = f"layer1.{i}"
        y = F.conv2d(x, sd[f"{t}.conv1.weight"], padding=1)
        y = F.relu(t_bn(y, f"{t}.bn1"))
        y = F.conv2d(y, sd[f"{t}.conv2.weight"], padding=1)
        y = t_bn(y, f"{t}.bn2")
        x = F.relu(y + x)
    want = x.numpy().transpose(0, 2, 3, 1)

    # ---- flax side: capture the layer1_2 block output
    _, inter = model.apply(
        loaded, jnp.asarray(img), train=False,
        capture_intermediates=True, mutable=["intermediates"],
    )
    got = np.asarray(
        inter["intermediates"]["layer1_2"]["__call__"][0]
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_shape_mismatch_raises(unet_and_import):
    model, img, sd, variables, _ = unet_and_import
    bad = dict(sd)
    bad["layer1.0.conv1.weight"] = torch.zeros(64, 64, 5, 5)
    with pytest.raises(ValueError, match="layer1_0/conv1"):
        load_torch_resnet34_encoder(variables, bad)
