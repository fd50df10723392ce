"""Test config: force an 8-device virtual CPU platform before JAX loads.

All tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the driver separately compile-checks the TPU
path via __graft_entry__.py).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU-tunnel plugin ignores JAX_PLATFORMS from the environment;
# forcing via jax.config does stick.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True)
def _isolate_gather_transpose():
    """make_train_step sets the module-global gather-transpose mode at
    trace time (by design — it must be visible inside the backward
    trace); without isolation a training test leaves the config default
    ('banded_bf16', quantizing) active for later exact-gradient tests."""
    from mvkpconv_tpu.ops import gather

    prev = gather.get_gather_transpose()
    gather.set_gather_transpose("scatter")
    yield
    gather.set_gather_transpose(prev)
