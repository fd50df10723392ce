"""MaskedBatchNorm: padded slots must not pollute the moments."""

import numpy as np

import jax
import jax.numpy as jnp

from mvkpconv_tpu.models.blocks import MaskedBatchNorm


def test_masked_stats_ignore_padding(rng):
    x = rng.randn(2, 64, 8).astype(np.float32)
    mask = np.ones((2, 64), bool)
    mask[:, 40:] = False
    x[:, 40:] = 1e4  # poison the padded slots

    bn = MaskedBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask),
                        train=True)
    y, updates = bn.apply(
        variables, jnp.asarray(x), jnp.asarray(mask), train=True,
        mutable=["batch_stats"],
    )
    valid = x[:, :40].reshape(-1, 8)
    expected_mean = valid.mean(0)
    got_mean = np.asarray(updates["batch_stats"]["mean"]) / 0.02  # momentum
    np.testing.assert_allclose(got_mean, expected_mean, rtol=1e-4, atol=1e-4)
    # normalized valid region ~ zero mean / unit var
    yv = np.asarray(y)[:, :40].reshape(-1, 8)
    np.testing.assert_allclose(yv.mean(0), 0, atol=1e-4)
    np.testing.assert_allclose(yv.std(0), 1, atol=1e-2)


def test_bias_only_mode(rng):
    x = rng.randn(2, 16, 4).astype(np.float32)
    bn = MaskedBatchNorm(use_bn=False)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = bn.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-6)  # zero bias init


def test_eval_uses_running_stats(rng):
    x = rng.randn(2, 32, 4).astype(np.float32) * 3 + 5
    bn = MaskedBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    # eval with fresh (zero-mean/unit-var) running stats: output == input
    y = bn.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y), x, rtol=1e-4, atol=1e-4)
