"""Jitted model initialization.

Eager ``model.init`` dispatches hundreds of tiny ops — on remote-compiled
TPU backends that costs minutes. Jitting the whole init makes it one
compiled program (seconds).
"""

from __future__ import annotations

import functools

import jax


def jit_init(model, *example_args, rngs=None, **example_kwargs):
    """Run ``model.init`` under jit and return the variables."""
    rngs = rngs if rngs is not None else jax.random.PRNGKey(0)

    @functools.partial(jax.jit)
    def _init(rngs, args, kwargs):
        return model.init(rngs, *args, **kwargs)

    return _init(rngs, example_args, example_kwargs)
