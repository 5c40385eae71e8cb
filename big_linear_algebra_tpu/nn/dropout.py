"""Dropout (≈ ``_dropout``, model/cifar_unet.c:1032-1042).

The reference zeroes elements with probability p using global ``rand()`` and
does NOT rescale survivors (its backward ``_dropout_mask`` :1175 just reuses
the mask). Intended-semantics deviations: inverted dropout (survivors scaled
by 1/(1−p), so eval needs no scaling — the standard DDPM formulation) and an
explicit ``jax.random`` key (deterministic, trace-safe; SURVEY.md §7.14 notes
the reference's RNG is global state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(x: jax.Array, rate: float, key: jax.Array,
            deterministic: bool = False) -> jax.Array:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
