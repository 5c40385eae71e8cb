"""Optimizers as pure pytree functions (hand-rolled, from-scratch flavor).

The reference's optimizers are inline: plain SGD via scale-then-add
(model/mnist_nn.c:303-315, lib/layer.c:72-73) and an *intended* Adam in
cifar_unet — first/second-moment buffers are allocated (``gm``/``gsm``,
model/cifar_unet.c:1887-1888) but never touched (SURVEY.md §7.11). This
module finishes that intent: SGD and Adam (Kingma & Ba 2015 defaults) as
(init, update) pairs over arbitrary pytrees, jit-friendly and
donation-friendly.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


def sgd_update(params: Any, grads: Any, lr) -> Any:
    """θ ← θ − lr·g (model/mnist_nn.c:303-315's negative-scale + add)."""
    return jax.tree.map(lambda p, g: p - lr * g, params, grads)


class AdamState(NamedTuple):
    step: jax.Array   # scalar int32
    m: Any            # first moments  (the reference's unused ``gm``)
    v: Any            # second moments (the reference's unused ``gsm``)


def adam_init(params: Any) -> AdamState:
    zeros = lambda t: jax.tree.map(jnp.zeros_like, t)
    return AdamState(step=jnp.zeros((), jnp.int32), m=zeros(params),
                     v=zeros(params))


def adam_update(params: Any, grads: Any, state: AdamState, lr,
                b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8):
    """One Adam step with bias correction. Returns (params, state)."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, grads)
    v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * (g * g),
                     state.v, grads)
    bc1 = 1 - b1 ** t
    bc2 = 1 - b2 ** t
    params = jax.tree.map(
        lambda p, m_, v_: p - lr * (m_ / bc1) / (jnp.sqrt(v_ / bc2) + eps),
        params, m, v,
    )
    return params, AdamState(step=step, m=m, v=v)
