"""Parameter initializers (≈ the reference per-model init functions).

The reference samples with global ``rand()``; here every initializer takes an
explicit ``jax.random`` key (deterministic, parallel-safe). Distribution
shapes mirror the reference:

- ``he_uniform``: U(−√(6/fan_in), +√(6/fan_in)) — model/mnist_nn.c:97-142
  ("2*sqrt(6/fan_in)" range centred at 0) and model/cifar_unet.c:1439-1446.
- ``xavier_uniform``: U(−√6/√(fan_in+fan_out), +…) — model/cifar_unet.c:1447-1454.
- ``uniform_init``: U(−0.5, 0.5) — model/mnist.c:218-249; with ``scale`` for
  mnist_hinge's scaled uniform (model/mnist_hinge.c:14-25).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def he_uniform(key, shape, fan_in: int, dtype=jnp.float32):
    limit = jnp.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def xavier_uniform(key, shape, fan_in: int, fan_out: int, dtype=jnp.float32):
    limit = jnp.sqrt(6.0) / jnp.sqrt(float(fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def uniform_init(key, shape, scale: float = 1.0, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -0.5 * scale, 0.5 * scale)
