"""Fused GN+ReLU kernel parity vs the composed general path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_linear_algebra_tpu.nn.norm import group_norm
from big_linear_algebra_tpu.nn.norm_pallas import group_norm_relu
from big_linear_algebra_tpu.ops.activations import relu


@pytest.mark.parametrize("shape,gs", [
    ((8, 6, 6), 4),
    ((2, 8, 5, 5), 4),     # batched
    ((12, 4, 4), 4),       # 3 groups
    ((7, 4, 4), 3),        # ragged → fallback path
])
def test_forward_matches_composed(rng, shape, gs):
    x = jnp.asarray(rng.standard_normal(shape) * 2 + 0.3, jnp.float32)
    got = np.asarray(group_norm_relu(x, gs))
    want = np.asarray(relu(group_norm(x.astype(jnp.float64), gs))).astype(
        np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_vjp_matches_composed(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 5, 5)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, 8, 5, 5)), jnp.float32)
    _, vjp_f = jax.vjp(lambda a: group_norm_relu(a, 4), x)
    _, vjp_c = jax.vjp(lambda a: relu(group_norm(a, 4)), x)
    np.testing.assert_allclose(np.asarray(vjp_f(g)[0]),
                               np.asarray(vjp_c(g)[0]), rtol=1e-5, atol=1e-6)
