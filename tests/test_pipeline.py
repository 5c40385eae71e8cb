"""GPipe stage-splitter parity vs sequential execution on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from big_linear_algebra_tpu.parallel import make_mesh
from big_linear_algebra_tpu.parallel.pipeline import gpipe


def _stage_fn(params, x):
    w, b = params
    return jnp.tanh(x @ w + b)


def _sequential(stacked, xs):
    out = xs
    n_stages = stacked[0].shape[0]
    for s in range(n_stages):
        out = jax.vmap(lambda m: _stage_fn((stacked[0][s], stacked[1][s]), m))(out)
    return out


def test_gpipe_matches_sequential(rng):
    mesh = make_mesh({"stage": 4, "data": 2})
    S, D, B, M = 4, 16, 8, 6  # stages, width, microbatch size, n_micro
    ws = jnp.asarray(rng.standard_normal((S, D, D)) * 0.3, jnp.float32)
    bs = jnp.asarray(rng.standard_normal((S, D)) * 0.1, jnp.float32)
    xs = jnp.asarray(rng.standard_normal((M, B, D)), jnp.float32)

    got = np.asarray(gpipe(_stage_fn, (ws, bs), xs, mesh))
    want = np.asarray(_sequential((ws, bs), xs))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gpipe_gradients_flow(rng):
    mesh = make_mesh({"stage": 8})
    S, D, B, M = 8, 8, 4, 3
    ws = jnp.asarray(rng.standard_normal((S, D, D)) * 0.3, jnp.float32)
    bs = jnp.zeros((S, D), jnp.float32)
    xs = jnp.asarray(rng.standard_normal((M, B, D)), jnp.float32)

    def loss_pipe(ws, bs):
        return jnp.sum(gpipe(_stage_fn, (ws, bs), xs, mesh) ** 2)

    def loss_seq(ws, bs):
        return jnp.sum(_sequential((ws, bs), xs) ** 2)

    gw_p, gb_p = jax.grad(loss_pipe, argnums=(0, 1))(ws, bs)
    gw_s, gb_s = jax.grad(loss_seq, argnums=(0, 1))(ws, bs)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_s), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_s), rtol=1e-4,
                               atol=1e-6)
