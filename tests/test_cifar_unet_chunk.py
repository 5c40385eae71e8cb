"""train_chunk (scan of K steps) equivalence with sequential train_step."""

import jax
import jax.numpy as jnp
import numpy as np

from big_linear_algebra_tpu.models import cifar_unet as cu


def test_train_chunk_matches_sequential(rng):
    cfg = cu.TINY
    params = cu.init_params(jax.random.key(0), cfg)
    opt = cu.adam_init(params)
    xs = jnp.asarray(rng.standard_normal((3, 2, 3, 32, 32)) * 0.5,
                     jnp.float32)
    keys = jax.random.split(jax.random.key(9), 3)

    p_seq = jax.tree.map(jnp.copy, params)
    o_seq = jax.tree.map(jnp.copy, opt)
    seq_losses = []
    for i in range(3):
        p_seq, o_seq, loss = cu.train_step(p_seq, o_seq, xs[i], keys[i], cfg)
        seq_losses.append(float(loss))

    # K=1 chunk: bitwise-level agreement with one train_step
    p1, o1, l1 = cu.train_chunk(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, opt),
        xs[:1], keys[:1], cfg)
    np.testing.assert_allclose(float(l1[0]), seq_losses[0], rtol=1e-5)

    # K=3 chunk: the two compiled graphs reassociate fp differently, so
    # agreement is to ~1e-2 after Adam amplification — the trajectories are
    # the same math (see the exact K=1 check above)
    p_chunk, o_chunk, losses = cu.train_chunk(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, opt),
        xs, keys, cfg)
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=2e-2)
    flat_seq = jax.tree_util.tree_leaves(p_seq)
    flat_chunk = jax.tree_util.tree_leaves(p_chunk)
    for a, b in zip(flat_chunk, flat_seq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.5,
                                   atol=5e-3)
