"""Attention tests: dense reference math, flash Pallas kernel parity, VJPs."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_linear_algebra_tpu.nn.attention import (
    attention,
    attention_dense,
    flash_attention,
    self_attention_block,
)


def _np_attention(q, k, v):
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = np.einsum("bnd,bmd->bnm", q, k) * scale
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bnm,bmd->bnd", p, v)


def test_dense_forward(rng):
    q = rng.standard_normal((2, 7, 5))
    k = rng.standard_normal((2, 9, 5))
    v = rng.standard_normal((2, 9, 5))
    out = np.asarray(attention_dense(*map(jnp.asarray, (q, k, v))))
    np.testing.assert_allclose(out, _np_attention(q, k, v), rtol=1e-9,
                               atol=1e-12)


def test_dense_vjp_matches_autodiff(rng):
    q, k, v = (jnp.asarray(rng.standard_normal((2, 6, 4))) for _ in range(3))
    g = jnp.asarray(rng.standard_normal((2, 6, 4)))

    def plain(q, k, v):
        s = jnp.einsum("bnd,bmd->bnm", q, k) / math.sqrt(q.shape[-1])
        return jnp.einsum("bnm,bmd->bnd", jax.nn.softmax(s, axis=-1), v)

    _, vjp = jax.vjp(attention_dense, q, k, v)
    _, ref_vjp = jax.vjp(plain, q, k, v)
    for got, want in zip(vjp(g), ref_vjp(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("n,d,bq,bk", [
    (256, 16, 128, 128),
    (300, 16, 128, 128),   # non-aligned N → padding + masking
    (256, 64, 128, 256),
])
def test_flash_forward_matches_dense(rng, n, d, bq, bk):
    q = jnp.asarray(rng.standard_normal((2, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, n, d)), jnp.float32)
    out = np.asarray(flash_attention(q, k, v, bq, bk))
    want = np.asarray(attention_dense(q, k, v))
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("n", [256, 300])
def test_flash_backward_matches_dense(rng, n):
    q = jnp.asarray(rng.standard_normal((1, n, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, n, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, n, 16)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, n, 16)), jnp.float32)
    _, vjp_f = jax.vjp(lambda *a: flash_attention(*a, 128, 128), q, k, v)
    _, vjp_d = jax.vjp(attention_dense, q, k, v)
    for got, want in zip(vjp_f(g), vjp_d(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-5)


def test_self_attention_block_shape_and_grad(rng):
    c, kd = 12, 4
    params = {
        "q": jnp.asarray(rng.standard_normal((c, kd)), jnp.float32) * 0.1,
        "k": jnp.asarray(rng.standard_normal((c, kd)), jnp.float32) * 0.1,
        "v": jnp.asarray(rng.standard_normal((c, kd)), jnp.float32) * 0.1,
        "w": jnp.asarray(rng.standard_normal((kd, c)), jnp.float32) * 0.1,
        "b": jnp.zeros((c,), jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((2, c, 4, 4)), jnp.float32)
    out = self_attention_block(x, params)
    assert out.shape == x.shape
    grads = jax.grad(
        lambda p: jnp.sum(self_attention_block(x, p) ** 2))(params)
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
        assert np.abs(np.asarray(leaf)).max() > 0


def test_flash_nondividing_blocks_lcm_padding(rng):
    """ADVICE r1: block_q=384, block_k=256, n=300 — max-based padding would
    give n_pad=384 and silently drop the 384→512 tail; lcm padding (768)
    keeps every key."""
    n, d = 300, 16
    q = jnp.asarray(rng.standard_normal((1, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, n, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, n, d)), jnp.float32)
    out, vjp_f = jax.vjp(lambda *a: flash_attention(*a, 384, 256), q, k, v)
    want, vjp_d = jax.vjp(attention_dense, q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    for got, wantg in zip(vjp_f(g), vjp_d(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(wantg),
                                   rtol=3e-4, atol=3e-5)


def test_flash_backward_two_pass_fallback(rng, monkeypatch):
    """The long-sequence two-pass backward (used when the fused kernel's
    resident rows exceed the VMEM budget) must match dense too."""
    import importlib

    # (the nn package re-exports the `attention` *function* under the same
    # name, which shadows the submodule in plain `import ... as` syntax)
    att = importlib.import_module("big_linear_algebra_tpu.nn.attention")
    monkeypatch.setattr(att, "_BWD_FUSED_VMEM_BUDGET", 0)
    n = 300
    q = jnp.asarray(rng.standard_normal((1, n, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, n, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, n, 16)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, n, 16)), jnp.float32)
    _, vjp_f = jax.vjp(lambda *a: flash_attention(*a, 128, 128), q, k, v)
    _, vjp_d = jax.vjp(attention_dense, q, k, v)
    for got, want in zip(vjp_f(g), vjp_d(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("n,bq,bk", [
    (256, 128, 128),
    (300, 128, 128),   # non-aligned N → padding + masking in-stream
    (300, 384, 256),   # lcm padding: a fully-padded tail k/q block exists
])
def test_flash_streaming_matches_dense(rng, n, bq, bk):
    """stream=True forces the streaming-grid kernels (carried scratch
    state, k/v blocks through the grid) — the long-N path that replaces the
    old VMEM-budget ValueError. Fwd and all three grads must match dense."""
    d = 16
    q = jnp.asarray(rng.standard_normal((1, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, n, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, n, d)), jnp.float32)
    out, vjp_f = jax.vjp(
        lambda *a: flash_attention(*a, bq, bk, stream=True), q, k, v)
    want, vjp_d = jax.vjp(attention_dense, q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    for got, wantg in zip(vjp_f(g), vjp_d(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(wantg),
                                   rtol=3e-4, atol=3e-5)


def test_flash_over_budget_selects_streaming():
    """Sequences whose K/V rows exceed the VMEM budget trace through the
    streaming path instead of raising (VERDICT r2: remove the N-cap) —
    N=64k single-chip f32 is legal; so is the 24k backward."""
    n, d = 65536, 128
    spec = jax.ShapeDtypeStruct((1, n, d), jnp.float32)
    out = jax.eval_shape(flash_attention, spec, spec, spec)
    assert out.shape == (1, n, d)

    def bwd(q, k, v):
        return jax.grad(lambda a: jnp.sum(flash_attention(a, k, v)))(q)

    spec_b = jax.ShapeDtypeStruct((1, 24576, 128), jnp.float32)
    assert jax.eval_shape(bwd, spec_b, spec_b, spec_b).shape == spec_b.shape


def test_attention_cross_shapes_use_dense(rng):
    """Mismatched q/k lengths must route to the dense path (the flash
    kernel's validity mask comes from q alone and would silently attend
    phantom zero keys) and flash itself must reject them loudly."""
    q = jnp.asarray(rng.standard_normal((1, 2048, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1024, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1024, 64)), jnp.float32)
    got = np.asarray(attention(q, k, v))
    want = np.asarray(attention_dense(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError, match="self-attention-shaped"):
        jax.eval_shape(flash_attention,
                       jax.ShapeDtypeStruct((1, 2048, 64), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1024, 64), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1024, 64), jnp.float32))
