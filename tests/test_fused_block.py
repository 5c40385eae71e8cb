"""Fused resnet-block Pallas kernel (nn/fused_block.py) vs the XLA
composition (VERDICT r3 #2).

Reference block: ``_forward_resnet``, model/cifar_unet.c:1044-1072.
Off-TPU the kernel runs in interpret mode with caller-supplied dropout
bits; the real-TPU in-kernel PRNG path shares every line but the bit
source (fused_block._dropout).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_linear_algebra_tpu.models import cifar_unet as cu
from big_linear_algebra_tpu.nn.conv import conv2d
from big_linear_algebra_tpu.nn.fused_block import fused_resnet_block, supported
from big_linear_algebra_tpu.nn.norm import group_norm
from big_linear_algebra_tpu.ops import relu


def _ref_block(x, td, w1, w2, w3, gsz):
    h = relu(group_norm(x, gsz))
    h = conv2d(h, w1, 1)
    h = h + td[:, :, None, None]
    h = relu(group_norm(h, gsz))
    h = conv2d(h, w2, 1)
    res = x if w3 is None else conv2d(x, w3, 1)
    return h + res


def _inputs(rng, b=4, c=32, f=32, hw=4, with_w3=False):
    x = jnp.asarray(rng.standard_normal((b, c, hw, hw)), jnp.float32)
    td = jnp.asarray(rng.standard_normal((b, f)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((f, c, 3, 3)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, f, 3, 3)) * 0.05, jnp.float32)
    w3 = (jnp.asarray(rng.standard_normal((f, c, 1, 1)) * 0.1, jnp.float32)
          if with_w3 else None)
    return x, td, w1, w2, w3


@pytest.mark.parametrize("with_w3,c", [(False, 32), (True, 64)])
def test_fused_forward_matches_xla(rng, with_w3, c):
    x, td, w1, w2, w3 = _inputs(rng, c=c, with_w3=with_w3)
    out = fused_resnet_block(x, td, w1, w2, w3, 0, 8, 0.0, False)
    want = _ref_block(x, td, w1, w2, w3, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_w3,c", [(False, 32), (True, 64)])
def test_fused_grads_match_xla(rng, with_w3, c):
    """All five gradient outputs of the recompute-in-backward kernel vs
    autodiff of the XLA composition (dropout off so the paths are the
    same function)."""
    x, td, w1, w2, w3 = _inputs(rng, c=c, with_w3=with_w3)
    argnums = (0, 1, 2, 3, 4) if with_w3 else (0, 1, 2, 3)

    def f_fused(*a):
        a = a + (None,) if not with_w3 else a
        return jnp.sum(jnp.sin(fused_resnet_block(*a, 0, 8, 0.0, True)))

    def f_ref(*a):
        a = a + (None,) if not with_w3 else a
        return jnp.sum(jnp.sin(_ref_block(*a, 8)))

    args = (x, td, w1, w2) + ((w3,) if with_w3 else ())
    g = jax.grad(f_fused, argnums=argnums)(*args)
    gw = jax.grad(f_ref, argnums=argnums)(*args)
    names = ("dx", "dtd", "dw1", "dw2", "dw3")
    for name, a, b in zip(names, g, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_fused_dropout_deterministic_and_consistent(rng):
    """Same seed → same mask; different seed → different mask; the
    backward regenerates the forward's exact mask (finite differences of
    the fused op itself agree with its analytic grad)."""
    x, td, w1, w2, w3 = _inputs(rng, c=64, with_w3=True)
    o1 = fused_resnet_block(x, td, w1, w2, w3, 123, 8, 0.5, True)
    o2 = fused_resnet_block(x, td, w1, w2, w3, 123, 8, 0.5, True)
    o3 = fused_resnet_block(x, td, w1, w2, w3, 77, 8, 0.5, True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 1e-3

    def f(w):
        return jnp.sum(fused_resnet_block(x, td, w, w2, w3, 123, 8, 0.5,
                                          True))

    gdrop = jax.grad(f)(w1)
    dirn = jnp.zeros_like(w1).at[0, 0, 1, 1].set(1.0)
    eps = 1e-3
    fd = (f(w1 + eps * dirn) - f(w1 - eps * dirn)) / (2 * eps)
    # f32 central differences over a 2048-element sum carry ~1% noise; a
    # backward that regenerated a DIFFERENT mask would be off by O(100%)
    np.testing.assert_allclose(float(jnp.vdot(gdrop, dirn)), float(fd),
                               rtol=5e-2)


def test_fused_dropout_rate_statistics(rng):
    """The kept fraction of a positive constant input's second activation
    tracks 1 − rate (the threshold rule is bits ≥ rate·2³²)."""
    x, td, w1, w2, w3 = _inputs(rng, b=8, c=32, hw=8)
    on = np.asarray(fused_resnet_block(x, td, w1, w2, None, 5, 8, 0.0,
                                       True))
    off = np.asarray(fused_resnet_block(x, td, w1, w2, None, 5, 8, 0.9,
                                        True))
    # with rate 0.9 the conv_2 input is 10% density × 10 scale: the output
    # must differ from the rate-0 one almost everywhere
    assert np.abs(on - off).max() > 1e-3


def test_supported_gates():
    assert supported((4, 32, 4, 4), 32, 32, 3, 8, jnp.float32)
    assert not supported((4, 32, 4, 4), 32, 32, 4, 8, jnp.float32)  # even k
    assert not supported((4, 30, 4, 4), 30, 32, 3, 8, jnp.float32)  # ragged
    assert not supported((4, 32, 4, 4), 32, 32, 3, 8, jnp.float64)  # f64
    # VMEM blow-up: reference 32² top resolution at batch 16 must NOT claim
    assert not supported((512, 256, 32, 32), 256, 256, 3, 32, jnp.bfloat16)


def test_model_dispatch_parity(rng):
    """cu.forward with fused_block=True equals the XLA path (inference —
    dropout off, so the dispatched blocks compute the same function) and
    a fused train_step stays finite and learns."""
    cfg = dataclasses.replace(cu.TINY, fused_block=True)
    params = cu.init_params(jax.random.key(0), cu.TINY)
    x = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    t = jnp.asarray([3, 5])
    out_f = cu.forward(params, x, t, cfg)
    out_x = cu.forward(params, x, t, cu.TINY)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=2e-4, atol=2e-4)

    opt = cu.adam_init(params)
    x0 = jnp.asarray(rng.standard_normal((2, 3, 32, 32)) * 0.5, jnp.float32)
    key = jax.random.key(2)
    losses = []
    for _ in range(40):
        key, k = jax.random.split(key)
        params, opt, loss = cu.train_step(params, opt, x0, k, cfg)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), losses
