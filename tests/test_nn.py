"""nn layer/loss tests: hand-written VJPs vs autodiff + finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_linear_algebra_tpu.nn import (
    dense,
    hinge_loss,
    mse_loss,
    softmax_cross_entropy,
)


def test_dense_forward(rng):
    x = jnp.asarray(rng.standard_normal((5, 7)))
    w = jnp.asarray(rng.standard_normal((7, 3)))
    b = jnp.asarray(rng.standard_normal((3,)))
    np.testing.assert_allclose(
        np.asarray(dense(x, w, b)), np.asarray(x) @ np.asarray(w) + np.asarray(b),
        rtol=1e-12,
    )


def test_dense_vjp_matches_autodiff(rng):
    x = jnp.asarray(rng.standard_normal((5, 7)))
    w = jnp.asarray(rng.standard_normal((7, 3)))
    b = jnp.asarray(rng.standard_normal((3,)))
    g = jnp.asarray(rng.standard_normal((5, 3)))
    _, vjp = jax.vjp(dense, x, w, b)
    _, ref_vjp = jax.vjp(lambda x, w, b: x @ w + b[None, :], x, w, b)
    for got, want in zip(vjp(g), ref_vjp(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-10)


def test_softmax_cross_entropy_value_and_grad(rng):
    logits = jnp.asarray(rng.standard_normal((6, 10)))
    y = np.zeros((6, 10))
    y[np.arange(6), rng.integers(0, 10, 6)] = 1
    y = jnp.asarray(y)

    # value: -sum y log(softmax + eps)
    p = jax.nn.softmax(logits, axis=-1)
    want = float(-jnp.sum(y * jnp.log(p + 1e-15)))
    got = float(softmax_cross_entropy(logits, y))
    np.testing.assert_allclose(got, want, rtol=1e-12)

    # gradient: the fused seed p - y (model/mnist_nn.c:263-268)
    grad = jax.grad(lambda z: softmax_cross_entropy(z, y))(logits)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(p - y), rtol=1e-9,
                               atol=1e-12)


def test_softmax_cross_entropy_mask(rng):
    logits = jnp.asarray(rng.standard_normal((4, 3)))
    y = jnp.asarray(np.eye(3)[[0, 1, 2, 0]])
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    # masked value == value over the first two rows only
    want = float(softmax_cross_entropy(logits[:2], y[:2]))
    got = float(softmax_cross_entropy(logits, y, mask))
    np.testing.assert_allclose(got, want, rtol=1e-12)
    grad = jax.grad(lambda z: softmax_cross_entropy(z, y, mask))(logits)
    assert np.all(np.asarray(grad)[2:] == 0)


def test_mse_loss_grad_is_reference_seed(rng):
    pred = jnp.asarray(rng.standard_normal((3, 4)))
    target = jnp.asarray(rng.standard_normal((3, 4)))
    val = float(mse_loss(pred, target))
    np.testing.assert_allclose(val, float(jnp.sum((pred - target) ** 2)),
                               rtol=1e-12)
    # seed 2(pred - target): model/cifar_unet.c:1353-1364
    g = jax.grad(mse_loss)(pred, target)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(pred - target),
                               rtol=1e-12)


def test_hinge_loss_value_and_subgradient(rng):
    w = jnp.asarray(rng.standard_normal((7,)))
    x = jnp.asarray(rng.standard_normal((9, 7)))
    y = jnp.asarray(np.sign(rng.standard_normal(9)))
    margins = np.asarray(y) * (np.asarray(x) @ np.asarray(w))
    want = np.maximum(0, 1 - margins).sum()
    np.testing.assert_allclose(float(hinge_loss(w, x, y)), want, rtol=1e-10)

    dw = jax.grad(hinge_loss)(w, x, y)
    viol = (margins < 1).astype(np.float64)
    want_dw = -(viol * np.asarray(y)) @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(dw), want_dw, rtol=1e-10)


@pytest.mark.parametrize("loss", ["sce", "mse"])
def test_loss_finite_difference(rng, loss):
    if loss == "sce":
        y = jnp.asarray(np.eye(5)[[1, 3]])
        fn = lambda z: softmax_cross_entropy(z, y)
        z0 = jnp.asarray(rng.standard_normal((2, 5)))
    else:
        t = jnp.asarray(rng.standard_normal((2, 5)))
        fn = lambda z: mse_loss(z, t)
        z0 = jnp.asarray(rng.standard_normal((2, 5)))
    g = jax.grad(fn)(z0)
    eps = 1e-6
    for idx in [(0, 0), (1, 4)]:
        e = jnp.zeros_like(z0).at[idx].set(eps)
        fd = (fn(z0 + e) - fn(z0 - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), float(fd), rtol=1e-5,
                                   atol=1e-9)


def test_mse_and_hinge_loss_mask(rng):
    """Ragged-batch masks: masked examples contribute nothing to value or
    gradient (the module contract all losses share)."""
    from big_linear_algebra_tpu.nn.losses import hinge_loss, mse_loss

    pred = jnp.asarray(rng.standard_normal((4, 3, 2, 2)))
    target = jnp.asarray(rng.standard_normal((4, 3, 2, 2)))
    mask = jnp.asarray([1.0, 1.0, 0.0, 1.0])
    want = float(mse_loss(pred[jnp.array([0, 1, 3])], target[jnp.array([0, 1, 3])]))
    np.testing.assert_allclose(float(mse_loss(pred, target, mask)), want,
                               rtol=1e-12)
    g = jax.grad(lambda p: mse_loss(p, target, mask))(pred)
    assert np.all(np.asarray(g)[2] == 0)
    assert np.abs(np.asarray(g)[[0, 1, 3]]).max() > 0

    w = jnp.asarray(rng.standard_normal((5,)))
    x = jnp.asarray(rng.standard_normal((4, 5)))
    y = jnp.asarray(np.sign(rng.standard_normal(4)))
    want_h = float(hinge_loss(w, x[jnp.array([0, 1, 3])], y[jnp.array([0, 1, 3])]))
    np.testing.assert_allclose(float(hinge_loss(w, x, y, mask)), want_h,
                               rtol=1e-12)
    gw = jax.grad(lambda ww: hinge_loss(ww, x, y, mask))(w)
    gw_want = jax.grad(lambda ww: hinge_loss(ww, x[jnp.array([0, 1, 3])],
                                             y[jnp.array([0, 1, 3])]))(w)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_want),
                               rtol=1e-12)


def test_mse_fractional_mask_primal_vjp_agree(rng):
    """The primal and the custom-vjp forward must agree for fractional
    masks: sum(m*d^2) with seed 2*m*d (premasking d computed sum(m^2*d^2)
    only under differentiation — the same call silently changed value)."""
    from big_linear_algebra_tpu.nn.losses import mse_loss

    pred = jnp.asarray(rng.standard_normal((3, 4)))
    target = jnp.asarray(rng.standard_normal((3, 4)))
    mask = jnp.asarray([0.5, 1.0, 0.25])
    primal = mse_loss(pred, target, mask)
    val, grad = jax.value_and_grad(mse_loss)(pred, target, mask)
    np.testing.assert_allclose(np.asarray(val), np.asarray(primal),
                               rtol=1e-6)
    m = mask[:, None]
    np.testing.assert_allclose(np.asarray(grad),
                               np.asarray(2.0 * m * (pred - target)),
                               rtol=1e-6)
