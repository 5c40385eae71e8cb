"""Matmul kernel tests: C-oracle parity (float64 XLA path), Pallas interpret
parity (float32), transposed variants, and hand-written VJPs vs autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_linear_algebra_tpu.ops import matmul, matmul_nt, matmul_tn
from big_linear_algebra_tpu.ops.matmul import _pallas_mm
from tests import oracle

SHAPES = [(3, 4, 5), (64, 32, 10), (1, 7, 1), (100, 100, 100)]


@pytest.mark.skipif(not oracle.reference_available(), reason="no reference")
@pytest.mark.parametrize("mnk", SHAPES)
def test_matmul_matches_c_reference(rng, mnk):
    m, k, n = mnk
    a = rng.standard_normal((m, k))
    b = rng.standard_normal((k, n))
    np.testing.assert_allclose(
        np.asarray(matmul(a, b)), oracle.c_matmul(a, b), rtol=1e-10, atol=1e-10
    )


@pytest.mark.parametrize("mnk", SHAPES)
def test_variants_match_numpy(rng, mnk):
    m, k, n = mnk
    a = rng.standard_normal((m, k))
    b = rng.standard_normal((k, n))
    np.testing.assert_allclose(np.asarray(matmul(a, b)), a @ b, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(matmul_nt(a, b.T.copy())), a @ b, rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(matmul_tn(a.T.copy(), b)), a @ b, rtol=1e-10
    )


@pytest.mark.parametrize("variant", ["nn", "nt", "tn"])
@pytest.mark.parametrize("mnk", [(256, 384, 128), (130, 257, 200)])
def test_pallas_kernel_interpret_parity(rng, variant, mnk):
    """The Pallas kernel itself (interpret mode on CPU), incl. non-aligned
    shapes exercising the zero-pad + slice path."""
    m, k, n = mnk
    a64 = rng.standard_normal((m, k))
    b64 = rng.standard_normal((k, n))
    expected = a64 @ b64
    if variant == "nn":
        pa, pb = a64, b64
    elif variant == "nt":
        pa, pb = a64, b64.T.copy()
    else:
        pa, pb = a64.T.copy(), b64
    out = _pallas_mm(
        jnp.asarray(pa, jnp.float32),
        jnp.asarray(pb, jnp.float32),
        variant,
        (128, 128, 128),
        jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("fn,shapes", [
    (matmul, ((17, 23), (23, 9))),
    (matmul_nt, ((17, 23), (9, 23))),
    (matmul_tn, ((23, 17), (23, 9))),
])
def test_hand_vjp_matches_autodiff(rng, fn, shapes):
    a = jnp.asarray(rng.standard_normal(shapes[0]))
    b = jnp.asarray(rng.standard_normal(shapes[1]))
    g = jnp.asarray(rng.standard_normal(jax.eval_shape(fn, a, b).shape))

    def ref_fn(a, b):
        if fn is matmul:
            return a @ b
        if fn is matmul_nt:
            return a @ b.T
        return a.T @ b

    _, vjp = jax.vjp(fn, a, b)
    _, ref_vjp = jax.vjp(ref_fn, a, b)
    for got, want in zip(vjp(g), ref_vjp(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-10)


def test_shape_mismatch_raises(rng):
    with pytest.raises(ValueError):
        matmul(jnp.zeros((3, 4)), jnp.zeros((5, 6)))


def test_fused_bias_relu_epilogue(rng):
    """bias+ReLU fused into the kernel epilogue must match the composed
    ops, including on padded (non-tile-aligned) shapes, f32 and bf16."""
    import jax.numpy as jnp

    from big_linear_algebra_tpu.ops.matmul import _dispatch

    for m, k, n, dtype in [(200, 300, 170, jnp.float32),
                           (256, 512, 384, jnp.bfloat16)]:
        x = jnp.asarray(rng.standard_normal((m, k)), dtype)
        w = jnp.asarray(rng.standard_normal((k, n)), dtype)
        b = jnp.asarray(rng.standard_normal((n,)), dtype)
        fused = _dispatch(x, w, "nn", None, jnp.float32,
                          bias=b, activation="relu")
        want = jnp.maximum(
            _dispatch(x, w, "nn", None, jnp.float32)
            + b[None, :].astype(jnp.float32), 0.0)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_dense_fused_relu_gradients(rng):
    """dense(..., 'relu') hand VJP == autodiff of relu(x@w+b)."""
    import jax
    import jax.numpy as jnp

    from big_linear_algebra_tpu.nn.dense import dense

    x = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((96, 80)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((80,)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((64, 80)), jnp.float32)

    out, vjp = jax.vjp(lambda x, w, b: dense(x, w, b, "relu"), x, w, b)
    ref_out, ref_vjp = jax.vjp(
        lambda x, w, b: jnp.maximum(x @ w + b[None, :], 0.0), x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-6)
    for got, want in zip(vjp(g), ref_vjp(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
