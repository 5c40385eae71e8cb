"""im2col/col2im + GEMM conv path vs the C oracle and the XLA conv path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_linear_algebra_tpu.nn.conv import conv2d, out_size
from big_linear_algebra_tpu.nn.conv_pallas import (
    col2im,
    conv2d_im2col,
    im2col,
    kernels_to_matrix,
)
from tests import oracle

needs_ref = pytest.mark.skipif(
    not oracle.reference_available(), reason="no reference"
)

CASES = [(3, 8, 8, 4, 3, 1), (2, 9, 7, 5, 3, 2), (4, 8, 8, 8, 1, 1)]


@needs_ref
@pytest.mark.parametrize("case", CASES)
def test_im2col_matches_c_reference(rng, case):
    c, h, w, f, k, stride = case
    x = rng.standard_normal((c, h, w))
    ours = np.asarray(im2col(jnp.asarray(x)[None], k, stride))[0]
    theirs = oracle.c_im2col(x, k, stride)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-12)


@needs_ref
def test_col2im_matches_c_reference_stride1(rng):
    c, h, w, k = 3, 8, 8, 3
    cols = rng.standard_normal((h * w, k * k * c))
    ours = np.asarray(col2im(jnp.asarray(cols)[None], (1, c, h, w), k, 1))[0]
    theirs = oracle.c_col2im(cols, (c, h, w), k, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("case", CASES)
def test_matches_xla_conv_path(rng, case):
    c, h, w, f, k, stride = case
    x = jnp.asarray(rng.standard_normal((2, c, h, w)))
    kernels = jnp.asarray(rng.standard_normal((f, c, k, k)))
    np.testing.assert_allclose(
        np.asarray(conv2d_im2col(x, kernels, stride)),
        np.asarray(conv2d(x, kernels, stride)),
        rtol=1e-9, atol=1e-10,
    )


@pytest.mark.parametrize("case", CASES)
def test_vjp_matches_xla_conv_path(rng, case):
    c, h, w, f, k, stride = case
    x = jnp.asarray(rng.standard_normal((2, c, h, w)))
    kernels = jnp.asarray(rng.standard_normal((f, c, k, k)))
    g = jnp.asarray(rng.standard_normal(
        (2, f, out_size(h, stride), out_size(w, stride))))
    _, vjp_a = jax.vjp(lambda a, b: conv2d_im2col(a, b, stride), x, kernels)
    _, vjp_b = jax.vjp(lambda a, b: conv2d(a, b, stride), x, kernels)
    for got, want in zip(vjp_a(g), vjp_b(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-8, atol=1e-9)


def test_kernels_to_matrix_order(rng):
    kernels = rng.standard_normal((2, 3, 2, 2))
    kmat = np.asarray(kernels_to_matrix(jnp.asarray(kernels)))
    # row index = c*k*k + i*k + j (lib/conv.c:138-155)
    assert kmat.shape == (12, 2)
    assert kmat[0, 0] == kernels[0, 0, 0, 0]
    assert kmat[3, 1] == kernels[1, 0, 1, 1]
    assert kmat[4, 0] == kernels[0, 1, 0, 0]


def test_conv2d_packed_matches_xla(rng):
    """Batch-packed implicit-GEMM conv (B·H·W on the MXU lane axis —
    VERDICT r2 #1, the small-resolution regime) fwd+bwd parity vs the
    production conv2d, incl. non-square maps and the cross-example roll
    boundary (the flat roll may wrap into a neighbouring example; the
    validity mask must zero exactly those reads)."""
    from big_linear_algebra_tpu.nn.conv_implicit import conv2d_packed

    for (b, c, h, w, f, k) in [(4, 8, 8, 8, 16, 3), (3, 4, 5, 7, 8, 5),
                               (16, 8, 4, 4, 8, 3)]:
        x = jnp.asarray(rng.standard_normal((b, c, h, w)), jnp.float32)
        kr = jnp.asarray(rng.standard_normal((f, c, k, k)) * 0.2, jnp.float32)
        g = jnp.asarray(rng.standard_normal((b, f, h, w)), jnp.float32)
        out, vjp = jax.vjp(conv2d_packed, x, kr)
        want, vjp_ref = jax.vjp(lambda x, kr: conv2d(x, kr, 1), x, kr)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        for got, ref in zip(vjp(g), vjp_ref(g)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)


def test_conv2d_implicit_matches_xla(rng):
    """Implicit-GEMM Pallas conv (k² shifted VMEM GEMMs) fwd+bwd parity vs
    the production conv2d at U-Net-like shapes, incl. boundary handling."""
    import jax
    import jax.numpy as jnp

    from big_linear_algebra_tpu.nn.conv import conv2d
    from big_linear_algebra_tpu.nn.conv_implicit import conv2d_implicit

    for (b, c, h, w, f, k) in [(2, 8, 8, 8, 16, 3), (1, 4, 5, 7, 8, 5)]:
        x = jnp.asarray(rng.standard_normal((b, c, h, w)), jnp.float32)
        kr = jnp.asarray(rng.standard_normal((f, c, k, k)) * 0.2, jnp.float32)
        g = jnp.asarray(rng.standard_normal((b, f, h, w)), jnp.float32)
        out, vjp = jax.vjp(conv2d_implicit, x, kr)
        want, vjp_ref = jax.vjp(lambda x, kr: conv2d(x, kr, 1), x, kr)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        for got, ref in zip(vjp(g), vjp_ref(g)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)
