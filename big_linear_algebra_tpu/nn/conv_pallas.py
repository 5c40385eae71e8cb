"""Explicit im2col → Pallas-GEMM convolution (the reference's formulation).

The reference computes conv as ``_im2col`` → kernel reshape → GEMM → reshape
(lib/conv.c:205-212) and its backward as two GEMMs + ``_col2im``
(lib/conv.c:214-227). ``nn/conv.py`` is the production path (XLA implicit
GEMM); this module is the same math materialized the reference's way, with
the GEMMs on the library's Pallas MXU matmul — a structural mirror of the
reference for parity work. On hardware it is slower than the implicit-GEMM
path at U-Net shapes (the im2col patches tensor makes an HBM round trip that
implicit GEMM avoids entirely), which is exactly why ``nn/conv.py`` does not
materialize im2col; keep this for parity/debugging.

- ``im2col``: patch extraction with the reference's column ordering
  (c·k² + i·k + j, lib/conv.c:59-74), via lax.conv_general_dilated_patches.
- ``col2im``: the scatter-add inverse (lib/conv.c:80-136) with the *intended*
  output-grid iteration (the reference's loop is out-of-bounds for stride>1,
  SURVEY.md §7.14) — expressed as the transpose conv of patch extraction.
- ``conv2d_im2col``: custom-VJP conv equal to nn/conv.py's conv2d.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from big_linear_algebra_tpu.nn.conv import out_size, same_padding
from big_linear_algebra_tpu.ops.matmul import _dispatch


def im2col(x: jax.Array, kernel_size: int, stride: int) -> jax.Array:
    """x: (B, C, H, W) → (B, oh·ow, k·k·C) patches with the reference's
    column order (channel-major, then kernel row, then kernel col)."""
    b, c, h, w = x.shape
    k = kernel_size
    pad = (same_padding(h, k, stride), same_padding(w, k, stride))
    # patches: (B, C*k*k, oh, ow) with feature order (c, ki, kj).
    # Explicit precision: patch extraction lowers to a conv and the TPU
    # default would bf16-truncate f32 activations before the GEMM,
    # breaking the "numerically equal to conv2d" contract.
    from big_linear_algebra_tpu.ops.precision import mxu_precision
    patches = jax.lax.conv_general_dilated_patches(
        x, (k, k), (stride, stride), pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=mxu_precision(x.dtype))
    oh, ow = out_size(h, stride), out_size(w, stride)
    return patches.reshape(b, c * k * k, oh * ow).transpose(0, 2, 1)


def col2im(cols: jax.Array, x_shape, kernel_size: int,
           stride: int) -> jax.Array:
    """(B, oh·ow, k·k·C) → (B, C, H, W) scatter-add (intended ``_col2im``
    semantics). Expressed as the vjp of patch extraction (exact transpose)."""
    _, vjp = jax.vjp(
        lambda x: im2col(x, kernel_size, stride),
        jnp.zeros(x_shape, cols.dtype))
    return vjp(cols)[0]


def kernels_to_matrix(kernels: jax.Array) -> jax.Array:
    """(F, C, k, k) → (k·k·C, F) with the reference row order
    (c·k² + i·k + j — ``_reshape_kernels_matrix``, lib/conv.c:138-155)."""
    f = kernels.shape[0]
    return kernels.reshape(f, -1).T


def _fwd(x, kernels, stride):
    b, c, h, w = x.shape
    f, _, k, _ = kernels.shape
    cols = im2col(x, k, stride)                      # (B, P, k²C)
    kmat = kernels_to_matrix(kernels)                # (k²C, F)
    p = cols.shape[1]
    prod = _dispatch(cols.reshape(b * p, -1), kmat, "nn", None, x.dtype)
    oh, ow = out_size(h, stride), out_size(w, stride)
    return prod.reshape(b, oh, ow, f).transpose(0, 3, 1, 2), cols


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv2d_im2col(x: jax.Array, kernels: jax.Array,
                  stride: int = 1) -> jax.Array:
    """Reference-formulation conv: im2col → Pallas GEMM → reshape.
    Numerically equal to nn/conv.py's conv2d."""
    return _fwd(x, kernels, stride)[0]


def _conv_fwd(x, kernels, stride):
    out, cols = _fwd(x, kernels, stride)
    return out, (x.shape, kernels, cols)


def _conv_bwd(stride, res, g):
    x_shape, kernels, cols = res
    f, c, k, _ = kernels.shape
    b = g.shape[0]
    # del_Q: (B, P, F) (the intended reshape direction — SURVEY.md §7.1)
    dq = g.transpose(0, 2, 3, 1).reshape(b, -1, f).astype(cols.dtype)
    p = dq.shape[1]
    # del_K = im2colᵀ @ del_Q  (lib/conv.c:221-223), batched over B
    dk_mat = _dispatch(cols.reshape(b * p, -1), dq.reshape(b * p, f),
                       "tn", None, kernels.dtype)      # (k²C, F)
    dk = dk_mat.T.reshape(f, c, k, k)
    # del_X = col2im(del_Q @ Kᵀ)  (lib/conv.c:225-226)
    kmat = kernels_to_matrix(kernels)                  # (k²C, F)
    dcols = _dispatch(dq.reshape(b * p, f), kmat, "nt", None, cols.dtype)
    dx = col2im(dcols.reshape(b, p, -1), x_shape, k, stride)
    return dx, dk


conv2d_im2col.defvjp(_conv_fwd, _conv_bwd)
