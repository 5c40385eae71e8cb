"""Dense (fully-connected) layer with the reference's hand-derived backward.

The reference computes ``z = W @ x + b`` on column-major batches
(model/mnist_nn.c:221-233) and backprops by hand:
``dW = dz @ actᵀ``, ``db = col_sum(dz)``, ``dx = Wᵀ @ dz``
(model/mnist_nn.c:259-293, with the corrected col-sum — SURVEY.md §7.6).

TPU-native design: batch-major ``z = x @ W + b`` with ``x``: (batch, in),
``W``: (in, out) — the batch dimension leads, so data-parallel sharding of the
batch axis and MXU tiling both fall out naturally. The VJP is explicit
(``jax.custom_vjp``) and routes both backward GEMMs through the transposed
Pallas matmul variants so no transpose is materialized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from big_linear_algebra_tpu.ops.matmul import _dispatch


@jax.custom_vjp
def dense(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """``x @ w + b``. x: (B, in), w: (in, out), b: (out,)."""
    return _dispatch(x, w, "nn", None, None) + b[None, :]


def _dense_fwd(x, w, b):
    return dense(x, w, b), (x, w)


def _dense_bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    dx = _dispatch(g, w, "nt", None, x.dtype)      # g @ wᵀ
    dw = _dispatch(x, g, "tn", None, w.dtype)      # xᵀ @ g
    db = jnp.sum(g, axis=0)                        # col-sum over the batch
    return dx, dw, db


dense.defvjp(_dense_fwd, _dense_bwd)
