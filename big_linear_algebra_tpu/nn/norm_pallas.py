"""Fused single-pass GroupNorm(+ReLU) Pallas VPU kernel.

The reference's group_norm makes three HBM passes (mean, variance, normalize
— lib/norm.c:13-48) and the U-Net always follows it with a ReLU
(model/cifar_unet.c:1046-1047). This kernel does all of it in one VMEM
residency per group row: load once, compute mean/var/normalize/ReLU, store
once. ``nn/norm.py`` remains the general path (ragged groups, f64,
reference-compat mode); this fused kernel requires channels divisible by
group_size and ≤f32 dtypes.

The VJP reuses the standard GN backward through the ReLU mask (bandwidth-
bound; XLA fuses it) — the forward fusion is where the HBM passes are saved.

Measured reality check (v5e, (16,128,32,32) f32): the kernel is numerically
exact (1e-6 vs the composed path) but ~2.4× *slower* end-to-end, because the
(B,C,H,W) → (rows, gs·H·W) flattening is a real layout change (an extra HBM
round trip) while XLA fuses the composed group_norm→relu with no reshape at
all. Kept as an explicitly-opt-in capability; ``nn/norm.py`` + ``relu``
remains the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from big_linear_algebra_tpu.nn.norm import group_norm
from big_linear_algebra_tpu.ops.activations import relu
from big_linear_algebra_tpu.ops.pallas_utils import round_up, use_interpret

_ROW_BLOCK = 8  # sublane tile for f32


def _gn_relu_kernel(x_ref, o_ref, *, eps, fuse_relu, n_valid):
    x = x_ref[:].astype(jnp.float32)              # (8, L)
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=1, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if fuse_relu:
        out = jnp.maximum(out, 0.0)
    o_ref[:] = out.astype(o_ref.dtype)


def _fused_forward(x, group_size, eps, fuse_relu):
    import math

    *lead, c, h, w = x.shape
    g = c // group_size
    rows = math.prod(lead) * g
    flat = x.reshape(rows, group_size * h * w)
    rows_p = round_up(rows, _ROW_BLOCK)
    if rows_p != rows:
        flat = jnp.pad(flat, ((0, rows_p - rows), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_gn_relu_kernel, eps=eps, fuse_relu=fuse_relu,
                          n_valid=rows),
        grid=(rows_p // _ROW_BLOCK,),
        in_specs=[pl.BlockSpec((_ROW_BLOCK, flat.shape[1]),
                               lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_ROW_BLOCK, flat.shape[1]),
                               lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(flat.shape, x.dtype),
        interpret=use_interpret(),
    )(flat)
    return out[:rows].reshape(*lead, c, h, w)


def _supported(x, group_size):
    return (x.shape[-3] % group_size == 0
            and jnp.dtype(x.dtype).itemsize <= 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def group_norm_relu(x: jax.Array, group_size: int,
                    eps: float = 1e-8) -> jax.Array:
    """relu(group_norm(x)) fused into one VMEM pass where supported;
    falls back to the general composed path otherwise."""
    if _supported(x, group_size):
        return _fused_forward(x, group_size, eps, True)
    return relu(group_norm(x, group_size, eps))


def _gnr_fwd(x, group_size, eps):
    return group_norm_relu(x, group_size, eps), x


def _gnr_bwd(group_size, eps, x, g):
    # recompute normalized value; mask ReLU; standard GN backward
    def composed(x_):
        return relu(group_norm(x_, group_size, eps))

    _, vjp = jax.vjp(composed, x)
    return (vjp(g)[0],)


group_norm_relu.defvjp(_gnr_fwd, _gnr_bwd)
