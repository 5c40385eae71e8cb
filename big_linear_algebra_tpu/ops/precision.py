"""The library-wide MXU input-precision policy, in one place.

bfloat16 operands take the MXU's native path (peak throughput); float32
operands use ``Precision.HIGHEST`` so XLA never silently truncates them to
bf16 (the TPU default for f32 matmuls/convs). Everything that feeds the MXU
— the Pallas matmul (ops/matmul.py), convolutions (nn/conv.py), attention
einsums (nn/attention.py), and model-level matmuls — routes through this
helper so the policy can only change in one place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mxu_precision(dtype) -> jax.lax.Precision:
    if jnp.dtype(dtype) == jnp.bfloat16:
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST
