"""Sequence-parallel ring attention over an ICI mesh axis.

The reference's attention is single-host, full O(N²) with the N×N scores
materialized (model/cifar_unet.c:999-1022, SURVEY.md §5 "Long-context").
This module provides the TPU-native scaling path: shard the sequence axis
over a mesh axis, keep q local, and rotate k/v blocks around the ring with
``jax.lax.ppermute`` while accumulating blockwise online-softmax partials —
the same math as the flash kernel (nn/attention.py), distributed. Comm cost
is P−1 permutes of the local k/v shard over ICI, fully overlappable with the
per-block GEMMs by XLA's latency-hiding scheduler.

Gradients flow through ``ppermute`` via JAX autodiff (collective transpose);
the per-block math reuses the numerically-stable online-softmax combination,
so backward is the standard ring-attention recomputation.

Single-head (B, N, d) shapes like nn/attention.py; N must divide evenly by
the axis size.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attention_partials(q, k, v, scale):
    """One (local q, remote k/v) block: returns (m, l, acc) partials."""
    s = jnp.einsum("bnd,bmd->bnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bnm,bmd->bnd", p, v.astype(p.dtype))
    return m, l, acc


def _combine(m1, l1, acc1, m2, l2, acc2):
    """Numerically-stable combination of two online-softmax partials."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    return m, l1 * a1 + l2 * a2, acc1 * a1 + acc2 * a2


def _ring_attention_local(q, k, v, axis_name: str):
    """Runs inside shard_map: q/k/v are the local sequence shards."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    n_dev = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    m, l, acc = _block_attention_partials(q, k, v, scale)

    def body(_, carry):
        m, l, acc, k, v = carry
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        m2, l2, acc2 = _block_attention_partials(q, k, v, scale)
        m, l, acc = _combine(m, l, acc, m2, l2, acc2)
        return m, l, acc, k, v

    # Python loop (static trip count) so XLA can overlap permute & compute
    carry = (m, l, acc, k, v)
    for i in range(n_dev - 1):
        carry = body(i, carry)
    m, l, acc, _, _ = carry
    return (acc / l).astype(q.dtype)


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, mesh: Mesh,
                   axis_name: str = "seq") -> jax.Array:
    """Sequence-sharded attention: q/k/v (B, N, d) with N sharded over
    ``axis_name``. Exact (up to fp) match of attention_dense."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec = P(None, axis_name, None)
    fn = shard_map(
        functools.partial(_ring_attention_local, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    sharding = NamedSharding(mesh, spec)
    q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))
    return fn(q, k, v)
