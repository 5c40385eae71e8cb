"""Sequence-parallel ring attention over an ICI mesh axis.

The reference's attention is single-host, full O(N²) with the N×N scores
materialized (model/cifar_unet.c:999-1022, SURVEY.md §5 "Long-context").
This module provides the TPU-native scaling path: shard the sequence axis
over a mesh axis, keep q local, and rotate k/v blocks around the ring with
``jax.lax.ppermute`` — the distributed form of the flash kernel
(nn/attention.py), and it literally reuses it:

- **forward**: each rotation runs the flash forward kernel on (local q,
  visiting k/v) producing a block (o_r, lse_r); partials are merged with the
  numerically-stable logsumexp combination. The (N/P)² score block lives
  only in the kernel's VMEM tiles — never in HBM.
- **backward**: an explicit VJP (the library-wide stance — autodiff is a
  test oracle only). Each rotation calls the fused flash backward kernel
  with the *global* (o, lse) residuals and the visiting k/v block, which
  yields exactly that block's (dq, dk, dv) contributions; dk/dv accumulate
  in buffers that travel around the ring *with* their k/v block and take
  one final hop home.

Comm cost is P−1 permutes of the local k/v shard over ICI forward (P
backward: P−1 in-loop hops + the final homing hop), overlappable with the
per-block kernels by XLA's latency-hiding scheduler.

Single-head (B, N, d) shapes like nn/attention.py; N must divide evenly by
the axis size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from big_linear_algebra_tpu.nn.attention import (_flash_bwd_padded,
                                                 _flash_bwd_prepare,
                                                 _flash_fwd, _pad_nd)


def _ring_blocks(n_local: int) -> tuple[int, int]:
    """Flash block sizes for a local shard of n_local rows.

    The kernel pads n_local to lcm(bq, bk), so unequal blocks are only safe
    when they divide the shard exactly — (512, 1024) on a 600-row shard
    would pad to lcm = 38,400 rows (64× wasted FLOPs and a VMEM-guard
    trip). Otherwise use equal blocks: lcm == block, padding < one block."""
    if n_local % 1024 == 0:
        return 512, 1024  # measured-best single-chip blocks, zero padding
    # Round up to the 8-row TPU sublane tile: Mosaic rejects misaligned
    # block shapes on hardware (the CPU interpret mode would not catch it).
    # _pad_nd already masks the n_pad - n_local tail rows.
    b = -(-min(512, max(8, n_local)) // 8) * 8
    return b, b


def _merge(o, lse, o_r, lse_r):
    """Stable merge of two flash partials (o f32, lse natural-log domain)."""
    new_lse = jnp.logaddexp(lse, lse_r)
    o = (o * jnp.exp(lse - new_lse)[..., None]
         + o_r.astype(jnp.float32) * jnp.exp(lse_r - new_lse)[..., None])
    return o, new_lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ring_flash(q, k, v, axis_name):
    return _ring_flash_fwd(q, k, v, axis_name)[0]


def _ring_flash_fwd(q, k, v, axis_name):
    n_dev = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bq, bk = _ring_blocks(q.shape[1])

    o_r, lse = _flash_fwd(q, k, v, bq, bk)
    o = o_r.astype(jnp.float32)
    kr, vr = k, v
    # Python loop (static trip count) so XLA can overlap permute & compute
    for _ in range(n_dev - 1):
        kr = jax.lax.ppermute(kr, axis_name, perm)
        vr = jax.lax.ppermute(vr, axis_name, perm)
        o_r, lse_r = _flash_fwd(q, kr, vr, bq, bk)
        o, lse = _merge(o, lse, o_r, lse_r)
    o = o.astype(q.dtype)
    return o, (q, k, v, o, lse)


def _ring_flash_bwd(axis_name, res, g):
    q, k, v, o, lse = res
    n_dev = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bq, bk = _ring_blocks(q.shape[1])

    dq = jnp.zeros(q.shape, jnp.float32)
    kr, vr = k, v
    dkr = jnp.zeros(k.shape, jnp.float32)
    dvr = jnp.zeros(v.shape, jnp.float32)
    # rotation-invariant residual prep (padded q/g, lse/delta rows) done
    # ONCE — only the visiting k/v change per rotation
    qp, gp, lse_p, delta_p, n_pad, d_pad = _flash_bwd_prepare(
        q, g.astype(q.dtype), o, lse, bq, bk)
    for r in range(n_dev):
        if r > 0:
            kr, vr, dkr, dvr = (jax.lax.ppermute(x, axis_name, perm)
                                for x in (kr, vr, dkr, dvr))
        # Fused flash backward on (local q, visiting k/v) with the GLOBAL
        # o/lse residuals: p = exp(s − lse_global) is exactly this block's
        # slice of the softmax, so the returned grads are the block's exact
        # contributions (nn/attention.py:_flash_bwd_fused_kernel).
        dq_r, dk_r, dv_r = _flash_bwd_padded(
            qp, _pad_nd(kr, n_pad, d_pad), _pad_nd(vr, n_pad, d_pad),
            gp, lse_p, delta_p, q.shape, bq, bk)
        dq = dq + dq_r.astype(jnp.float32)
        dkr = dkr + dk_r.astype(jnp.float32)
        dvr = dvr + dv_r.astype(jnp.float32)
    # after P−1 in-loop hops each (k, dk, dv) bundle sits one device short
    # of its owner; one final hop brings the accumulated grads home
    dkr = jax.lax.ppermute(dkr, axis_name, perm)
    dvr = jax.lax.ppermute(dvr, axis_name, perm)
    return dq.astype(q.dtype), dkr.astype(k.dtype), dvr.astype(v.dtype)


_ring_flash.defvjp(_ring_flash_fwd, _ring_flash_bwd)


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, mesh: Mesh,
                   axis_name: str = "seq") -> jax.Array:
    """Sequence-sharded attention: q/k/v (B, N, d) with N sharded over
    ``axis_name``. Exact (up to fp) match of attention_dense."""
    from big_linear_algebra_tpu.parallel.spmd import shard_map_fn

    spec = P(None, axis_name, None)
    fn = shard_map_fn(
        lambda q, k, v: _ring_flash(q, k, v, axis_name),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    sharding = NamedSharding(mesh, spec)
    q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))
    return fn(q, k, v)
