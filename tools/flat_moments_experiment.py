"""Attack the measured 330 us/step copy floor: flat Adam moments + scan unroll.

The round-4 copy audit (tools/unet_copy_audit.py --bf16-params) attributes
the remaining copy/slice time of the reference-scale bf16-params U-Net step
to (a) ~94 us of f32[256,256,3,3] layout copies on the Adam moment trees —
XLA transposes m/v between the conv-dW fusions' output layout and the
while-loop carry layout every step — (b) ~72 us of scan dynamic-slice
overhead and (c) ~78 us of bf16 kernel layout copies. Two candidate levers,
measured here with the ONE shared harness (bench.unet_chunk_setup inputs +
unet_chunk_probe discipline, trace device-loop time):

1. FLAT MOMENTS: store m/v as 1-D f32 arrays. A 1-D carry element has only
   one possible layout, so the per-step m/v transposes vanish; the cost
   moves to one flatten of the (bf16, half-width) grad that both moment
   updates share. Update math is unchanged (same order of operations as
   nn/optim.adam_update, so f32 results are bit-identical modulo the
   reshape, which is value-preserving).
2. SCAN UNROLL: lax.scan(unroll=k) halves/quarters the while-loop iteration
   count, amortizing per-iteration slice/DMA fixed costs ((b) above).

Reference training loop: /root/reference/model/cifar_unet.c:1874-1934.
"""

import dataclasses
import functools
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root

from bench import _loop_time_from_trace, unet_chunk_probe, unet_chunk_setup
from big_linear_algebra_tpu.models import cifar_unet as cu
from big_linear_algebra_tpu.nn.optim import (AdamState, _acc_dtype, _fmix32,
                                             stochastic_round_bf16)


def flat_adam_init(params):
    zeros = lambda t: jax.tree.map(
        lambda p: jnp.zeros((p.size,), _acc_dtype(jnp.asarray(p).dtype)), t)
    return AdamState(step=jnp.zeros((), jnp.int32), m=zeros(params),
                     v=zeros(params))


def flat_adam_update(params, grads, state, lr, b1=0.9, b2=0.999, eps=1e-8,
                     sr_key=None):
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1 - b1 ** t
    bc2 = 1 - b2 ** t

    def upd(p, g, m_, v_, seed):
        gf = g.astype(m_.dtype).reshape(-1)
        m_n = b1 * m_ + (1 - b1) * gf
        v_n = b2 * v_ + (1 - b2) * jnp.square(gf)
        new = (p.astype(m_.dtype).reshape(-1)
               - lr * (m_n / bc1) / (jnp.sqrt(v_n / bc2) + eps))
        if seed is not None and p.dtype == jnp.bfloat16:
            new = stochastic_round_bf16(new, seed)
        return new.reshape(p.shape).astype(p.dtype), m_n, v_n

    leaves, treedef = jax.tree.flatten(params)
    if sr_key is None:
        seeds = [None] * len(leaves)
    else:
        kd = jax.random.key_data(sr_key).ravel()
        base = kd[0].astype(jnp.uint32) ^ kd[-1].astype(jnp.uint32)
        seeds = [_fmix32(base ^ jnp.uint32((0x9E3779B9 * i) & 0xFFFFFFFF))
                 for i in range(len(leaves))]
    g_l = treedef.flatten_up_to(grads)
    m_l = treedef.flatten_up_to(state.m)
    v_l = treedef.flatten_up_to(state.v)
    out = [upd(p, g, m_, v_, s)
           for p, g, m_, v_, s in zip(leaves, g_l, m_l, v_l, seeds)]
    params = jax.tree.unflatten(treedef, [o[0] for o in out])
    m = jax.tree.unflatten(treedef, [o[1] for o in out])
    v = jax.tree.unflatten(treedef, [o[2] for o in out])
    return params, AdamState(step=step, m=m, v=v)


def make_chunk(cfg, flat=False, unroll=1):
    def body(carry, inp):
        p, o = carry
        x0, k = inp
        loss, grads = jax.value_and_grad(cu.loss_fn)(p, x0, k, cfg)
        au = flat_adam_update if flat else cu.adam_update
        p, o = au(p, grads, o, cfg.learn_rate, sr_key=cu._sr_key(k, cfg))
        return (p, o), loss

    # NO donation: unet_chunk_probe re-executes with the same params/opt
    # buffers (perturbing only xs); donated buffers would be dead on the
    # traced second call (surfaces as a TPU-backend INVALID_ARGUMENT).
    # The shipped train_chunk harness is donation-free too, so this stays
    # apples-to-apples with the 3.030 ms base.
    @jax.jit
    def chunk(params, opt, xs, keys):
        (params, opt), losses = jax.lax.scan(
            body, (params, opt), (xs, keys), unroll=unroll)
        return params, opt, losses

    return chunk


def measure_variant(cfg, flat=False, unroll=1, iters=64):
    _, (params, opt, xs, keys) = unet_chunk_setup(cfg, iters)
    if flat:
        opt = flat_adam_init(params)
    fn = make_chunk(cfg, flat=flat, unroll=unroll)
    dt = _loop_time_from_trace(unet_chunk_probe(fn, (params, opt, xs, keys)))
    return dt / iters * 1e3 if dt else None


def main(argv):
    cfg = dataclasses.replace(cu.CONFIG, param_dtype="bfloat16")
    which = argv[1:] or ["base", "flat", "unroll2", "flat-unroll2"]
    for name in which:
        flat = "flat" in name
        unroll = 2 if "unroll2" in name else (4 if "unroll4" in name else 1)
        if name == "base":
            # the shipped train_chunk (persistently cached executable)
            from bench import unet_chunk_ms
            ms = unet_chunk_ms(cfg)
        else:
            ms = measure_variant(cfg, flat=flat, unroll=unroll)
        print(f"{name:<14} flat={flat} unroll={unroll}: "
              f"{ms:.3f} ms/step" if ms else f"{name}: trace unavailable",
              flush=True)


if __name__ == "__main__":
    main(sys.argv)
