"""Dropout-PRNG cost on the reference-scale U-Net train step.

tools/unet_step_categories.py shows 45.3% of step device time sits in
fusions containing threefry rounds (shift/xor chains on the VPU): dropout
masks are generated in the forward and *regenerated* in the backward
(XLA rematerializes random bits rather than storing masks), so the
software PRNG rides the critical path of the conv fusions twice.

This measures ``train_chunk`` (same K=64 chunk as bench.bench_unet_step,
trace device-loop time) under:

- threefry  : default `jax.random.key` impl (the cached baseline)
- rbg       : `jax.random.key(.., impl="rbg")` — random_bits via the XLA
              RngBitGenerator HLO (TPU hardware RNG); split/fold_in still
              threefry-derived, so key derivation chains stay principled
- unsafe_rbg: RngBitGenerator for derivation too (cheapest, weakest mixing)
- no-dropout: dropout_rate=0.0 — the ceiling (no mask cost at all)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/prng_experiment.py
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

from bench import _loop_time_from_trace


def measure(cfg, impl, iters=64):
    from big_linear_algebra_tpu.models import cifar_unet as cu

    rng = np.random.default_rng(0)
    params = cu.init_params(jax.random.key(0), cfg)
    xs = jnp.asarray(rng.standard_normal(
        (iters, cfg.batch_size, 3, 32, 32)) * 0.5, jnp.float32)
    keys = jax.random.split(jax.random.key(1, impl=impl), iters)
    opt = cu.adam_init(params)
    fn = jax.jit(lambda p, o, x, k: cu.train_chunk(p, o, x, k, cfg))
    _, _, losses = fn(params, opt, xs, keys)
    jax.block_until_ready(losses)

    def run_once():
        _, _, l = fn(params, opt, xs, keys)
        jax.block_until_ready(l)

    dt = _loop_time_from_trace(run_once)
    return dt / iters * 1e3 if dt else None


def main():
    from big_linear_algebra_tpu.models import cifar_unet as cu

    cfg = cu.CONFIG
    variants = [
        ("threefry", cfg, "threefry2x32"),
        ("rbg", cfg, "rbg"),
        ("unsafe_rbg", cfg, "unsafe_rbg"),
        ("no-dropout", dataclasses.replace(cfg, dropout_rate=0.0),
         "threefry2x32"),
    ]
    only = sys.argv[1:] or None
    for name, c, impl in variants:
        if only and name not in only:
            continue
        ms = measure(c, impl)
        print(f"{name:12s}: {ms:.3f} ms/step" if ms else
              f"{name:12s}: trace unavailable", flush=True)


if __name__ == "__main__":
    main()
