#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: Pallas MXU matmul throughput (bf16 inputs, fp32 accumulation)
on one chip. The reference publishes no numbers (BASELINE.md) — its hot loop
is a naive -O0 triple loop — so ``vs_baseline`` reports the fraction of the
chip's MXU roofline achieved (target ≥ 0.90 per BASELINE.json's north star).

Extra fields: f32 (HIGHEST-precision) matmul throughput, XLA-native matmul
for comparison, flash-attention throughput, and mnist_nn training
throughput (images/sec/chip) measured on synthetic data.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bla_jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# v5e (TPU v5 lite): 197 TFLOP/s bf16 peak per chip.
_ROOFLINE_BF16 = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def roofline_bf16() -> float:
    kind = str(jax.devices()[0].device_kind)
    for k, v in _ROOFLINE_BF16.items():
        if k.lower() in kind.lower():
            return v
    return 197e12  # assume v5e-class


def _time_fn(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_matmul(dtype, m=4096, k=4096, n=4096, block=(512, 512, 512)):
    from big_linear_algebra_tpu.ops.matmul import _pallas_mm

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)), dtype)
    b = jnp.asarray(rng.standard_normal((k, n)), dtype)
    fn = jax.jit(lambda a, b: _pallas_mm(a, b, "nn", block, jnp.float32))
    dt = _time_fn(fn, a, b)
    return 2 * m * n * k / dt  # FLOP/s


def bench_xla_matmul(dtype, m=4096, k=4096, n=4096):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)), dtype)
    b = jnp.asarray(rng.standard_normal((k, n)), dtype)
    fn = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
    dt = _time_fn(fn, a, b)
    return 2 * m * n * k / dt


def bench_flash_attention(b=4, n=4096, d=128):
    from big_linear_algebra_tpu.nn.attention import flash_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    fn = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    dt = _time_fn(fn, q, k, v, iters=5)
    return 4 * b * n * n * d / dt  # 2 GEMMs of 2·n²·d


def bench_mnist_nn(steps=60):
    import jax.random as jrandom

    from big_linear_algebra_tpu.models import mnist_nn

    cfg = mnist_nn.CONFIG
    params = mnist_nn.init_params(jrandom.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((cfg.batch_size, 784)), jnp.float32)
    onehot = jnp.asarray(np.eye(10, dtype=np.float32)[
        rng.integers(0, 10, cfg.batch_size)])
    mask = jnp.ones((cfg.batch_size,), jnp.float32)
    # warmup/compile
    params, _, _ = mnist_nn.train_step(params, x, onehot, mask, cfg)
    jax.block_until_ready(params)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, correct, ce = mnist_nn.train_step(params, x, onehot, mask, cfg)
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0
    return steps * cfg.batch_size / dt  # images/sec


def main():
    peak = roofline_bf16()
    pallas_bf16 = bench_matmul(jnp.bfloat16)
    extras = {}
    try:
        extras["pallas_matmul_f32_gflops"] = round(
            bench_matmul(jnp.float32) / 1e9, 1)
        extras["xla_matmul_bf16_gflops"] = round(
            bench_xla_matmul(jnp.bfloat16) / 1e9, 1)
        extras["flash_attention_gflops"] = round(
            bench_flash_attention() / 1e9, 1)
        extras["mnist_nn_images_per_sec"] = round(bench_mnist_nn(), 1)
    except Exception as e:  # pragma: no cover - keep the primary metric alive
        extras["extras_error"] = repr(e)
    result = {
        "metric": "pallas_matmul_bf16_gflops",
        "value": round(pallas_bf16 / 1e9, 1),
        "unit": "GFLOP/s",
        # no published reference numbers (BASELINE.md): baseline = MXU roofline
        "vs_baseline": round(pallas_bf16 / peak, 4),
        "roofline_gflops": round(peak / 1e9, 1),
        "device": str(jax.devices()[0].device_kind),
        **extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
