#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: Pallas MXU matmul throughput (bf16 inputs, fp32 accumulation)
on one chip. The reference publishes no numbers (BASELINE.md) — its hot loop
is a naive -O0 triple loop — so ``vs_baseline`` reports the fraction of the
chip's MXU roofline achieved (target ≥ 0.90 per BASELINE.json's north star).

Timing methodology (important): on remote-dispatch backends
``block_until_ready`` can return before device execution completes, and
repeated identical executions may be deduplicated upstream. Every measurement
therefore (a) chains iterations with true data dependencies *inside one
jitted executable* (lax.fori_loop), (b) reduces to a scalar and fetches it to
host (forces completion), and (c) reports the slope between two chain
lengths, cancelling fixed dispatch/RPC overhead. Validated against the
device roofline: XLA's own 4096³ bf16 matmul measures ≈96% of the v5e peak
under this scheme.

Extra fields: XLA-native matmul, flash-attention throughput, and mnist_nn
training throughput (images/sec/chip).
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

# The env default above only reaches jax.config if jax was first imported
# AFTER it was set. Tools that `import jax` before `import bench` would
# otherwise run with the persistent cache silently DISABLED (and
# models/common.py skips its own fallback when the env var looks set) —
# through the remote-compile tunnel that turns cached 2-minute measurements
# into ~25-minute cold compiles. Make enabling unconditional and
# import-order-proof.
if not jax.config.jax_compilation_cache_dir:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Peak bf16 MXU throughput per chip.
_ROOFLINE_BF16 = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def roofline_bf16() -> float:
    kind = str(jax.devices()[0].device_kind)
    for k, v in _ROOFLINE_BF16.items():
        if k.lower() in kind.lower():
            return v
    return 197e12  # assume v5e-class


def _slope_time(make_chain, n1=8, n2=72, reps=4):
    """Best-of-reps slope timing: returns seconds per chained iteration."""
    times = {}
    for iters in (n1, n2):
        ch = make_chain(iters)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            v = float(ch())
            dt = time.perf_counter() - t0
            assert np.isfinite(v), "benchmark chain produced non-finite value"
            best = min(best, dt)
        times[iters] = best
    return (times[n2] - times[n1]) / (n2 - n1)


def bench_matmul_chain(mm, m=4096, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, m)) / np.sqrt(m), dtype)
    b = jnp.asarray(rng.standard_normal((m, m)), dtype)
    jax.block_until_ready((a, b))

    def make_chain(iters):
        @jax.jit
        def chain(a, b):
            def body(_, bb):
                return mm(a, bb).astype(dtype)
            out = jax.lax.fori_loop(0, iters, body, b)
            return jnp.sum(out.astype(jnp.float32))

        compiled = chain.lower(a, b).compile()
        return lambda: compiled(a, b)

    dt = _slope_time(make_chain)
    return 2 * m ** 3 / dt


def bench_pallas_matmul(block=None):
    """block=None → the library's auto-tuned blocks (full-K 2-D grid for
    4096³)."""
    from big_linear_algebra_tpu.ops.matmul import _pallas_mm

    return bench_matmul_chain(
        lambda a, b: _pallas_mm(a, b, "nn", block, jnp.float32))


def _matmul_chain_runner(mm, m=4096, iters=16):
    """Shared chained-matmul trace harness: warm-compile the fori_loop
    chain, then return a thunk executing it on perturbed input (the
    traced run must differ from the warm run or upstream dedup skips
    it — CLAUDE.md benchmarking note)."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, m)) / np.sqrt(m), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((m, m)), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        def body(_, bb):
            return mm(a, bb).astype(jnp.bfloat16)
        return jnp.sum(jax.lax.fori_loop(0, iters, body, b).astype(
            jnp.float32))

    float(chain(a, b))  # warm
    a2 = (a * 1.0009).astype(a.dtype)
    return lambda: float(chain(a2, b))


def bench_pallas_matmul_trace(m=4096, iters=16):
    """(kernel FLOP/s, end-to-end chain FLOP/s) from ONE profiling session:
    the kernel metric is the Pallas matmul's own device time; the chain
    metric is the device while-loop (kernel + the harness's unfused bf16
    convert). Both trace-derived — the wall-clock slope harness swings up
    to ±9% through the remote-dispatch tunnel (BENCH r1→r3: 176.7 / 169.1
    / 159.4) while trace numbers repeat to <0.1%. (None, None) when the
    profiler is unavailable."""
    from big_linear_algebra_tpu.ops.matmul import _pallas_mm

    run = _matmul_chain_runner(
        lambda a, b: _pallas_mm(a, b, "nn", None, jnp.float32), m, iters)
    totals, loop = _device_event_totals(run)
    if totals is None:
        return None, None
    kdt = _pick_kernel_time(totals, iters, ("convert",))
    ldt = loop * 1e-6 if loop else None
    flops = 2 * m ** 3 * iters
    return (flops / kdt if kdt else None, flops / ldt if ldt else None)


def _trace_events(run_once):
    """Profile one execution and return (events, pid→process-name)."""
    import glob
    import gzip
    import json
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="bla_prof_")
    try:
        try:
            ctx = jax.profiler.trace(tmp)
            ctx.__enter__()
        except Exception:
            return None, None  # profiler unavailable
        exit_failed = False
        try:
            # run_once errors must PROPAGATE: a failed execution silently
            # reported as "profiler unavailable" hides real benchmark bugs
            run_once()
        finally:
            try:
                ctx.__exit__(None, None, None)
            except Exception:
                # no return here: a return inside finally would swallow an
                # in-flight run_once exception — flag it and decide below
                exit_failed = True
        if exit_failed:
            return None, None
        try:
            paths = glob.glob(f"{tmp}/**/*.trace.json.gz", recursive=True)
            if not paths:
                return None, None
            with gzip.open(paths[0]) as f:
                events = json.load(f).get("traceEvents", [])
            pids = {}
            for e in events:
                if e.get("ph") == "M" and e.get("name") == "process_name":
                    pids[e["pid"]] = e.get("args", {}).get("name", "")
            return events, pids
        except Exception:
            return None, None  # unreadable/partial trace
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _device_event_totals(run_once):
    """One profiling session → (per-name (total_us, count) dict, loop_us).
    Device rows only — host-side events with coincidental counts must not
    be selected. loop_us is the device-side ``while`` event's duration
    ("while" or "while.<id>" depending on graph). (None, None) if the
    profiler is unavailable."""
    import collections

    events, pids = _trace_events(run_once)
    if events is None:
        return None, None
    agg = collections.Counter()
    cnt = collections.Counter()
    loop = 0
    for e in events:
        name = e.get("name", "")
        if (e.get("ph") == "X" and "dur" in e
                and "device" in str(pids.get(e.get("pid"), "")).lower()):
            if name == "while" or name.startswith("while."):
                loop = max(loop, e["dur"])
            agg[name] += e["dur"]
            cnt[name] += 1
    return {n: (agg[n], cnt[n]) for n in agg}, loop


def _pick_kernel_time(totals, iters, exclude):
    """Largest-total-duration event occurring exactly ``iters`` times
    (skipping ``exclude`` name substrings) → seconds, or None."""
    candidates = [
        (dur, name) for name, (dur, cnt) in totals.items()
        if cnt == iters and not any(x in name.lower() for x in exclude)
    ]
    if not candidates:
        return None
    dur_us, _ = max(candidates)
    return dur_us * 1e-6


def _kernel_time_from_trace(run_once, iters, exclude=("convert",)):
    """Total device time (seconds) of the dominant per-iteration kernel in a
    profiled execution. None if profiling is unavailable. Pass
    ``exclude=()`` when the kernel of interest itself fuses a convert
    (e.g. XLA names its dot+convert body "convolution_convert_fusion")."""
    totals, _ = _device_event_totals(run_once)
    return _pick_kernel_time(totals, iters, exclude) if totals else None


def _loop_time_from_trace(run_once):
    """Device time (seconds) of the fori_loop body across ALL its kernels:
    the duration of the device-side ``while`` event (the compiled loop).
    The right measure for multi-kernel steps (e.g. a whole train step) where
    no single kernel dominates. None if profiling is unavailable."""
    _, loop = _device_event_totals(run_once)
    return loop * 1e-6 if loop else None


def bench_pallas_matmul_kernel(m=4096, iters=16):
    """Kernel-only matmul throughput from a device profile trace.

    The chained harness adds an unfused bf16 convert between iterations
    (~0.05 ms/iter) that XLA's dot fuses into its epilogue — so the chain
    number under-reports the kernel by ~6%. Returns FLOP/s or None.
    """
    return bench_pallas_matmul_trace(m, iters)[0]


def _flash_chain_runner(body, b=4, n=4096, d=128, iters=16,
                        dtype=jnp.bfloat16):
    """Shared flash-bench harness (VERDICT r3 #7 boilerplate paydown):
    build iid-normal (q, k, v) + a carry, warm-compile the fori_loop chain
    over ``body(q, k, v, carry) -> carry``, and return a thunk executing it
    on perturbed q (the traced run must differ from the warm run — dedup,
    CLAUDE.md)."""
    rng = np.random.default_rng(0)
    q, k, v, g = (jnp.asarray(rng.standard_normal((b, n, d)), dtype)
                  for _ in range(4))

    @jax.jit
    def chain(q, k, v, g):
        out = jax.lax.fori_loop(0, iters, lambda _, c: body(q, k, v, c), g)
        return jnp.sum(out.astype(jnp.float32))

    float(chain(q, k, v, g))  # warm
    q2 = (q * 1.0009).astype(q.dtype)
    return lambda: float(chain(q2, k, v, g))


def bench_flash_attention_kernel(b=4, n=4096, d=128, iters=16,
                                 dtype=jnp.bfloat16):
    """Kernel-only flash-attention forward throughput (device trace)."""
    from big_linear_algebra_tpu.nn.attention import flash_attention

    run = _flash_chain_runner(lambda q, k, v, c: flash_attention(q, k, c),
                              b, n, d, iters, dtype)
    dt = _kernel_time_from_trace(run, iters)
    return 4 * b * n * n * d * iters / dt if dt else None


def bench_flash_attention_bwd_kernel(b=4, n=4096, d=128, iters=16,
                                     dtype=jnp.bfloat16):
    """FUSED (stream=False) flash backward throughput by kernel device
    time — kept r2-comparable. FLOP count: 5 GEMMs of 2·n²·d per batch
    (s, dp, dv, dk, dq) = 10·b·n²·d — the standard 2.5× of the forward.
    stream=False is forced because the single-dominant-kernel matcher
    cannot honestly time the default streaming backward (two kernels);
    that path is measured end-to-end by bench_flash_vjp_chain."""
    from big_linear_algebra_tpu.nn.attention import flash_attention

    def body(q, k, v, gg):
        _, vjp = jax.vjp(
            lambda a, b_, c: flash_attention(a, b_, c, 512, 1024, False),
            q, k, gg.astype(v.dtype))
        return vjp(gg)[2]

    run = _flash_chain_runner(body, b, n, d, iters, dtype)
    dt = _kernel_time_from_trace(run, iters)
    return 10 * b * n * n * d * iters / dt if dt else None


def bench_flash_vjp_chain(b=4, n=4096, d=128, iters=16, dtype=jnp.bfloat16):
    """Default-policy (resident fwd + streaming bwd) fwd+bwd throughput by
    the loop's total device time. FLOP credit: 4 fwd + 10 bwd GEMM units
    of 2·n²·d (recompute not credited) = 14·b·n²·d. Round-3 measurement:
    203 TF/s at n=4096 vs 181 with the fused backward (BASELINE.md)."""
    from big_linear_algebra_tpu.nn.attention import flash_attention

    def body(q, k, v, gg):
        _, vjp = jax.vjp(flash_attention, q, k, gg.astype(v.dtype))
        return vjp(gg)[2]

    run = _flash_chain_runner(body, b, n, d, iters, dtype)
    dt = _loop_time_from_trace(run)
    return 14 * b * n * n * d * iters / dt if dt else None


def bench_xla_matmul():
    return bench_matmul_chain(
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))


def bench_xla_matmul_kernel(m=4096, iters=16):
    """XLA dot sanity anchor by kernel device time — the slope-based
    ``bench_xla_matmul`` chain is run-sensitive through the remote-dispatch
    tunnel (one BENCH_r03 stability pair measured it ABOVE the roofline,
    225 vs 197 TF/s — impossible, i.e. slope noise), while the trace-derived
    number is stable to <0.1% run-to-run like the Pallas kernel metric.

    exclude=(): XLA fuses the dot WITH the chain's bf16 convert into one
    "convolution_convert_fusion" — the default convert filter would skip
    the kernel of interest and pick a tiny copy instead."""
    run = _matmul_chain_runner(
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
        m, iters)
    dt = _kernel_time_from_trace(run, iters, exclude=())
    return 2 * m ** 3 * iters / dt if dt else None


def bench_flash_attention(b=4, n=4096, d=128, dtype=jnp.bfloat16):
    from big_linear_algebra_tpu.nn.attention import flash_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, n, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, n, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, n, d)), dtype)
    jax.block_until_ready((q, k, v))

    def make_chain(iters):
        @jax.jit
        def chain(q, k, v):
            def body(_, vv):
                # 1.0009 growth: repeated application of the fixed
                # row-stochastic softmax(qkᵀ) operator would hit a bf16
                # fixed point mid-chain (identical iterations → upstream
                # dedup, CLAUDE.md); the drift keeps every iterate distinct
                # (1.0009^136 ≈ 1.13, no overflow)
                return flash_attention(q, k, vv) * 1.0009
            out = jax.lax.fori_loop(0, iters, body, v)
            return jnp.sum(out.astype(jnp.float32))

        compiled = chain.lower(q, k, v).compile()
        return lambda: compiled(q, k, v)

    dt = _slope_time(make_chain, n1=8, n2=136, reps=4)
    return 4 * b * n * n * d / dt  # 2 GEMMs of 2·n²·d each


def bench_mnist_nn(iters=2048):
    """Training images/sec/chip: device time of the compiled train-step loop
    (the trace's ``while`` event — exact device time of all per-step kernels;
    the r1 slope method swung ±35% run-to-run through the tunnel).

    unroll=2: at an ~8 µs step the loop's fixed per-iteration cost is
    measurable; the round-5 sweep (1/2/4/8 → 8.22/7.24/7.24/7.31 µs/step)
    showed 2 captures all of it. The chain stays data-dependent (params
    thread through), so the anti-dedup property is unchanged."""
    from big_linear_algebra_tpu.models import mnist_nn

    cfg = mnist_nn.CONFIG
    params = mnist_nn.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((cfg.batch_size, 784)), jnp.float32)
    onehot = jnp.asarray(np.eye(10, dtype=np.float32)[
        rng.integers(0, 10, cfg.batch_size)])
    mask = jnp.ones((cfg.batch_size,), jnp.float32)
    jax.block_until_ready((x, onehot, mask))

    @jax.jit
    def chain(params):
        def body(_, p):
            p2, _, _ = mnist_nn.train_step(p, x, onehot, mask, cfg)
            return p2
        p = jax.lax.fori_loop(0, iters, body, params, unroll=2)
        return jnp.sum(p["b3"])

    float(chain(params))  # warm
    # traced run != warm run (dedup): perturbed params, same executable
    params2 = jax.tree.map(lambda p: (p * 1.0009).astype(p.dtype), params)
    dt = _loop_time_from_trace(lambda: float(chain(params2)))
    if dt:
        return cfg.batch_size * iters / dt

    def make_chain(n):  # fallback: slope timing
        @jax.jit
        def chain_n(params):
            def body(_, p):
                p2, _, _ = mnist_nn.train_step(p, x, onehot, mask, cfg)
                return p2
            p = jax.lax.fori_loop(0, n, body, params)
            return jnp.sum(p["b3"])

        compiled = chain_n.lower(params).compile()
        return lambda: compiled(params)

    dt = _slope_time(make_chain, n1=512, n2=8704, reps=3)
    return cfg.batch_size / dt


def bench_mnist_hinge(n=8192, iters=256):
    """Full-batch hinge-ensemble training throughput: examples·iterations/s
    (each iteration margins + re-grads the WHOLE batch as one GEMM pair —
    the reference's full-batch loop, model/mnist_hinge.c:101-176), by trace
    device-loop time of the production per-iteration body (_chunk_body)."""
    from big_linear_algebra_tpu.models import mnist_hinge as mh

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n, 784)), jnp.float32)
    y = jnp.asarray(np.where(np.eye(10, dtype=np.float32)[
        rng.integers(0, 10, n)] > 0, 1.0, -1.0), jnp.float32)
    w = jnp.asarray(rng.standard_normal((784, 10)) * 0.01, jnp.float32)

    @jax.jit
    def chain(w, x):
        # lr small enough that the convergence stop never trips: every
        # scanned iteration does the full-batch work being measured
        (w2, _), _ = jax.lax.scan(mh._chunk_body(y, x, 1e-6, n),
                                  (w, jnp.asarray(False)), None,
                                  length=iters)
        return jnp.sum(w2)

    float(chain(w, x))  # warm
    x2 = (x * 1.0009).astype(x.dtype)  # traced run != warm run (dedup)
    dt = _loop_time_from_trace(lambda: float(chain(w, x2)))
    return n * iters / dt if dt else None


def bench_mnist_hinge_convergence(max_iters=20000):
    """End-to-end ``train`` on the synthetic MNIST set at the reference
    lr=0.0005 (model/mnist_hinge.c's CLI): (iterations-to-convergence,
    wall seconds). Wall-clock is honest at this granularity — a multi-
    second host-driven loop with a fresh convergence decision per chunk,
    not a kernel timing (data synthesis is excluded; the compile is
    persistently cached after the first run)."""
    import contextlib
    import io
    import re
    import tempfile

    from big_linear_algebra_tpu.data import synth
    from big_linear_algebra_tpu.models import mnist_hinge as mh

    with tempfile.TemporaryDirectory() as td:
        old = os.environ.get("BLA_DATA_DIR")
        os.environ["BLA_DATA_DIR"] = td
        try:
            synth.ensure_mnist(td)  # outside the timed window
            with contextlib.redirect_stdout(io.StringIO()):
                mh.init()
            buf = io.StringIO()
            t0 = time.perf_counter()
            with contextlib.redirect_stdout(buf):
                mh.train(max_iters, "0.0005")
            dt = time.perf_counter() - t0
        finally:
            if old is None:
                os.environ.pop("BLA_DATA_DIR", None)
            else:
                os.environ["BLA_DATA_DIR"] = old
    m = re.search(r"converged < epsilon after iteration (\d+)",
                  buf.getvalue())
    return (int(m.group(1)) if m else None, dt)


def _layer_graph_steps_per_sec(shapes, acts, iters=4096):
    """Per-example online-SGD steps/s of a ``layer_graph`` scan (the legacy
    Layer-path models' training loop, lib/layer.c:48-102 scan-fused) by
    trace device-loop time."""
    from big_linear_algebra_tpu.nn import layer_graph

    rng = np.random.default_rng(0)
    params = [
        (jnp.asarray(rng.standard_normal(sw) * 0.1, jnp.float32),
         jnp.asarray(rng.standard_normal(sb) * 0.1, jnp.float32))
        for sw, sb in shapes
    ]
    in_dim, out_dim = shapes[0][0][1], shapes[-1][0][0]
    xs = jnp.asarray(rng.random((iters, in_dim)), jnp.float32)
    ys = jnp.asarray(np.eye(out_dim, dtype=np.float32)[
        rng.integers(0, out_dim, iters)])
    run_scan = layer_graph.make_sgd_scan(acts)

    jax.block_until_ready(run_scan(params, xs, ys, 0.01))  # warm
    xs2 = (xs * 1.0009).astype(xs.dtype)  # traced run != warm run (dedup)
    dt = _loop_time_from_trace(
        lambda: jax.block_until_ready(run_scan(params, xs2, ys, 0.01)))
    return iters / dt if dt else None


def bench_mnist_legacy(iters=4096):
    """legacy mnist (784→200→200→10, relu/relu/softmax_legacy) per-example
    SGD steps/s — the model/mnist.c:132-216 streaming loop's device math."""
    from big_linear_algebra_tpu.models import mnist as mnist_legacy

    return _layer_graph_steps_per_sec(mnist_legacy.SHAPES,
                                      mnist_legacy.ACTS, iters)


def bench_my_first_model(iters=4096):
    """my_first_model (2→3→2 ReLU) per-example SGD steps/s
    (model/my_first_model.c:56-124's online loop, scan-fused)."""
    from big_linear_algebra_tpu.models import my_first_model as mfm

    return _layer_graph_steps_per_sec(mfm.SHAPES, mfm.ACTS, iters)


def unet_chunk_setup(cfg=None, iters=64):
    """(jitted ``train_chunk``, (params, opt, xs, keys)) at ``cfg`` —
    the ONE measurement harness behind bench_unet_step and every
    tools/ experiment (prng/layout/copy-audit/high-res), so harness
    fixes land in one place. Keys come from ``cu.root_key`` (the
    config's PRNG impl, validated)."""
    from big_linear_algebra_tpu.models import cifar_unet as cu

    cfg = cfg or cu.CONFIG
    rng = np.random.default_rng(0)
    params = cu.init_params(jax.random.key(0), cfg)
    xs = jnp.asarray(rng.standard_normal(
        (iters, cfg.batch_size, 3, cfg.image_size, cfg.image_size)) * 0.5,
        jnp.float32)
    keys = jax.random.split(cu.root_key(1, cfg), iters)
    opt = cu.adam_init(params)
    fn = jax.jit(lambda p, o, x, k: cu.train_chunk(p, o, x, k, cfg))
    return fn, (params, opt, xs, keys)


def unet_chunk_probe(fn, args):
    """Warm/compile ``fn(*args)`` (persistently cached), then return a
    thunk executing it on perturbed images. EVERY profiler trace of the
    shared chunk harness must run through this: the traced run must
    differ from the warm run or upstream dedup skips device execution
    entirely (CLAUDE.md) and the trace carries no device while-loop."""
    jax.block_until_ready(fn(*args)[2])
    params, opt, xs, keys = args
    args2 = (params, opt, (xs * 1.0009).astype(xs.dtype), keys)
    return lambda: jax.block_until_ready(fn(*args2)[2])


def unet_chunk_ms(cfg=None, iters=64):
    """ms/step of the U-Net train chunk at ``cfg`` by trace device-loop
    time; None when the profiler is unavailable."""
    fn, args = unet_chunk_setup(cfg, iters)
    dt = _loop_time_from_trace(unet_chunk_probe(fn, args))
    return dt / iters * 1e3 if dt else None


def bench_unet_step(iters=64):
    """cifar_unet (reference-scale DDPM U-Net, batch 16, bf16 mixed
    precision) ms/step: device time of the ``train_chunk`` scan's while loop
    (fwd + bwd + Adam). The K=64 chunk matches the layout-decision
    measurements in BASELINE.md so the compile is persistently cached."""
    from big_linear_algebra_tpu.models import cifar_unet as cu

    ms = unet_chunk_ms(None, iters)
    if ms is None:
        return None
    # images/sec derived from the SAME config the chunk ran with
    return ms, cu.CONFIG.batch_size


def bench_unet_step_bf16_params(iters=64):
    """The U-Net train step with bf16-RESIDENT params (f32 precision only
    inside the optimizer: f32 Adam moments, f32 update math, stochastic-
    rounded bf16 write — VERDICT r3 #1, --bf16-params). Removes the
    measured 471 µs/step of f32 master-weight re-read copies the default
    config pays (round-3 copy audit)."""
    import dataclasses

    from big_linear_algebra_tpu.models import cifar_unet as cu

    cfg = dataclasses.replace(cu.CONFIG, param_dtype="bfloat16")
    return unet_chunk_ms(cfg, iters)


def main():
    peak = roofline_bf16()
    # kernel + end-to-end chain from ONE profiling session; the wall-clock
    # slope harness is only the no-profiler fallback (it swings up to ±9%
    # through the tunnel — r1→r3 BENCH: 176.7/169.1/159.4 — while trace
    # numbers repeat to <0.1%)
    kernel_rate, chain_rate = bench_pallas_matmul_trace()
    chain_src = "device_trace" if chain_rate else "wallclock_slope"
    chain_rate = chain_rate or bench_pallas_matmul()
    # headline: the kernel's own device time when the profiler is available
    # (the chained harness adds an unfused convert XLA's dot fuses away);
    # fall back to the end-to-end chain otherwise
    pallas_bf16 = kernel_rate or chain_rate
    extras = {
        "pallas_matmul_chain_gflops": round(chain_rate / 1e9, 1),
        "pallas_matmul_chain_source": chain_src,
        # expected run-to-run spread of the chain metric: trace-derived
        # <0.5%; the wallclock-slope fallback has measured up to ±9%
        "pallas_matmul_chain_expected_spread_pct":
            1 if chain_src == "device_trace" else 9,
        "kernel_timing_source": "device_trace" if kernel_rate else "chain",
    }
    try:
        xla_rate = bench_xla_matmul_kernel() or bench_xla_matmul()
        extras["xla_matmul_bf16_gflops"] = round(xla_rate / 1e9, 1)
        flash = bench_flash_attention_kernel() or bench_flash_attention()
        extras["flash_attention_bf16_gflops"] = round(flash / 1e9, 1)
        flash_bwd = bench_flash_attention_bwd_kernel()
        if flash_bwd:
            extras["flash_attention_fused_bwd_bf16_gflops"] = round(
                flash_bwd / 1e9, 1)
        flash_chain = bench_flash_vjp_chain()
        if flash_chain:
            extras["flash_attention_fwdbwd_chain_gflops"] = round(
                flash_chain / 1e9, 1)
        extras["mnist_nn_images_per_sec"] = round(bench_mnist_nn(), 1)
        # the other three model programs (VERDICT r3 #4): perf now recorded
        # for 5/5 reference model programs
        hinge = bench_mnist_hinge()
        if hinge:
            extras["mnist_hinge_examples_per_sec"] = round(hinge, 1)
        conv_iters, conv_s = bench_mnist_hinge_convergence()
        if conv_iters is not None:
            # seconds are only meaningful when the stop actually tripped —
            # otherwise they time the max_iters cap, not convergence
            extras["mnist_hinge_convergence_iters"] = conv_iters
            extras["mnist_hinge_convergence_s"] = round(conv_s, 3)
        legacy = bench_mnist_legacy()
        if legacy:
            extras["mnist_legacy_sgd_steps_per_sec"] = round(legacy, 1)
        mfm = bench_my_first_model()
        if mfm:
            extras["my_first_model_sgd_steps_per_sec"] = round(mfm, 1)
        unet = bench_unet_step()
        if unet:
            unet_ms, unet_batch = unet
            extras["unet_train_ms_per_step"] = round(unet_ms, 3)
            extras["unet_images_per_sec"] = round(
                unet_batch / unet_ms * 1e3, 1)
        unet_bf16 = bench_unet_step_bf16_params()
        if unet_bf16:
            extras["unet_bf16_params_ms_per_step"] = round(unet_bf16, 3)
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
