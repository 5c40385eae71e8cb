"""Quantify gpipe_hetero's structural overheads (VERDICT r2 #3 / weak #5).

Two parts, both on the 8-virtual-device CPU mesh (the only multi-device
surface in this environment — TPU side has one chip):

1. **Analytic packing stats at reference scale** via
   ``parallel.pipeline.hetero_stats``: every tick ppermutes the widest
   boundary's padded flat buffer, so the padding fraction per boundary, the
   fill/drain bubble and the bytes-on-the-wire are properties of the design,
   independent of backend.
2. **Measured step time** of ``make_train_step_pp`` (3-stage U-Net pipeline,
   microbatched grad accumulation + Adam) vs the *same math* run
   sequentially on one device (identical DDPM draws and dropout fold chain,
   the comparator from tests/test_pipeline.py::test_pp_train_step_matches_
   sequential). The ratio is the pipeline's overhead when the stages have
   nothing to hide it behind — on real 3-chip hardware the concurrent-stage
   speedup (up to ~utilization × S) offsets it; on one CPU host the devices
   share the same cores so the ratio isolates pure overhead.

Run: python tools/pp_overhead.py   (results recorded in BASELINE.md)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root (tools/ is sys.path[0] when run as a script)

_FLAGS = "--xla_force_host_platform_device_count=8"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " +
                           _FLAGS).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sitecustomize overrides the env

import dataclasses  # noqa: E402
import functools  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from big_linear_algebra_tpu.models import cifar_unet as cu  # noqa: E402
from big_linear_algebra_tpu.nn.optim import adam_init, adam_update  # noqa: E402
from big_linear_algebra_tpu.parallel import make_mesh  # noqa: E402
from big_linear_algebra_tpu.parallel.pipeline import hetero_stats  # noqa: E402


def analytic(cfg, batch, n_micro, label):
    params = cu.init_params(jax.random.key(0), cfg)
    fns = cu.unet_pipeline_stages(cfg, train=True)
    sp = cu.split_params_stages(params)
    mb = batch // n_micro
    xs = jax.ShapeDtypeStruct((n_micro, mb, 3, cfg.image_size,
                               cfg.image_size), jnp.float32)
    ts = jax.ShapeDtypeStruct((n_micro, mb), jnp.float32)
    s = hetero_stats(fns, sp, (xs, ts), key=jax.random.key(0))
    mib = 1024 * 1024
    print(f"\n== {label}: batch {batch}, n_micro {n_micro}, "
          f"S={s['n_stages']} ==")
    print(f"boundary flat widths: {s['boundary_widths']} "
          f"-> padded to {s['padded_width']} ({s['boundary_dtype']})")
    print("padding fraction per boundary: "
          + ", ".join(f"{f:.1%}" for f in s["padding_frac"]))
    print(f"bytes ppermuted per tick/device: {s['bytes_per_tick'] / mib:.2f}"
          f" MiB; ring total ({s['n_stages']} devices x {s['n_ticks']} "
          f"ticks): {s['ring_bytes_total'] / mib:.2f} MiB")
    print(f"useful (unpadded, point-to-point) boundary bytes: "
          f"{s['useful_boundary_bytes'] / mib:.2f} MiB -> wire efficiency "
          f"{s['useful_boundary_bytes'] / s['ring_bytes_total']:.1%}")
    print(f"fill/drain: {s['fill_drain_ticks']} of {s['n_ticks']} ticks; "
          f"utilization {s['utilization']:.1%}")
    print(f"1f1b schedule: {s['n_slots_1f1b']} fwd+bwd slots (vs "
          f"{2 * s['n_ticks']} gpipe-autodiff tick traversals); "
          f"utilization {s['utilization_1f1b']:.1%}")
    print(f"param flat widths: {s['param_widths']} -> padded "
          f"{s['param_padded_width']} ({s['param_dtype']})")
    return s


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def make_seq_step(cfg, n_micro):
    """Sequential single-device comparator: identical math to
    make_train_step_pp (same draws, same fold_in(kd, s*M+m) chain, same
    microbatch-mean loss, one Adam update)."""
    fns = cu.unet_pipeline_stages(cfg, train=True)

    def step(params, opt_state, x0, key):
        b = x0.shape[0]
        xt, t, noise, kd = cu._ddpm_draws(x0, key, cfg)
        mb = b // n_micro
        xs = xt.reshape(n_micro, mb, *x0.shape[1:])
        ts = t.reshape(n_micro, mb).astype(x0.dtype)

        def loss_of(p):
            sp = cu.split_params_stages(p)
            preds = []
            for m in range(n_micro):
                bd = (xs[m], ts[m])
                for s, (fn, stage_p) in enumerate(zip(fns, sp)):
                    bd = fn(stage_p, bd,
                            jax.random.fold_in(kd, s * n_micro + m))
                preds.append(bd)
            acc_dt = jnp.promote_types(jnp.float32, x0.dtype)
            pred = jnp.stack(preds).reshape(x0.shape).astype(acc_dt)
            return cu.mse_loss(pred, noise.astype(acc_dt)) / float(
                np.prod(x0.shape))

        loss, grads = jax.value_and_grad(loss_of)(params)
        p2, o2 = adam_update(params, grads, opt_state, cfg.learn_rate)
        return p2, o2, loss

    return jax.jit(step)


def measure(cfg, batch, n_micro):
    mesh = make_mesh({"stage": 3}, devices=jax.devices()[:3])
    params = cu.init_params(jax.random.key(0), cfg)
    x0 = jax.random.normal(jax.random.key(1),
                           (batch, 3, cfg.image_size, cfg.image_size),
                           jnp.float32)
    key = jax.random.key(2)

    seq = make_seq_step(cfg, n_micro)
    t_seq, (p_s, o_s, l_s) = timeit(seq, params, adam_init(params), x0, key)

    results = {}
    for schedule in ("gpipe", "1f1b"):
        pp = cu.make_train_step_pp(mesh, cfg, n_micro=n_micro,
                                   schedule=schedule)
        # pp_step donates params/opt — hand it fresh copies each call
        pp_nodonate = jax.jit(
            lambda p, o, x, k: pp(jax.tree.map(jnp.copy, p),
                                  jax.tree.map(jnp.copy, o), x, k))
        t_pp, (p_p, o_p, l_p) = timeit(pp_nodonate, params,
                                       adam_init(params), x0, key)
        assert abs(float(l_p) - float(l_s)) < 1e-4, (float(l_p), float(l_s))
        results[schedule] = t_pp
    print(f"n_micro={n_micro}: sequential {t_seq * 1e3:8.1f} ms   "
          f"gpipe {results['gpipe'] * 1e3:8.1f} ms "
          f"({results['gpipe'] / t_seq:.2f}x)   "
          f"1f1b {results['1f1b'] * 1e3:8.1f} ms "
          f"({results['1f1b'] / t_seq:.2f}x)")
    return t_seq, results


def main():
    print(f"devices: {jax.devices()}")

    # 1. reference scale (analytic only — no compute)
    analytic(cu.CONFIG, batch=16, n_micro=4, label="reference scale (CONFIG)")
    analytic(cu.CONFIG, batch=16, n_micro=16,
             label="reference scale (CONFIG)")

    # 2. measured on the CPU mesh at test scale
    cfg = dataclasses.replace(cu.TINY, compute_dtype="float32")
    analytic(cfg, batch=8, n_micro=4, label="TINY (measured below)")
    print(f"\n== measured (TINY, batch 8, f32, CPU mesh, median of 5) ==")
    for m in (2, 4, 8):
        measure(cfg, batch=8, n_micro=m)


if __name__ == "__main__":
    main()
