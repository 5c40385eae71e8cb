"""Measure bf16-resident params vs f32 masters at reference scale.

VERDICT r3 #1 / weak #1: the round-3 copy audit attributed 471 µs/step
(14.6%) of the reference-scale U-Net train step to f32 master-weight
re-reads (XLA re-converts the 2×-wide tree per consumer). Storing the tree
bf16 with f32 precision confined to the optimizer (f32 Adam moments +
f32 update math, bf16 round-trip on write — nn/optim.py) removes that
traffic at the source. This tool measures both configs with the ONE shared
chunk harness (bench.unet_chunk_setup/unet_chunk_probe, trace device-loop
time). Reference training loop: /root/reference/model/cifar_unet.c:1874-1934.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root (tools/ is sys.path[0] when run as a script)

from bench import unet_chunk_setup, unet_chunk_probe, _loop_time_from_trace


def measure(cfg=None, iters=64):
    fn, args = unet_chunk_setup(cfg, iters)
    dt = _loop_time_from_trace(unet_chunk_probe(fn, args))
    return dt / iters * 1e3 if dt else None


def main():
    from big_linear_algebra_tpu.models import cifar_unet as cu

    base = measure(None)
    print(f"f32-master params (default): {base:.3f} ms/step", flush=True)
    cfg = dataclasses.replace(cu.CONFIG, param_dtype="bfloat16")
    bf16 = measure(cfg)
    print(f"bf16-resident params:        {bf16:.3f} ms/step", flush=True)
    print(f"delta: {base - bf16:+.3f} ms ({(base - bf16) / base * 100:+.1f}%)")


if __name__ == "__main__":
    main()
