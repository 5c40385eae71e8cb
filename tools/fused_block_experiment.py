"""In-context measurement of the fused resnet-block Pallas kernel.

VERDICT r3 #2: `nn/fused_block.py` packs the whole reference resnet block
(GN→ReLU→conv3×3→+temb→GN→ReLU→dropout→conv3×3→+residual,
/root/reference/model/cifar_unet.c:1044-1072) into ONE Pallas kernel per
direction for the MXU-starved 4²/8² resolutions, amortizing the
per-pallas_call HBM round trip that made the per-op kernels
(conv2d_packed, fused GN+ReLU) lose in context. This measures the full
reference-scale train step with `--fused-block` on/off — and crossed with
`--bf16-params`, since the two dispatch decisions interact through the
weight-convert traffic — using the ONE shared chunk harness
(bench.unet_chunk_setup/unet_chunk_probe, trace device-loop time).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/fused_block_experiment.py
Results recorded in BASELINE.md ("Fused resnet-block kernel" section).
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

    variants = [
        ("all-XLA (default)", cu.CONFIG),
        ("fused-block", dataclasses.replace(cu.CONFIG, fused_block=True)),
        ("bf16-params", dataclasses.replace(cu.CONFIG,
                                            param_dtype="bfloat16")),
        ("bf16 + fused-block", dataclasses.replace(
            cu.CONFIG, param_dtype="bfloat16", fused_block=True)),
    ]
    only = sys.argv[1:] or None
    for name, cfg in variants:
        if only and not any(o in name for o in only):
            continue
        ms = measure(cfg)
        print(f"{name:20s}: {ms:.3f} ms/step" if ms else
              f"{name:20s}: trace unavailable", flush=True)


if __name__ == "__main__":
    main()
