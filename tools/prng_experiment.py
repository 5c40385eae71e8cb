"""Dropout-PRNG cost on the reference-scale U-Net train step.

tools/unet_step_categories.py shows 45.3% of step device time sits in
fusions containing threefry rounds (shift/xor chains on the VPU): dropout
masks are generated in the forward and *regenerated* in the backward
(XLA rematerializes random bits rather than storing masks), so the
software PRNG rides the critical path of the conv fusions twice.

This measures ``train_chunk`` (bench.unet_chunk_ms — the same K=64 chunk
as bench_unet_step, trace device-loop time) under:

- threefry  : `--prng=threefry` (the round-2 default)
- rbg       : the shipped default — random_bits via the XLA
              RngBitGenerator HLO (TPU hardware RNG); split/fold_in still
              threefry-derived, so key derivation chains stay principled
- unsafe_rbg: RngBitGenerator for derivation too (cheapest, weakest mixing)
- no-dropout: dropout_rate=0.0 — the ceiling (no mask cost at all)

Measured (round 3, bf16 batch 16): threefry 4.015, rbg 3.214,
unsafe_rbg 3.210, no-dropout 3.060 ms/step → rbg is the default
(BASELINE.md "Dropout PRNG" section).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/prng_experiment.py
"""

import dataclasses
import sys

from bench import unet_chunk_ms
from big_linear_algebra_tpu.models import cifar_unet as cu


def main():
    cfg = cu.CONFIG
    variants = [
        ("threefry", dataclasses.replace(cfg, prng="threefry2x32")),
        ("rbg", dataclasses.replace(cfg, prng="rbg")),
        ("unsafe_rbg", dataclasses.replace(cfg, prng="unsafe_rbg")),
        ("no-dropout", dataclasses.replace(cfg, dropout_rate=0.0)),
    ]
    only = sys.argv[1:] or None
    for name, c in variants:
        if only and name not in only:
            continue
        ms = unet_chunk_ms(c)
        print(f"{name:12s}: {ms:.3f} ms/step" if ms else
              f"{name:12s}: trace unavailable", flush=True)


if __name__ == "__main__":
    main()
