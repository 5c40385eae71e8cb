"""Per-kernel breakdown of the reference-scale U-Net train step (TPU).

Runs the same K=64 ``train_chunk`` as bench.bench_unet_step (compile is
persistently cached), profiles one execution, and aggregates device-side
event durations by kernel/fusion name — the data behind "where do the
4.016 ms go" (BASELINE.md batch-scaling table says 92% conv fusions; this
prints the actual top-N list so kernel work targets the real hot spots).

Run: PYTHONPATH=/root/repo python tools/profile_unet_step.py [iters]
"""

import collections
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root (tools/ is sys.path[0] when run as a script)
from bench import _trace_events


def main(iters=64):
    from bench import unet_chunk_setup
    from big_linear_algebra_tpu.models import cifar_unet as cu

    cfg = cu.CONFIG
    fn, args = unet_chunk_setup(iters=iters)
    # unet_chunk_probe perturbs the traced run's inputs — a byte-identical
    # re-execution can be deduplicated upstream and trace nothing (ADVICE r3)
    from bench import unet_chunk_probe

    events, pids = _trace_events(unet_chunk_probe(fn, args))
    if events is None:
        print("profiler unavailable")
        return 1

    # thread lanes: per-op events live on the "XLA Ops" thread; the module/
    # step lanes repeat the same spans and would double-count
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e.get("pid"), e.get("tid"))] = e.get(
                "args", {}).get("name", "")

    def lane(e):
        return tids.get((e.get("pid"), e.get("tid")), "")

    lanes = collections.Counter(
        lane(e) for e in events
        if e.get("ph") == "X"
        and "device" in str(pids.get(e.get("pid"), "")).lower())
    print(f"device lanes: {dict(lanes)}")

    loop_us = 0
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and "device" in str(pids.get(e.get("pid"), "")).lower()
                and "ops" in lane(e).lower()):
            name = e["name"]
            if name == "while" or name.startswith("while."):
                loop_us = max(loop_us, e["dur"])
                continue
            agg[name] += e["dur"]
            cnt[name] += 1

    if not loop_us:
        print("no device while-loop event in the trace")
        return 1
    step_us = loop_us / iters
    print(f"loop device time: {loop_us / 1e3:.3f} ms over {iters} steps "
          f"-> {step_us * 1e-3:.3f} ms/step "
          f"({cfg.batch_size / step_us * 1e6:.0f} img/s)")
    print(f"\n{'total us':>10} {'/step us':>9} {'count':>6}  name")
    shown = 0
    for name, dur in agg.most_common(45):
        print(f"{dur:>10.0f} {dur / iters:>9.1f} {cnt[name]:>6}  "
              f"{name[:110]}")
        shown += dur
    rest = sum(agg.values()) - shown
    print(f"{rest:>10.0f} {rest / iters:>9.1f}         (everything else)")
    print(f"\nsum of kernels: {sum(agg.values()) / 1e3:.3f} ms "
          f"(loop: {loop_us / 1e3:.3f} ms — gap = scheduling bubbles)")
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 64))
