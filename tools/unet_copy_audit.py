"""What do the U-Net step's copy/slice instructions move?

The rbg-era breakdown (tools/unet_step_categories.py) shows ~470 us/step
(14.6%) in copy / copy-done / slice-done instructions. This joins those
trace events back to the compiled HLO, aggregates by (shape, bytes) and
prints the top movers so the overhead can be attributed (loop-carried
state that failed to alias? layout transposes? microscheduler DMA?).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/unet_copy_audit.py
"""

import collections
import re
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root (tools/ is sys.path[0] when run as a script)
from bench import _trace_events

_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f64": 8,
          "s8": 1, "u8": 1}


def shape_bytes(ty):
    """Total payload bytes of a result type. Tuple types (async copy
    pairs are ``(dest, src-alias, u32 semaphore)``) sum every array
    element, so copy-start rows report their real payload instead of 0."""
    total = 0
    for m in re.finditer(r'(\w+)\[([\d,]*)\]', ty):
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        total += n * _BYTES.get(m.group(1), 4)
    return total


def main(iters=64, bf16_params=False):
    import dataclasses

    from bench import unet_chunk_setup
    from big_linear_algebra_tpu.models import cifar_unet as cu

    cfg = (dataclasses.replace(cu.CONFIG, param_dtype="bfloat16")
           if bf16_params else None)
    fn, args = unet_chunk_setup(cfg, iters=iters)
    hlo = fn.lower(*args).compile().as_text()

    # instruction name -> (op, result type). The type can be a tuple with
    # nested parens in layout annotations ("{:S(2)}") — match non-greedily
    # up to the op token instead of balancing parens.
    info = {}
    for m in re.finditer(
            r'^\s*(?:ROOT )?%?([\w.\-]+) = (.+?) '
            r'(copy|copy-start|copy-done|slice|dynamic-slice|bitcast|'
            r'transpose)\(', hlo, re.M):
        info[m.group(1)] = (m.group(3), m.group(2))

    # unet_chunk_probe perturbs the traced run's inputs — a byte-identical
    # re-execution can be deduplicated upstream and trace nothing (ADVICE r3)
    from bench import unet_chunk_probe

    events, pids = _trace_events(unet_chunk_probe(fn, args))
    if events is None:
        print("profiler unavailable")
        return 1
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e.get("pid"), e.get("tid"))] = e.get(
                "args", {}).get("name", "")
    agg = collections.Counter()
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and "device" in str(pids.get(e.get("pid"), "")).lower()
                and "ops" in tids.get((e.get("pid"), e.get("tid")),
                                      "").lower()):
            base = e["name"].split(".")[0]
            if base in ("copy", "copy-done", "slice-done", "copy-start",
                        "slice-start", "slice", "dynamic-slice"):
                agg[e["name"]] += e["dur"]

    # group by result type signature
    by_ty = collections.Counter()
    by_ty_cnt = collections.Counter()
    missing = 0.0
    for name, us in agg.items():
        # slice-done events correspond to the async pair's slice name
        key = name
        for cand in (name, name.replace("-done", ""),
                     name.replace("-done", "-start"),
                     name.replace("slice-done", "slice")):
            if cand in info:
                key = cand
                break
        if key in info:
            op, ty = info[key]
            by_ty[(op, ty)] += us
            by_ty_cnt[(op, ty)] += 1
        else:
            missing += us
            by_ty[("?", name.split(".")[0])] += us
            by_ty_cnt[("?", name.split(".")[0])] += 1

    total = sum(agg.values())
    print(f"total copy/slice device time: {total / iters:.1f} us/step")
    print(f"{'op':<12} {'type':<42} {'us/step':>8} {'MiB/step':>9} "
          f"{'count':>5}")
    for (op, ty), us in by_ty.most_common(25):
        mb = shape_bytes(ty) * by_ty_cnt[(op, ty)] / 2**20
        print(f"{op:<12} {ty[:42]:<42} {us / iters:>8.1f} {mb:>9.2f} "
              f"{by_ty_cnt[(op, ty)]:>5}")
    if missing:
        print(f"unattributed (no HLO match): {missing / iters:.1f} us/step "
              f"— rows above marked '?'")
    return 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--bf16-params"]
    sys.exit(main(int(argv[0]) if argv else 64,
                  bf16_params="--bf16-params" in sys.argv))
