"""Categorized device-time breakdown of the reference-scale U-Net step.

Joins the profiler trace (per-fusion device time, tools/profile_unet_step.py)
with the compiled HLO (what ops each fusion actually contains) and buckets
the step time by work type and resolution:

- conv_fwd / conv_dw / conv_dx: fusions containing a convolution, split by
  which derivative it is (dim_labels / rhs_reversal / output shape)
- threefry: fusions containing software-PRNG rounds (dropout mask
  generation/regeneration — shift-right-logical/xor chains on the VPU)
- other elementwise / reduce / copy etc.

Because one fusion can contain several (conv + GN-stats reduce + threefry
mask), the primary bucket is conv kind if present, else threefry, else
reduce, else elementwise; `threefry_any` additionally reports the total time
of every fusion with threefry inside, whatever its primary bucket.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/unet_step_categories.py
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


def fusion_bodies(hlo_text):
    """fusion instruction name -> (body text, metadata line)."""
    comps = {}
    for m in re.finditer(r'^%([\w.\-]+) \([^)]*\) -> .*?\n(.*?)^\}', hlo_text,
                         re.M | re.S):
        comps[m.group(1)] = m.group(2)
    out = {}
    # the type can be a tuple "(bf16[...], f32[...])" with spaces — match
    # non-greedily up to the literal " fusion(" token
    for m in re.finditer(
            r'^\s*(?:ROOT )?%?([\w.\-]+) = .*? fusion\(.*?calls=%([\w.\-]+)',
            hlo_text, re.M):
        name, comp = m.group(1), m.group(2)
        body = comps.get(comp, "")
        # inline nested fusion bodies (operand prologues are nested kLoop
        # fusions whose ops live in their own computations)
        for mm in re.finditer(r'calls=%([\w.\-]+)', body):
            body += comps.get(mm.group(1), "")
        out[name] = (body, m.group(0))
    return out


def classify(body):
    kinds = set()
    conv = re.search(r'= \S+ convolution\((.*?)\), window=\{([^}]*)\}, '
                     r'dim_labels=(\S+?),', body)
    if conv:
        window, labels = conv.group(2), conv.group(3)
        if "rhs_reversal" in window or "rhs_revers" in window:
            kinds.add("conv_dx")
        elif labels.startswith("fb01") or labels.startswith("bf01_io"):
            kinds.add("conv_dw")
        else:
            kinds.add("conv_fwd")
    if "shift-right-logical" in body:
        kinds.add("threefry")
    if re.search(r'= \S+ reduce\(', body):
        kinds.add("reduce")
    if re.search(r'= \S+ (divide|sqrt|rsqrt)', body):
        kinds.add("norm_ew")
    return kinds


def resolution(body):
    for hw in (32, 16, 8, 4):
        if re.search(rf'\[\d+,\d+,{hw},{hw}\]', body):
            return hw
    return 0


def main(iters=64):
    from bench import unet_chunk_setup

    fn, args = unet_chunk_setup(iters=iters)
    hlo = fn.lower(*args).compile().as_text()
    bodies = fusion_bodies(hlo)
    print(f"{len(bodies)} fusion instructions in HLO")

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
    loop_us = 0
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and "device" in str(pids.get(e.get("pid"), "")).lower()
                and "ops" in tids.get((e.get("pid"), e.get("tid")),
                                      "").lower()):
            if e["name"] == "while" or e["name"].startswith("while."):
                loop_us = max(loop_us, e["dur"])
            else:
                agg[e["name"]] += e["dur"]

    prim = collections.Counter()
    prim_cnt = collections.Counter()
    by_res = collections.Counter()
    threefry_any = 0.0
    unmatched = 0.0
    for name, us in agg.items():
        if name in bodies:
            body, _ = bodies[name]
            kinds = classify(body)
            if "threefry" in kinds:
                threefry_any += us
            for k in ("conv_fwd", "conv_dw", "conv_dx", "threefry", "reduce",
                      "norm_ew"):
                if k in kinds:
                    p = k
                    break
            else:
                p = "elementwise"
            if p.startswith("conv"):
                by_res[(p, resolution(body))] += us
        else:
            p = name.split(".")[0]  # non-fusion: copy, convolution, etc.
            unmatched += us
        prim[p] += us
        prim_cnt[p] += 1

    if not loop_us:
        print("no device while-loop event in the trace")
        return 1
    step = loop_us / iters
    print(f"\nstep: {step:.1f} us ({loop_us / 1e3:.1f} ms / {iters})")
    print(f"{'bucket':<24} {'us/step':>8} {'share':>7} {'instrs':>7}")
    for p, us in prim.most_common():
        print(f"{p:<24} {us / iters:>8.1f} {us / loop_us:>6.1%} "
              f"{prim_cnt[p]:>7}")
    print(f"\nfusions containing threefry (any bucket): "
          f"{threefry_any / iters:.1f} us/step ({threefry_any / loop_us:.1%})")
    print(f"non-fusion instruction time: {unmatched / iters:.1f} us/step")
    print("\nconv time by resolution (us/step):")
    for (p, hw), us in sorted(by_res.items()):
        print(f"  {p:<10} {hw:>3}x{hw:<3} {us / iters:>8.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 64))
