"""Summarize a jax.profiler chrome trace (vm.trace.json.gz): device-stream
op breakdown by category and by op name, plus totals per step.

Usage: python parse_trace.py <trace.json.gz> [n_steps]
"""
import collections
import gzip
import json
import re
import sys


def load(path):
    with gzip.open(path, "rt") as f:
        return json.load(f)


def categorize(name: str) -> str:
    n = name.lower()
    if n.startswith("copy") or ".copy" in n or "copy-start" in n or \
            "copy-done" in n:
        return "copy"
    if "conv" in n:
        return "conv"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion"
    if "dot" in n:
        return "dot"
    if "broadcast" in n:
        return "broadcast"
    if "reduce" in n:
        return "reduce"
    if "transpose" in n:
        return "transpose"
    if "reshape" in n or "bitcast" in n:
        return "reshape"
    if "dynamic" in n and "slice" in n:
        return "dyn-slice"
    if "slice" in n or "pad" in n or "concatenate" in n:
        return "slice/pad/concat"
    if "rng" in n:
        return "rng"
    if "select" in n or "compare" in n:
        return "select"
    return "other"


def main():
    path = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    data = load(path)
    events = data["traceEvents"]

    # find the TensorCore/device PID (the one with XLA op events)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Device" in n or "TensorCore" in n}

    by_cat = collections.Counter()
    by_name = collections.Counter()
    count_by_cat = collections.Counter()
    total = 0.0
    n_ev = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        # skip the jit_<fn> module wrappers (they nest all the ops)
        if name.startswith("jit_") or name.startswith("pjit"):
            continue
        args = e.get("args") or {}
        if not args.get("long_name") and "%" not in name and \
                not re.match(r"^[a-z].*(\.|_)[0-9]*", name):
            continue
        dur = e.get("dur", 0) / 1e3  # ms
        cat = categorize(name)
        by_cat[cat] += dur
        count_by_cat[cat] += 1
        base = name.split(".")[0]
        by_name[base] += dur
        total += dur
        n_ev += 1

    print(f"device pids: {sorted(dev_pids)} "
          f"({ {p: pid_names[p] for p in dev_pids} })")
    print(f"total device op time: {total:.1f} ms over {n_ev} events "
          f"(~{n_steps} steps -> {total / n_steps:.1f} ms/step, "
          f"{n_ev // n_steps} ops/step)")
    print("\nby category (ms/step, count/step):")
    for cat, ms in by_cat.most_common():
        print(f"  {cat:18s} {ms / n_steps:8.1f} ms  "
              f"{count_by_cat[cat] // n_steps:6d} ops")
    print("\ntop 25 op names (ms/step):")
    for name, ms in by_name.most_common(25):
        print(f"  {name[:70]:70s} {ms / n_steps:8.2f} ms")


if __name__ == "__main__":
    main()
