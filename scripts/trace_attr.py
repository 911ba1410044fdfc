#!/usr/bin/env python
"""Attribute traced device time to model components by joining the trace
with the compiled HLO's op_name metadata.

Usage: python scripts/trace_attr.py /tmp/r3d_trace /tmp/step_hlo.txt
"""
import collections
import glob
import gzip
import json
import re
import sys


def load_meta(hlo_path):
    """Map hlo op name -> jax op_name metadata path."""
    meta = {}
    pat = re.compile(r'%([\w.\-]+) = .*?metadata=\{op_name="([^"]+)"')
    with open(hlo_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                meta[m.group(1)] = m.group(2)
    return meta


def component(op_path):
    """Collapse a jax op_name path to a coarse component label."""
    p = op_path
    for key, label in [
        ("edgeconv", "encoder/edgeconv"),
        ("knn_indices", "encoder/knn"),
        ("attention", "encoder/attention"),
        ("att_learner", "encoder/attention"),
        ("base_learner", "encoder/base_learner"),
        ("dgcnn_mlp", "encoder/mlp"),
        ("linear", "encoder/linear"),
        ("bn", "encoder/bn"),
        ("cheby", "lp/solve"),
        ("label_propagate", "lp"),
        ("affinity", "lp/affinity"),
        ("kth_smallest", "lp/affinity"),
        ("masked_fps", "fps"),
        ("contrast", "contrast"),
        ("mdns", "mdns"),
        ("grid", "mdns"),
        ("adam", "optimizer"),
        ("transpose(jvp", "backward-misc"),
    ]:
        if key in p:
            # distinguish fwd/bwd for encoder pieces
            tag = label
            if "transpose(jvp" in p and not label.startswith("backward"):
                tag = label + "/bwd"
            return tag
    return "other"


def main():
    trace_dir, hlo_path = sys.argv[1], sys.argv[2]
    meta = load_meta(hlo_path)
    path = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")[0]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids, tids = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name")
            if e.get("name") == "thread_name":
                tids[(e["pid"], e["tid"])] = e["args"].get("name")
    comp_dur = collections.Counter()
    op_dur = collections.defaultdict(collections.Counter)
    nsteps = 10.0
    unattributed = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or "TPU" not in str(pids.get(e["pid"], "")):
            continue
        if "Steps" in str(tids.get((e["pid"], e["tid"]), "")):
            continue
        name, d = e["name"], e.get("dur", 0)
        if name.startswith("jit_"):
            continue
        op_path = meta.get(name)
        if op_path is None:
            unattributed[name] += d
            comp_dur["(unattributed)"] += d
            continue
        c = component(op_path)
        comp_dur[c] += d
        op_dur[c][name + "  <" + op_path[-70:] + ">"] += d
    total = sum(comp_dur.values())
    print(f"total device op time: {total/nsteps/1000:.2f} ms/step\n")
    for c, d in comp_dur.most_common():
        print(f"{d/nsteps:9.1f} us/step  {c}")
    print("\n--- top ops per component ---")
    for c, d in comp_dur.most_common(12):
        print(f"\n[{c}] {d/nsteps:.0f} us/step")
        src = unattributed if c == "(unattributed)" else op_dur[c]
        for name, dd in src.most_common(6):
            print(f"   {dd/nsteps:8.1f} us  {name[:110]}")


if __name__ == "__main__":
    main()
