#!/usr/bin/env python
"""Capture a jax.profiler trace of the optimized train step and print the
per-step device-time report (top ops)."""
import collections
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def report(trace_dir, top=30):
    path = glob.glob(f'{trace_dir}/plugins/profile/*/*.trace.json.gz')[0]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr['traceEvents']
    pids, tids = {}, {}
    for e in ev:
        if e.get('ph') == 'M':
            if e.get('name') == 'process_name':
                pids[e['pid']] = e['args'].get('name')
            if e.get('name') == 'thread_name':
                tids[(e['pid'], e['tid'])] = e['args'].get('name')
    dur = collections.Counter()
    cnt = collections.Counter()
    steps = []
    for e in ev:
        if e.get('ph') == 'X' and 'TPU' in str(pids.get(e['pid'], '')):
            if 'Steps' in str(tids.get((e['pid'], e['tid']), '')):
                steps.append(e.get('dur', 0))
                continue
            dur[e['name']] += e.get('dur', 0)
            cnt[e['name']] += 1
    big = sorted(s for s in steps if s > 1e4)
    print("step ms:", [round(s / 1000, 2) for s in big])
    n = max(len(big), 1)
    for name, d in dur.most_common(top):
        print(f"{d/n:9.1f} us/step x{cnt[name]/n:<6.1f} {name[:80]}")


def main():
    import jax

    import bench
    from r3dfsseg_tpu.config import R3DConfig

    out = "/tmp/r3d_trace_auto"
    shutil.rmtree(out, ignore_errors=True)
    cfg = R3DConfig(episode_batch=1, lp_solver="cheby", lp_cg_iters=50,
                    lp_adjoint_iters=30, bn_mode="fastvar",
                    compute_dtype="bfloat16")
    learner = bench._learner(cfg)
    batch = bench._batch(cfg, 1)
    learner.init(batch)

    def chain():
        for _ in range(10):
            m = learner.train(batch)
        float(m["loss"])

    chain()
    with jax.profiler.trace(out):
        chain()
    report(out)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        report(sys.argv[1])
    else:
        main()
