#!/usr/bin/env python
"""Capture a jax.profiler trace of the optimized train step (10 chained
steps) for timeline analysis.

Usage: python scripts/capture_trace.py [outdir] [E]
E = episode_batch (default 1); E>1 traces the vmapped batched-episode
step — the per-chip program every multi-chip host runs under episode-DP
(VERDICT r4 #2: attribute the E=8 throughput regression).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    import bench
    from r3dfsseg_tpu.config import R3DConfig

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3d_trace"
    ebatch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    cfg = R3DConfig(episode_batch=ebatch, lp_solver="cheby", lp_cg_iters=50,
                    lp_adjoint_iters=30, compute_dtype="bfloat16",
                    bn_mode="fastvar")
    learner = bench._learner(cfg)
    batch = bench._batch(cfg, ebatch)
    learner.init(jax.tree.map(lambda x: x[0], batch) if ebatch > 1 else batch)

    def chain():
        for _ in range(10):
            m = learner.train(batch)
        float(m["loss"])

    chain()  # compile + warm
    with jax.profiler.trace(out):
        chain()
    print("trace written to", out)


if __name__ == "__main__":
    main()
