#!/usr/bin/env python
"""Capture a jax.profiler trace of the optimized train step (10 chained
steps) for timeline analysis."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    import bench
    from r3dfsseg_tpu.config import R3DConfig

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3d_trace"
    cfg = R3DConfig(episode_batch=1, lp_solver="cheby", lp_cg_iters=50,
                    lp_adjoint_iters=30, compute_dtype="bfloat16",
                    bn_mode="fastvar")
    learner = bench._learner(cfg)
    batch = bench._batch(cfg, 1)
    learner.init(batch)

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
