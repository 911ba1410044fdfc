#!/usr/bin/env python
"""Ablation timing: full train step with components toggled off, chained
timing (10 steps per sync).  Differences attribute the step budget."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def step_time(tag, **over):
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _example_episode
    from r3dfsseg_tpu.config import R3DConfig
    from r3dfsseg_tpu.learners import MPTILearner

    base = dict(episode_batch=1, lp_solver="cg", lp_cg_iters=30,
                compute_dtype="bfloat16")
    base.update(over)
    cfg = R3DConfig(**base)
    learner = MPTILearner(cfg)
    rng = np.random.default_rng(0)
    ep = jax.tree.map(lambda x: jnp.asarray(x), _example_episode(cfg, rng))
    learner.init(ep)
    m = learner.train(ep)
    float(m["loss"])
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(10):
            m = learner.train(ep)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"{tag:42s} {best*1e3:7.2f} ms/step", flush=True)
    return best


def main():
    base = step_time("full (bf16, cg30, attention, contrast)")
    step_time("no attention (linear mapper)", use_attention=False)
    step_time("cg 1 iter (LP solve ~free)", lp_cg_iters=1)
    step_time("contrast weight 0 (still computed)")
    step_time("k_connect=8 (affinity selection cheap)", k_connect=8)
    step_time("n_subprototypes=8 (FPS cheap)", n_subprototypes=8)
    step_time("approx kNN", knn_impl="approx")
    step_time("dgcnn_k=8 (smaller edge tensor)", dgcnn_k=8)
    _ = base


if __name__ == "__main__":
    main()
