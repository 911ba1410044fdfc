#!/usr/bin/env python
"""Sweep episode_batch on the real chip: train eps/s per E, OOM-guarded.

Usage: python scripts/sweep_ebatch.py [E ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_one(ebatch: int, iters: int = 10, **cfg_kw):
    import jax
    from __graft_entry__ import _example_episode
    from r3dfsseg_tpu.config import R3DConfig
    from r3dfsseg_tpu.learners import MPTILearner
    from r3dfsseg_tpu.models.episode import stack_episodes

    cfg = R3DConfig(episode_batch=ebatch, lp_solver="cheby", lp_cg_iters=50,
                    lp_adjoint_iters=30, compute_dtype="bfloat16", **cfg_kw)
    learner = MPTILearner(cfg)
    rng = np.random.default_rng(0)
    eps = [_example_episode(cfg, rng) for _ in range(ebatch)]
    batch = stack_episodes(eps) if ebatch > 1 else eps[0]
    import jax.numpy as jnp
    batch = jax.tree.map(lambda x: jnp.asarray(x), batch)
    learner.init(jax.tree.map(lambda x: x[0], batch) if ebatch > 1 else batch)
    m = learner.train(batch)
    float(m["loss"])            # force host materialisation through tunnel
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):    # chained: ONE host sync per window so the
            m = learner.train(batch)   # ~30 ms tunnel latency amortises
        float(m["loss"])
        rates.append(ebatch * iters / (time.perf_counter() - t0))
    return sorted(rates)[1]


def main():
    es = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8, 12, 16]
    for e in es:
        try:
            r = run_one(e)
            print(f"E={e}: {r:.2f} eps/s", flush=True)
        except Exception as ex:
            print(f"E={e}: FAILED ({type(ex).__name__}: {str(ex)[:200]})",
                  flush=True)


if __name__ == "__main__":
    main()
