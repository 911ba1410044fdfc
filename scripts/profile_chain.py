#!/usr/bin/env python
"""Tunnel-latency-free timing: chain k dependent steps per host sync.

The axon tunnel costs ~30 ms per host materialisation, which poisons both
per-component timings and any bench that syncs every step.  Here state
threads through k dispatches and ONE float() syncs at the end; the
difference between k=1 and k=10 isolates true device time per step.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _example_episode
    from r3dfsseg_tpu.config import R3DConfig
    from r3dfsseg_tpu.learners import MPTILearner
    from r3dfsseg_tpu.models.episode import stack_episodes

    # null round-trip cost
    one = jnp.ones(())
    f = jax.jit(lambda x: x + 1)
    float(f(one))
    t0 = time.perf_counter()
    for _ in range(20):
        float(f(one))
    rt = (time.perf_counter() - t0) / 20
    print(f"tunnel round-trip: {rt*1e3:.1f} ms")

    for ebatch in (1, 4, 8):
        cfg = R3DConfig(episode_batch=ebatch, lp_solver="cg", lp_cg_iters=30,
                        compute_dtype="bfloat16")
        learner = MPTILearner(cfg)
        rng = np.random.default_rng(0)
        eps = [_example_episode(cfg, rng) for _ in range(ebatch)]
        batch = stack_episodes(eps) if ebatch > 1 else eps[0]
        batch = jax.tree.map(lambda x: jnp.asarray(x), batch)
        learner.init(jax.tree.map(lambda x: x[0], batch)
                     if ebatch > 1 else batch)
        m = learner.train(batch)
        float(m["loss"])            # compile + warm

        for k in (1, 10):
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                for _ in range(k):
                    m = learner.train(batch)   # state chains, no sync
                float(m["loss"])               # one sync per k steps
            dt = (time.perf_counter() - t0) / (reps * k)
            print(f"E={ebatch} k={k}: {dt*1e3:7.2f} ms/step "
                  f"({ebatch/dt:6.2f} eps/s)", flush=True)


if __name__ == "__main__":
    main()
