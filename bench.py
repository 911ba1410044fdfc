#!/usr/bin/env python
"""Benchmark: episodes/sec/chip for the flagship MPTI forward+train step at
the reference's headline config (2-way 5-shot, 2048 pts, attention,
100 subprototypes, k_connect=200 — `/root/repo/BASELINE.json`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the CUDA reference repo publishes no throughput numbers
(BASELINE.md), so the anchor is the measured wall-clock of the reference's
own per-episode pipeline stages; until a GPU measurement exists we report
vs the conservative estimate REF_EPS_PER_SEC below (batch_size=1 PyTorch
loop with the faiss CPU round-trip and a 4.4k dense inverse per episode).
"""
from __future__ import annotations

import json
import time

import numpy as np


# Conservative reference throughput estimate (episodes/sec) for the CUDA
# pipeline: per episode it runs 12 DGCNN clouds, a CPU faiss search over
# ~4.4k nodes and a dense 4396^2 torch.inverse (mpti.py:775) at batch 1.
# Published numbers do not exist (BASELINE.md) — replace with a measured
# value when a CUDA box is available.
REF_EPS_PER_SEC = 2.0


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_episode
    from r3dfsseg_tpu.config import R3DConfig
    from r3dfsseg_tpu.learners import MPTILearner
    from r3dfsseg_tpu.models.episode import stack_episodes

    # the TPU-first design point: bf16 encoder compute (BN + graph math stay
    # f32), 4 episodes fused per jit step
    ebatch = 4
    cfg = R3DConfig(episode_batch=ebatch, lp_solver="cg", lp_cg_iters=30,
                    compute_dtype="bfloat16")
    learner = MPTILearner(cfg)

    rng = np.random.default_rng(0)
    eps = [_example_episode(cfg, rng) for _ in range(ebatch)]
    batch = stack_episodes(eps)
    batch = jax.tree.map(lambda x: jnp.asarray(x), batch)

    learner.init(jax.tree.map(lambda x: x[0], batch))

    # warmup / compile.  NOTE: on the tunnelled axon backend
    # block_until_ready returns before remote execution completes, so
    # timing must force a host materialisation (float()) every step.
    m = learner.train(batch)
    float(m["loss"])

    # tunnel latency jitters +-10% between runs: report the median of three
    # 10-step windows
    iters = 10
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            m = learner.train(batch)
            float(m["loss"])
        rates.append(ebatch * iters / (time.perf_counter() - t0))
    eps_per_sec = sorted(rates)[1]
    print(json.dumps({
        "metric": "train_episodes_per_sec_per_chip",
        "value": round(eps_per_sec, 3),
        "unit": "episodes/s",
        "vs_baseline": round(eps_per_sec / REF_EPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
