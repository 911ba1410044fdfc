#!/usr/bin/env python
"""Measure TPU episodes/sec/chip for every BASELINE.json headline config
(BASELINE.md measurement-plan table).  Same chained-step methodology as
bench.py; optimized design point (bf16 / fastvar BN / threshold affinity /
cheby-50+adj-30) unless noted.

ScanNet episodes have the same shape as S3DIS (2-way 5-shot, 2048 pts,
9 attrs) — only the class catalog differs — so its device throughput is
the dataset-independent MPTI number; it is measured with n_way=2/k=5 and
reported once.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from r3dfsseg_tpu.config import R3DConfig

OPT = dict(episode_batch=1, lp_solver="cheby", lp_cg_iters=50,
           lp_adjoint_iters=30, compute_dtype="bfloat16", bn_mode="fastvar")


def proto_learner(cfg):
    from r3dfsseg_tpu.learners import ProtoLearner
    return ProtoLearner(cfg)


def main():
    rows = []

    # 1. ProtoNet 2-way 1-shot (cosine), clean episodes
    cfg = R3DConfig(phase="prototrain", k_shot=1, use_attention=False,
                    **{k: v for k, v in OPT.items() if k != "lp_solver"})
    bench._learner, keep = proto_learner, bench._learner
    t = bench.measure_train(cfg, 1)
    e = bench.measure_eval(cfg, 1)
    bench._learner = keep
    rows.append(("ProtoNet 2-way 1-shot clean", t, e))

    # 2. MPTI no attention, 2-way 5-shot
    cfg = R3DConfig(use_attention=False, **OPT)
    rows.append(("MPTI 2-way 5-shot (no attention)",
                 bench.measure_train(cfg, 1), bench.measure_eval(cfg, 1)))

    # 3. MPTI + attention (the bench.py headline; re-measured here)
    cfg = R3DConfig(**OPT)
    rows.append(("MPTI+attention 2-way 5-shot (S3DIS/ScanNet shape)",
                 bench.measure_train(cfg, 1), bench.measure_eval(cfg, 1)))

    # 4. Noise-robust config: same device program as (3) — WayContrast is
    # always in the train step and MDNS in the eval step; noise only
    # changes which host episodes are sampled.  Measured anyway with a
    # noisy support_flag pattern to exercise the borrowed-negative branch.
    import numpy as np
    import jax
    import jax.numpy as jnp
    cfg = R3DConfig(**OPT)
    learner = bench._learner(cfg)
    ep = bench._batch(cfg, 1)
    flag = np.ones((cfg.n_way, cfg.k_shot), np.int32)
    flag[:, -2:] = 0                                    # 0.4 noise ratio
    ep = ep._replace(support_flag=jnp.asarray(flag))
    learner.init(ep)

    def chain():
        for _ in range(bench.CHAIN):
            m = learner.train(ep)
        float(m["loss"])
    rows.append(("MPTI+attention noisy (0.4 flagged shots)",
                 bench._measure(chain, bench.CHAIN), None))

    for name, t, e in rows:
        print(json.dumps({"config": name, "train_eps_per_sec": round(t, 2),
                          "eval_eps_per_sec":
                              round(e, 2) if e is not None else None}))


if __name__ == "__main__":
    main()
