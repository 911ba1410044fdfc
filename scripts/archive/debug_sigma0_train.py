#!/usr/bin/env python
"""Train-mode version of debug_sigma0: run the real jitted train step
(BN batch-stats mode + attention dropout + adjoint) for a few iterations
per knob variant and print lp_loss — the sigma0 A/B showed the optimized
leg pinned at exactly ln(3) from iteration 1 in TRAIN mode only.

Usage: python scripts/debug_sigma0_train.py <tmpdir-of-ab-run> [platform]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms",
                  sys.argv[2] if len(sys.argv) > 2 else "cpu")

import numpy as np

VARIANTS = {
    "parity   f32/topk/solve":    dict(compute_dtype="float32",
                                       affinity_impl="topk",
                                       lp_solver="solve", knn_impl="xla"),
    "opt-full bf16/thr/chb50a30": dict(compute_dtype="bfloat16",
                                       affinity_impl="threshold",
                                       lp_solver="cheby", lp_cg_iters=50,
                                       lp_adjoint_iters=30),
    "noadj    bf16/thr/cheby50":  dict(compute_dtype="bfloat16",
                                       affinity_impl="threshold",
                                       lp_solver="cheby", lp_cg_iters=50),
    "bf16only bf16/topk/solve":   dict(compute_dtype="bfloat16",
                                       affinity_impl="topk",
                                       lp_solver="solve"),
    "thr-only f32/thr/solve":     dict(compute_dtype="float32",
                                       affinity_impl="threshold",
                                       lp_solver="solve"),
    "chebonly f32/topk/chb50a30": dict(compute_dtype="float32",
                                       affinity_impl="topk",
                                       lp_solver="cheby", lp_cg_iters=50,
                                       lp_adjoint_iters=30),
}


def main():
    tmp = sys.argv[1]
    blocks = os.path.join(tmp, "blocks")
    ckpt = os.path.join(tmp, "pretrain", "pretrain_checkpoint.msgpack")
    from r3dfsseg_tpu.config import R3DConfig
    from r3dfsseg_tpu.learners.mpti_learner import MPTILearner
    from r3dfsseg_tpu.utils.checkpoint import load_pretrain_checkpoint
    from r3dfsseg_tpu.data.episodes import EpisodeSampler

    sampler = EpisodeSampler(blocks, "s3dis", cvfold=0, n_way=2, k_shot=5,
                             n_queries=1, mode="train", num_point=2048,
                             seed=123)
    eps = [sampler.sample() for _ in range(3)]

    for tag, kw in VARIANTS.items():
        cfg = R3DConfig(dataset="s3dis", cvfold=0, clean_data_path=blocks,
                        n_way=2, k_shot=5, n_queries=1, pc_npts=2048,
                        use_attention=True, seed=123, sigma=0.0, **kw)
        lrn = MPTILearner(cfg, rng=jax.random.PRNGKey(0))
        lrn.init(eps[0])
        params, stats = load_pretrain_checkpoint(ckpt, cfg)
        lrn.load_params(params, stats, encoder_only=True)
        out = [float(lrn.train(ep)["lp_loss"]) for ep in eps]
        print(f"[{tag}] train lp_loss: "
              + " ".join("%.4f" % v for v in out), flush=True)


if __name__ == "__main__":
    main()
