#!/usr/bin/env python
"""Exact-config repro of the sigma0 A/B optimized leg (few iterations):
same noisy sampler, pretrain checkpoint, loader and train() wiring as
scripts/ab_convergence.py --sigma0, parameterised by platform and knobs.

Usage: python scripts/debug_sigma0_leg.py <tmpdir> <cpu|axon> <leg> [iters]
  leg in {opt, parity, noadj, cg30, f32full, bf16solve}
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

LEGS = {
    "opt":       dict(compute_dtype="bfloat16", affinity_impl="threshold",
                      lp_solver="cheby", lp_cg_iters=50, lp_adjoint_iters=30),
    "noadj":     dict(compute_dtype="bfloat16", affinity_impl="threshold",
                      lp_solver="cheby", lp_cg_iters=50),
    "cg30":      dict(compute_dtype="bfloat16", affinity_impl="threshold",
                      lp_solver="cg", lp_cg_iters=30),
    "f32full":   dict(compute_dtype="float32", affinity_impl="threshold",
                      lp_solver="cheby", lp_cg_iters=50, lp_adjoint_iters=30),
    "bf16solve": dict(compute_dtype="bfloat16", affinity_impl="topk",
                      lp_solver="solve"),
    "parity":    dict(compute_dtype="float32", affinity_impl="topk",
                      lp_solver="solve", knn_impl="xla"),
    # TPU-only isolation: the optimized leg with the Pallas kNN swapped for
    # exact XLA top_k (the only *leg-specific* Pallas path — attention and
    # fuse_edge settings are shared with the parity leg)
    "opt-knnxla": dict(compute_dtype="bfloat16", affinity_impl="threshold",
                       lp_solver="cheby", lp_cg_iters=50,
                       lp_adjoint_iters=30, knn_impl="xla"),
    # bf16 sub-bisect: the f32 leg is healthy on TPU, both bf16 legs
    # collapse regardless of kNN impl -> isolate the bf16-only paths
    "opt-attnxla": dict(compute_dtype="bfloat16", affinity_impl="threshold",
                        lp_solver="cheby", lp_cg_iters=50,
                        lp_adjoint_iters=30, attn_impl="xla"),
    # final split: threshold-in-bf16 vs cheby's bf16 matvec storage
    "bf16-thr-solve": dict(compute_dtype="bfloat16",
                           affinity_impl="threshold", lp_solver="solve"),
    "bf16-topk-cheby": dict(compute_dtype="bfloat16", affinity_impl="topk",
                            lp_solver="cheby", lp_cg_iters=50),
    # dtype split: which half of bf16 (encoder features vs graph numerics)
    # pins lp_loss at ln(3) from iter 1?
    "bf16enc-f32graph": dict(compute_dtype="bfloat16", graph_dtype="float32",
                             affinity_impl="threshold", lp_solver="cheby",
                             lp_cg_iters=50, lp_adjoint_iters=30),
    "f32enc-bf16graph": dict(compute_dtype="float32", graph_dtype="bfloat16",
                             affinity_impl="threshold", lp_solver="cheby",
                             lp_cg_iters=50, lp_adjoint_iters=30),
}


def main():
    tmp, platform, leg = sys.argv[1:4]
    n_iters = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from mpti_train_noise import train
    from r3dfsseg_tpu.config import R3DConfig

    ds = os.path.join(tmp, "blocks")
    ckpt = os.path.join(tmp, "pretrain", "pretrain_checkpoint.msgpack")
    tag = "dbg_%s_%s" % (leg, platform)
    cfg = R3DConfig(
        dataset="s3dis", cvfold=0, clean_data_path=ds,
        n_way=2, k_shot=5, n_queries=1, pc_npts=2048, use_attention=True,
        n_iters=n_iters, eval_interval=n_iters + 1,
        n_episode_test=2, n_workers=4, seed=123,
        train_noise_ratio=(0.0, 0.2, 0.4),
        pretrain_checkpoint_path=ckpt, episode_batch=1, sigma=0.0,
        log_dir=os.path.join(tmp, tag), save_path=tmp, **LEGS[leg])
    train(cfg)
    log = open(os.path.join(cfg.log_dir, "log_mptitrain.txt")).read()
    lps = re.findall(r"lp_loss: ([0-9.]+)", log)
    print("LEG %s %s lp_loss trace: %s" % (leg, platform, " ".join(lps)),
          flush=True)


if __name__ == "__main__":
    main()
