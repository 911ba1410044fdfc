#!/usr/bin/env python
"""Knob-grid post-mortem of the sigma0 A/B failure: the optimized leg
(bf16/threshold/cheby50/adj30 + auto-sigma) sits at lp_loss == ln(3) from
iteration 1 at the pretrained start, while the parity leg (f32/topk/solve
+ auto-sigma) starts healthy (1.406) from the SAME checkpoint.  The
forward degeneracy is deterministic, so one CPU forward per knob isolates
the culprit.

Usage: python scripts/debug_sigma0.py <tmpdir-of-ab-run>
  (expects <tmpdir>/pretrain/pretrain_checkpoint.msgpack and <tmpdir>/blocks)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if (sys.argv[2:3] or ["cpu"])[0] == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

VARIANTS = {
    "parity   f32/topk/solve":   dict(compute_dtype="float32",
                                      affinity_impl="topk",
                                      lp_solver="solve", knn_impl="xla"),
    "opt-full bf16/thr/cheby50": dict(compute_dtype="bfloat16",
                                      affinity_impl="threshold",
                                      lp_solver="cheby", lp_cg_iters=50),
    "bf16only bf16/topk/solve":  dict(compute_dtype="bfloat16",
                                      affinity_impl="topk",
                                      lp_solver="solve"),
    "thr-only f32/thr/solve":    dict(compute_dtype="float32",
                                      affinity_impl="threshold",
                                      lp_solver="solve"),
    "chebonly f32/topk/cheby50": dict(compute_dtype="float32",
                                      affinity_impl="topk",
                                      lp_solver="cheby", lp_cg_iters=50),
}


def main():
    tmp = sys.argv[1]
    blocks = os.path.join(tmp, "blocks")
    ckpt = os.path.join(tmp, "pretrain", "pretrain_checkpoint.msgpack")
    from r3dfsseg_tpu.config import R3DConfig
    from r3dfsseg_tpu.learners.mpti_learner import MPTILearner
    from r3dfsseg_tpu.models.mpti import MPTINet
    from r3dfsseg_tpu.utils.checkpoint import load_pretrain_checkpoint
    from r3dfsseg_tpu.data.episodes import EpisodeSampler

    sampler = EpisodeSampler(blocks, "s3dis", cvfold=0, n_way=2, k_shot=5,
                             n_queries=1, mode="train", num_point=2048,
                             seed=123)
    ep = sampler.sample()

    for tag, kw in VARIANTS.items():
        cfg = R3DConfig(dataset="s3dis", cvfold=0, clean_data_path=blocks,
                        n_way=2, k_shot=5, n_queries=1, pc_npts=2048,
                        use_attention=True, seed=123, sigma=0.0, **kw)
        lrn = MPTILearner(cfg, rng=jax.random.PRNGKey(0))
        lrn.init(ep)
        params, stats = load_pretrain_checkpoint(ckpt, cfg)
        lrn.load_params(params, stats, encoder_only=True)
        model = MPTINet(cfg)
        variables = {"params": lrn.state.params,
                     "batch_stats": lrn.state.batch_stats}
        out = model.apply(variables, ep, train=False)
        ql = np.asarray(out.query_logits, np.float32)
        print(f"[{tag}] lp_loss={float(out.lp_loss):.4f} "
              f"|logits| mean={np.abs(ql).mean():.3e} "
              f"max={np.abs(ql).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
