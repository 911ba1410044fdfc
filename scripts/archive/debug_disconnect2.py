#!/usr/bin/env python
"""Stage-2 disconnect bisect: the out-of-model affinity replication is
healthy for graph_dtype=bf16 while train() pins lp_loss at ln(3) from
iter 1 on the same checkpoint.  Walk the call-path levels for the exact
failing config (f32 encoder + bf16 graph, sigma=0, threshold, cheby50):

  L1: model.apply full forward, no jit
  L2: jax.jit(model.apply) forward
  L3: learner._train_step (value_and_grad + optimizer)

Usage: python scripts/debug_disconnect2.py <tmpdir> [cpu|axon]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if (sys.argv[2:3] or ["axon"])[0] == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main():
    tmp = sys.argv[1]
    blocks = os.path.join(tmp, "blocks")
    ckpt = os.path.join(tmp, "pretrain", "pretrain_checkpoint.msgpack")

    from r3dfsseg_tpu.config import R3DConfig
    from r3dfsseg_tpu.learners.mpti_learner import MPTILearner
    from r3dfsseg_tpu.utils.checkpoint import load_pretrain_checkpoint
    from r3dfsseg_tpu.data import NoisyEpisodeSampler

    sampler = NoisyEpisodeSampler(
        blocks, "s3dis", cvfold=0, n_way=2, k_shot=5, n_queries=1,
        mode="train", num_point=2048, noise_ratio=[0.0, 0.2, 0.4],
        noise_type="train", seed=123)
    ep = sampler.sample()

    cfg = R3DConfig(
        dataset="s3dis", cvfold=0, clean_data_path=blocks,
        n_way=2, k_shot=5, n_queries=1, pc_npts=2048,
        use_attention=True, seed=123, sigma=0.0,
        affinity_impl="threshold", lp_solver="cheby", lp_cg_iters=50,
        lp_adjoint_iters=30,
        compute_dtype="float32", graph_dtype="bfloat16")
    lrn = MPTILearner(cfg, rng=jax.random.PRNGKey(0))
    lrn.init(ep)
    params, stats = load_pretrain_checkpoint(ckpt, cfg)
    lrn.load_params(params, stats, encoder_only=True)

    variables = {"params": lrn.state.params,
                 "batch_stats": lrn.state.batch_stats}

    def fwd(variables, ep):
        out, _ = lrn.model.apply(variables, ep, train=True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.PRNGKey(7)})
        return out.lp_loss, out.contrast_loss

    lp, cl = fwd(variables, ep)
    print(f"L1 nojit   lp={float(lp):.4f} contrast={float(cl):.4f}",
          flush=True)
    lp, cl = jax.jit(fwd)(variables, ep)
    print(f"L2 jit     lp={float(lp):.4f} contrast={float(cl):.4f}",
          flush=True)
    m = lrn.train(ep)
    print(f"L3 train   lp={float(m['lp_loss']):.4f} "
          f"contrast={float(m['contrast_loss']):.4f}", flush=True)


if __name__ == "__main__":
    main()
