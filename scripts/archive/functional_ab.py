#!/usr/bin/env python
"""Functional-agreement A/B: does the relaxed (bf16) stack compute the same
FUNCTION as the f32 parity stack at realistic parameter points?

Training-trajectory A/Bs on the synthetic task turned out to be invalid as
an accuracy gate: the task is bistable (a ln(3) graph-decoupling absorbing
state exists in the reference's own math — fixed sigma=1 gaussian affinity
vs. growing feature scale) and BOTH the f32-parity and bf16 stacks fall
into or escape it depending on seed/trajectory, not numerics
(scripts/debug_degenerate.py).  The discriminative test is functional:
at checkpoints from healthy trajectories, compare the two stacks' forward
outcomes (query argmax agreement, lp_loss delta) and gradient direction.

Usage: python scripts/functional_ab.py <blocks_dir> <ckpt.msgpack> [...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


RELAXED = dict(compute_dtype="bfloat16", affinity_impl="threshold",
               lp_solver="cheby", lp_cg_iters=50, lp_adjoint_iters=30)
PARITY = dict(compute_dtype="float32", affinity_impl="topk",
              lp_solver="solve", knn_impl="xla")


def build(kw, blocks):
    from r3dfsseg_tpu.config import R3DConfig
    from r3dfsseg_tpu.learners.mpti_learner import MPTILearner

    cfg = R3DConfig(dataset="s3dis", cvfold=0, clean_data_path=blocks,
                    n_way=2, k_shot=5, n_queries=1, pc_npts=2048,
                    use_attention=True, seed=5, **kw)
    return cfg, MPTILearner(cfg, rng=jax.random.PRNGKey(0))


def grads_of(lrn, cfg, state, ep, rng):
    def loss_fn(p):
        out, _ = lrn.model.apply(
            {"params": p, "batch_stats": state.batch_stats}, ep, train=True,
            mutable=["batch_stats"], rngs={"dropout": rng})
        return out.lp_loss + cfg.contrast_weight * out.contrast_loss
    return jax.grad(loss_fn)(state.params)


def flat(tree):
    return jnp.concatenate([x.reshape(-1).astype(jnp.float32)
                            for x in jax.tree.leaves(tree)])


def main():
    blocks = sys.argv[1]
    ckpts = sys.argv[2:]
    from r3dfsseg_tpu.data.episodes import EpisodeSampler
    from r3dfsseg_tpu.utils.checkpoint import load_checkpoint

    cfg_a, lrn_a = build(RELAXED, blocks)
    cfg_b, lrn_b = build(PARITY, blocks)
    sampler = EpisodeSampler(blocks, "s3dis", cvfold=0, n_way=2, k_shot=5,
                             n_queries=1, mode="train", num_point=2048,
                             seed=11)
    eps = [sampler.sample() for _ in range(8)]
    lrn_a.init(eps[0])
    lrn_b.init(eps[0])

    for ck in ckpts:
        _, sa = load_checkpoint(ck, lrn_a.state)
        _, sb = load_checkpoint(ck, lrn_b.state)
        lrn_a.state, lrn_b.state = sa, sb
        agree, dlp, dacc, coss = [], [], [], []
        for i, ep in enumerate(eps):
            pa, la, aa = lrn_a.test(ep)
            pb, lb, ab = lrn_b.test(ep)
            agree.append(float(jnp.mean((pa == pb).astype(jnp.float32))))
            dlp.append(abs(float(la) - float(lb)))
            dacc.append(abs(float(aa) - float(ab)))
            if i < 2:   # gradient direction at this parameter point
                rng = jax.random.PRNGKey(99 + i)
                ga = flat(grads_of(lrn_a, cfg_a, sa, ep, rng))
                gb = flat(grads_of(lrn_b, cfg_b, sb, ep, rng))
                coss.append(float(jnp.vdot(ga, gb) /
                                  (jnp.linalg.norm(ga) * jnp.linalg.norm(gb)
                                   + 1e-30)))
        print(f"{os.path.basename(os.path.dirname(ck))}/"
              f"{os.path.basename(ck)}: argmax agreement "
              f"{np.mean(agree):.4f} (min {np.min(agree):.4f}) | "
              f"|d lp_loss| mean {np.mean(dlp):.4f} max {np.max(dlp):.4f} | "
              f"|d acc| mean {np.mean(dacc):.4f} | "
              f"grad cos {['%.3f' % c for c in coss]}", flush=True)


if __name__ == "__main__":
    main()
