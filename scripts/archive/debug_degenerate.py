#!/usr/bin/env python
"""Post-mortem of the ln(3)-degenerate optimized A/B leg: load a trained
checkpoint, run one episode forward in relaxed and parity modes, and print
graph-health statistics (feature scale, pairwise-distance distribution,
gaussian similarity mass, query-logit magnitudes).  Tests the hypothesis
that the fixed-sigma gaussian affinity dies when feature norms grow.

Usage: python scripts/debug_degenerate.py <ckpt.msgpack> <blocks_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # post-mortem off-chip

import numpy as np
import jax.numpy as jnp


def main():
    ckpt = sys.argv[1]
    blocks = sys.argv[2]
    from r3dfsseg_tpu.config import R3DConfig
    from r3dfsseg_tpu.learners.mpti_learner import MPTILearner
    from r3dfsseg_tpu.models.mpti import MPTINet
    from r3dfsseg_tpu.utils.checkpoint import load_checkpoint
    from r3dfsseg_tpu.data.episodes import EpisodeSampler

    for tag, kw in (
        ("bf16-relaxed", dict(compute_dtype="bfloat16",
                              affinity_impl="threshold", lp_solver="cheby",
                              lp_cg_iters=50)),
        ("f32-parity", dict(compute_dtype="float32", affinity_impl="topk",
                            lp_solver="solve", knn_impl="xla")),
    ):
        cfg = R3DConfig(dataset="s3dis", cvfold=0, clean_data_path=blocks,
                        n_way=2, k_shot=5, n_queries=1, pc_npts=2048,
                        use_attention=True, seed=5, **kw)
        lrn = MPTILearner(cfg, rng=jax.random.PRNGKey(0))
        sampler = EpisodeSampler(
            blocks, "s3dis", cvfold=0, n_way=2, k_shot=5, n_queries=1,
            mode="train", num_point=2048, seed=5)
        ep = sampler.sample()
        lrn.init(ep)
        _, state = load_checkpoint(ckpt, lrn.state)

        model = MPTINet(cfg)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = model.apply(variables, ep, train=False)
        sf, qf = model.apply(variables, ep.with_batch_dim(), False,
                             method=MPTINet.extract_features)
        sf = np.asarray(sf, np.float32).reshape(-1, sf.shape[-1])
        qf = np.asarray(qf, np.float32).reshape(-1, qf.shape[-1])
        sub_s = sf[::37][:512]
        sub_q = qf[::37][:512]
        d_sq = ((sub_s[:, None] - sub_q[None]) ** 2).sum(-1)
        d_qq = ((sub_q[:, None] - sub_q[None]) ** 2).sum(-1)
        sim_sq = np.exp(-0.5 * d_sq)
        ql = np.asarray(out.query_logits, np.float32)
        print(f"[{tag}] lp_loss={float(out.lp_loss):.4f} "
              f"|logits| mean={np.abs(ql).mean():.3e} max={np.abs(ql).max():.3e}")
        print(f"  feat |.|: support {np.linalg.norm(sf, axis=-1).mean():.2f} "
              f"query {np.linalg.norm(qf, axis=-1).mean():.2f}")
        print(f"  d^2 s<->q: median {np.median(d_sq):.1f} "
              f"p5 {np.percentile(d_sq, 5):.1f} min {d_sq.min():.1f}; "
              f"q<->q median {np.median(d_qq):.1f} min(nz) "
              f"{np.percentile(d_qq[d_qq > 0], 1):.2f}")
        print(f"  sim s<->q: max {sim_sq.max():.3e} "
              f"frac>1e-6 {np.mean(sim_sq > 1e-6):.4f}")


if __name__ == "__main__":
    main()
