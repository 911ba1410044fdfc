#!/usr/bin/env python
"""Graph-coupling diagnostic for the sigma0 TPU collapse: extract encoder
features at the pretrained checkpoint in bf16 vs f32 mode (on the chosen
platform), build the prototypes + affinity exactly like the model, and
print the proto<->query coupling mass.  Mechanism under test: with
n_protos = (n_way+1)*n_subprototypes = 300 > k_connect = 200, the graph
disconnects EXACTLY (query logits == 0, lp_loss == ln 3) whenever no
query's k-radius reaches a prototype and vice versa — a sharp margin that
encoder numerics can flip.

Usage: python scripts/debug_coupling.py <tmpdir> <cpu|axon>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if (sys.argv[2:3] or ["cpu"])[0] == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    tmp = sys.argv[1]
    blocks = os.path.join(tmp, "blocks")
    ckpt = os.path.join(tmp, "pretrain", "pretrain_checkpoint.msgpack")
    from r3dfsseg_tpu.config import R3DConfig
    from r3dfsseg_tpu.learners.mpti_learner import MPTILearner
    from r3dfsseg_tpu.models.mpti import MPTINet
    from r3dfsseg_tpu.utils.checkpoint import load_pretrain_checkpoint
    from r3dfsseg_tpu.data.episodes import EpisodeSampler
    from r3dfsseg_tpu.ops.lp import local_constrained_affinity

    sampler = EpisodeSampler(blocks, "s3dis", cvfold=0, n_way=2, k_shot=5,
                             n_queries=1, mode="train", num_point=2048,
                             seed=123)
    ep = sampler.sample()

    for tag, kw in (
        ("bf16", dict(compute_dtype="bfloat16", affinity_impl="threshold",
                      lp_solver="cheby", lp_cg_iters=50)),
        ("f32", dict(compute_dtype="float32", affinity_impl="threshold",
                     lp_solver="cheby", lp_cg_iters=50)),
    ):
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
        sf, qf = model.apply(variables, ep.with_batch_dim(), True,
                             method=MPTINet.extract_features,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(7)})[0]
        sf = np.asarray(sf, np.float32).reshape(-1, sf.shape[-1])
        qf = np.asarray(qf, np.float32).reshape(-1, qf.shape[-1])
        bad_s = np.sum(~np.isfinite(sf))
        bad_q = np.sum(~np.isfinite(qf))
        print(f"[{tag}] |support| mean {np.linalg.norm(sf, axis=1).mean():.3f}"
              f" std {sf.std():.4f} nonfinite {bad_s} | "
              f"|query| mean {np.linalg.norm(qf, axis=1).mean():.3f}"
              f" std {qf.std():.4f} nonfinite {bad_q}", flush=True)

        # model-identical prototype construction would need FPS; a mean-
        # pooled proxy suffices for the coupling question: use random
        # support subsets as stand-in prototypes (same feature cloud).
        rng = np.random.default_rng(0)
        protos = np.stack([sf[rng.choice(len(sf), 64, replace=False)].mean(0)
                           for _ in range(300)])
        node = np.concatenate([protos, qf], axis=0)
        a = np.asarray(local_constrained_affinity(
            jnp.asarray(node), k=200, sigma=0.0, impl=cfg.affinity_impl,
            compare_dtype=(jnp.bfloat16 if tag == "bf16" else None)))
        pp = a[:300, :300].sum(); pq = a[:300, 300:].sum()
        qq = a[300:, 300:].sum()
        # distance scales
        d_pp = ((protos[:50, None] - protos[None, :50]) ** 2).sum(-1)
        d_pq = ((protos[:50, None] - qf[None, ::41][:, :50]) ** 2).sum(-1)
        d_qq = ((qf[::41][:50, None] - qf[None, ::41][:, :50]) ** 2).sum(-1)
        print(f"  affinity mass: p<->p {pp:.3e}  p<->q {pq:.3e} "
              f" q<->q {qq:.3e}")
        print(f"  median d2: p-p {np.median(d_pp):.3f}  p-q "
              f"{np.median(d_pq):.3f}  q-q {np.median(d_qq):.3f}", flush=True)


if __name__ == "__main__":
    main()
