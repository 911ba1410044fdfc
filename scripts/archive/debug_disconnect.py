#!/usr/bin/env python
"""Single-forward isolation of the sigma0 bf16 iter-1 graph disconnect.

The sigma0 A/B shows lp_loss pinned at ln(3) from ITERATION 1 in the bf16
leg while f32 starts at 1.406 and learns — a pure forward-pass difference
at the same pretrained parameters.  This probe runs the affinity
construction at that exact point in a 2x2 grid (encoder dtype x graph
dtype) and reports where the proto<->query coupling dies: edge topology
(no proto-query edges selected) vs bandwidth (edges selected but weights
underflow).

Usage: python scripts/debug_disconnect.py <tmpdir> [cpu|axon]
  tmpdir must hold blocks/ and pretrain/pretrain_checkpoint.msgpack
  (an ab_convergence.py workdir).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if (sys.argv[2:3] or ["axon"])[0] == "cpu":
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
    from r3dfsseg_tpu.ops.fps import multi_prototypes
    from r3dfsseg_tpu.ops.lp import (label_propagate,
                                     local_constrained_affinity)
    from r3dfsseg_tpu.utils.checkpoint import load_pretrain_checkpoint
    from r3dfsseg_tpu.data import NoisyEpisodeSampler

    # the exact sampler the A/B's train() uses (noisy meta-train episodes)
    sampler = NoisyEpisodeSampler(
        blocks, "s3dis", cvfold=0, n_way=2, k_shot=5, n_queries=1,
        mode="train", num_point=2048, noise_ratio=[0.0, 0.2, 0.4],
        noise_type="train", seed=123)
    ep0 = sampler.sample()

    grid = [("f32", "f32"), ("f32", "bf16"), ("bf16", "f32"),
            ("bf16", "bf16")]
    for enc, gra in grid:
        cfg = R3DConfig(
            dataset="s3dis", cvfold=0, clean_data_path=blocks,
            n_way=2, k_shot=5, n_queries=1, pc_npts=2048,
            use_attention=True, seed=123, sigma=0.0,
            affinity_impl="threshold", lp_solver="cheby", lp_cg_iters=50,
            compute_dtype=("bfloat16" if enc == "bf16" else "float32"),
            graph_dtype=("bfloat16" if gra == "bf16" else "float32"))
        lrn = MPTILearner(cfg, rng=jax.random.PRNGKey(0))
        lrn.init(ep0)
        params, stats = load_pretrain_checkpoint(ckpt, cfg)
        lrn.load_params(params, stats, encoder_only=True)
        model = MPTINet(cfg)
        variables = {"params": lrn.state.params,
                     "batch_stats": lrn.state.batch_stats}
        ep = ep0.with_batch_dim()
        (sf, qf), _ = model.apply(
            variables, ep, True, method=MPTINet.extract_features,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(7)})
        sf = jnp.asarray(sf[0], jnp.float32)           # (w, k, N, d)
        qf = jnp.asarray(qf[0], jnp.float32)           # (q*w, N, d)
        n_way, k_shot, n, d = sf.shape
        np_ = cfg.n_subprototypes
        fg = np.asarray(ep.support_y[0]) > 0

        flat = sf.reshape(n_way, k_shot * n, d)
        fg_flat = jnp.asarray(fg.reshape(n_way, k_shot * n))
        fg_mp = jax.vmap(lambda f, m: multi_prototypes(f, m, np_))(
            flat, fg_flat)
        bg_mp = multi_prototypes(sf.reshape(-1, d),
                                 jnp.asarray((~fg).reshape(-1)), np_)
        protos = jnp.concatenate(
            [bg_mp.prototypes[None], fg_mp.prototypes], 0).reshape(-1, d)
        pvalid = jnp.concatenate(
            [bg_mp.proto_valid[None], fg_mp.proto_valid], 0).reshape(-1)
        qflat = qf.reshape(-1, d)
        node = jnp.concatenate([protos, qflat], 0)
        valid = jnp.concatenate(
            [pvalid, jnp.ones(qflat.shape[0], bool)], 0)

        lowp = jnp.bfloat16 if gra == "bf16" else None
        a = local_constrained_affinity(node, cfg.k_connect, 0.0,
                                       valid=valid, impl="threshold",
                                       compare_dtype=lowp)
        a = np.asarray(a, np.float32)
        npr = protos.shape[0]
        pq = a[:npr, npr:]
        nz = pq > 0
        # external replica of the auto-bandwidth computation, both dtypes
        from r3dfsseg_tpu.ops.lp import _kth_smallest_per_row
        from r3dfsseg_tpu.ops.knn import pairwise_sqdist
        sqd = pairwise_sqdist(node.astype(jnp.float32))
        big = jnp.asarray(3.4e38, jnp.float32)
        selm = jnp.where(jnp.eye(node.shape[0], dtype=bool), big, sqd)
        selm = jnp.where(valid[None, :], selm, big)
        if lowp is not None:
            r = _kth_smallest_per_row(selm.astype(lowp), cfg.k_connect,
                                      iters=16)
        else:
            r = _kth_smallest_per_row(selm, cfg.k_connect)
        r = np.asarray(r, np.float32).reshape(-1)
        vv = np.asarray(valid)
        med = np.median(r[vv])
        print(f"   sigma2={med / 4.0:.4f} "
              f"kth[protos] med={np.median(r[:npr][vv[:npr]]):.2f} "
              f"kth[queries] med={np.median(r[npr:]):.2f} "
              f"pvalid={int(vv[:npr].sum())}/{npr}", flush=True)
        # forward LP loss
        n_classes = cfg.n_classes
        lbl = jnp.repeat(jax.nn.one_hot(jnp.arange(n_way + 1), n_classes),
                         np_, axis=0) * pvalid[:, None]
        y0 = jnp.concatenate(
            [lbl, jnp.zeros((qflat.shape[0], n_classes))], 0)
        z = label_propagate(jnp.asarray(a), y0, cfg.lp_alpha,
                            solver="cheby", cg_iters=50, matvec_dtype=lowp)
        ql = z[npr:].reshape(cfg.n_queries * n_way, n, n_classes)
        logp = jax.nn.log_softmax(ql, -1)
        lp_loss = -jnp.mean(jnp.take_along_axis(
            logp, jnp.asarray(ep.query_y[0])[..., None], -1))
        print(f"[enc={enc} graph={gra}] lp_loss={float(lp_loss):.4f} "
              f"pq_edges={int(nz.sum())} pq_mass={float(pq.sum()):.3e} "
              f"pq_max={float(pq.max()):.3e} "
              f"|logits| max={float(jnp.abs(ql).max()):.3e} "
              f"queries_with_proto_edge={int((nz.sum(0) > 0).sum())}/"
              f"{pq.shape[1]}", flush=True)


if __name__ == "__main__":
    main()
