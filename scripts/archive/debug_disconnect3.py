#!/usr/bin/env python
"""Stage-3 disconnect bisect: the bf16-graph forward is healthy eagerly
(op-by-op dispatch) but pins lp_loss at ln(3) under whole-program jit.
Split the jit boundary to find which stage XLA miscompiles/rewrites:

  A: jit(encoder) -> eager graph
  B: eager encoder -> jit(graph)          [graph = protos+affinity+LP]
  C: jit(encoder+graph) returning intermediates (sigma2, kth, pq mass)

Usage: python scripts/debug_disconnect3.py <tmpdir> [cpu|axon]
"""
import os
import sys
from functools import partial

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
    from r3dfsseg_tpu.models.mpti import MPTINet
    from r3dfsseg_tpu.ops.fps import multi_prototypes
    from r3dfsseg_tpu.ops.lp import (_kth_smallest_per_row, label_propagate,
                                     local_constrained_affinity)
    from r3dfsseg_tpu.ops.knn import pairwise_sqdist
    from r3dfsseg_tpu.utils.checkpoint import load_pretrain_checkpoint
    from r3dfsseg_tpu.data import NoisyEpisodeSampler

    sampler = NoisyEpisodeSampler(
        blocks, "s3dis", cvfold=0, n_way=2, k_shot=5, n_queries=1,
        mode="train", num_point=2048, noise_ratio=[0.0, 0.2, 0.4],
        noise_type="train", seed=123)
    ep0 = sampler.sample()

    cfg = R3DConfig(
        dataset="s3dis", cvfold=0, clean_data_path=blocks,
        n_way=2, k_shot=5, n_queries=1, pc_npts=2048,
        use_attention=True, seed=123, sigma=0.0,
        affinity_impl="threshold", lp_solver="cheby", lp_cg_iters=50,
        compute_dtype="float32", graph_dtype="bfloat16")
    lrn = MPTILearner(cfg, rng=jax.random.PRNGKey(0))
    lrn.init(ep0)
    params, stats = load_pretrain_checkpoint(ckpt, cfg)
    lrn.load_params(params, stats, encoder_only=True)
    model = MPTINet(cfg)
    variables = {"params": lrn.state.params,
                 "batch_stats": lrn.state.batch_stats}

    def features(variables, ep):
        (sf, qf), _ = model.apply(
            variables, ep.with_batch_dim(), True,
            method=MPTINet.extract_features,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(7)})
        return sf[0].astype(jnp.float32), qf[0].astype(jnp.float32)

    def graph(sf, qf, support_y, query_y):
        n_way, k_shot, n, d = sf.shape
        np_ = cfg.n_subprototypes
        fg = support_y > 0
        flat = sf.reshape(n_way, k_shot * n, d)
        fg_flat = fg.reshape(n_way, k_shot * n)
        fg_mp = jax.vmap(lambda f, m: multi_prototypes(f, m, np_))(
            flat, fg_flat)
        bg_mp = multi_prototypes(sf.reshape(-1, d), (~fg).reshape(-1), np_)
        protos = jnp.concatenate(
            [bg_mp.prototypes[None], fg_mp.prototypes], 0).reshape(-1, d)
        pvalid = jnp.concatenate(
            [bg_mp.proto_valid[None], fg_mp.proto_valid], 0).reshape(-1)
        qflat = qf.reshape(-1, d)
        node = jnp.concatenate([protos, qflat], 0)
        valid = jnp.concatenate(
            [pvalid, jnp.ones(qflat.shape[0], bool)], 0)
        lowp = jnp.bfloat16
        a = local_constrained_affinity(node, cfg.k_connect, 0.0,
                                       valid=valid, impl="threshold",
                                       compare_dtype=lowp)
        npr = protos.shape[0]
        # diag: replicate radius/sigma2 from the bf16-gram distances the
        # affinity actually used
        f32 = node.astype(jnp.float32)
        xc = f32 - jnp.mean(f32, axis=0, keepdims=True)
        xb = xc.astype(lowp)
        xx = jnp.sum(xc * xc, axis=-1, keepdims=True)
        inner = jnp.einsum("nc,mc->nm", xb, xb,
                           preferred_element_type=jnp.float32)
        sqd = jnp.maximum(xx - 2.0 * inner + xx.T, 0.0)
        big = jnp.asarray(3.4e38, jnp.float32)
        sel = jnp.where(jnp.eye(node.shape[0], dtype=bool), big, sqd)
        sel = jnp.where(valid[None, :], sel, big)
        radius = _kth_smallest_per_row(sel.astype(lowp), cfg.k_connect,
                                       iters=16).astype(jnp.float32)
        r = radius.reshape(-1)
        srt = jnp.sort(jnp.where(valid, r, jnp.inf))
        nv = jnp.sum(valid.astype(jnp.int32))
        med = srt[jnp.clip((nv - 1) // 2, 0, r.shape[0] - 1)]
        n_classes = cfg.n_classes
        lbl = jnp.repeat(jax.nn.one_hot(jnp.arange(n_way + 1), n_classes),
                         np_, axis=0) * pvalid[:, None]
        y0 = jnp.concatenate(
            [lbl, jnp.zeros((qflat.shape[0], n_classes))], 0)
        z = label_propagate(a, y0, cfg.lp_alpha, solver="cheby",
                            cg_iters=50, matvec_dtype=lowp)
        ql = z[npr:].reshape(cfg.n_queries * n_way, n, n_classes)
        logp = jax.nn.log_softmax(ql, -1)
        lp_loss = -jnp.mean(jnp.take_along_axis(
            logp, query_y[..., None], -1))
        return dict(lp=lp_loss, med=med, sigma2=jnp.maximum(med / 4, 1e-12),
                    pq_mass=jnp.sum(a[:npr, npr:]),
                    pq_edges=jnp.sum((a[:npr, npr:] > 0)),
                    pvalid=jnp.sum(pvalid),
                    radius_zero_rows=jnp.sum((r < 1e-6) & valid),
                    logit_max=jnp.abs(ql).max())

    sy = jnp.asarray(ep0.support_y)
    qy = jnp.asarray(ep0.query_y)

    def report(tag, d):
        print(tag + " " + " ".join(
            f"{k}={float(v):.6g}" for k, v in sorted(d.items())), flush=True)

    sf, qf = jax.jit(features)(variables, ep0)        # jitted encoder
    report("A jit(enc)+eager(graph)", graph(sf, qf, sy, qy))
    sfe, qfe = features(variables, ep0)               # eager encoder
    report("B eager(enc)+jit(graph)", jax.jit(graph)(sfe, qfe, sy, qy))
    report("C jit(all)", jax.jit(
        lambda v, e, s, q: graph(*features(v, e), s, q))(
            variables, ep0, sy, qy))


if __name__ == "__main__":
    main()
