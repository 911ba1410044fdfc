#!/usr/bin/env python
"""Gradient-quality diagnostic for the round-3 relaxed modes.

Same params + same episode, compute (loss, grads) under config variants and
report per-variant global gradient cosine similarity and norm ratio vs the
f32 parity stack.  Pinpoints which relaxation damages the training signal
without running full convergence A/Bs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from r3dfsseg_tpu.config import R3DConfig
from r3dfsseg_tpu.learners.mpti_learner import MPTILearner
from r3dfsseg_tpu.models.episode import Episode, stack_episodes


def make_episode(seed=0, n_way=2, k_shot=5, n_queries=1, n=2048):
    rng = np.random.RandomState(seed)
    def cloud():
        xyz = rng.randn(n, 3).astype(np.float32)
        feat = rng.rand(n, 6).astype(np.float32)
        return np.concatenate([xyz, feat], 1)
    support_x = np.stack([[cloud() for _ in range(k_shot)]
                          for _ in range(n_way)])
    support_y = (rng.rand(n_way, k_shot, n) < 0.3).astype(np.int32)
    query_x = np.stack([cloud() for _ in range(n_way * n_queries)])
    query_y = rng.randint(0, n_way + 1, (n_way * n_queries, n)).astype(np.int32)
    return Episode(
        support_x=jnp.asarray(support_x), support_y=jnp.asarray(support_y),
        query_x=jnp.asarray(query_x), query_y=jnp.asarray(query_y),
        gt_support_y=jnp.asarray(support_y),
        support_flag=jnp.ones((n_way, k_shot), jnp.int32))


def grads_for(cfg, params, batch_stats, ep, rng):
    lrn = MPTILearner(cfg, rng=rng)

    def loss_fn(p):
        out, _ = lrn.model.apply(
            {"params": p, "batch_stats": batch_stats}, ep, train=True,
            mutable=["batch_stats"], rngs={"dropout": rng})
        return out.lp_loss + cfg.contrast_weight * out.contrast_loss, out

    (loss, out), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, out, g


def flat(tree):
    return jnp.concatenate([x.reshape(-1).astype(jnp.float32)
                            for x in jax.tree.leaves(tree)])


def main():
    base = dict(n_way=2, k_shot=5, n_queries=1, pc_npts=2048,
                use_attention=True, episode_batch=1)
    variants = {
        "parity": dict(compute_dtype="float32", affinity_impl="topk",
                       lp_solver="solve"),
        "f32+thresh+cheby50": dict(compute_dtype="float32",
                                   affinity_impl="threshold",
                                   lp_solver="cheby", lp_cg_iters=50),
        "bf16+thresh+cg30 (r2pt)": dict(compute_dtype="bfloat16",
                                        affinity_impl="threshold",
                                        lp_solver="cg", lp_cg_iters=30),
        "bf16+thresh+cheby50": dict(compute_dtype="bfloat16",
                                    affinity_impl="threshold",
                                    lp_solver="cheby", lp_cg_iters=50),
        "bf16+cheby50+adj30 (r3)": dict(compute_dtype="bfloat16",
                                        affinity_impl="threshold",
                                        lp_solver="cheby", lp_cg_iters=50,
                                        lp_adjoint_iters=30),
    }

    ep = stack_episodes([make_episode(s) for s in range(1)])
    cfg0 = R3DConfig(**base, **variants["parity"])
    lrn0 = MPTILearner(cfg0, rng=jax.random.PRNGKey(0))
    lrn0.init(ep)
    params, stats = lrn0.state.params, lrn0.state.batch_stats
    rng = jax.random.PRNGKey(42)

    ref = None
    for name, kv in variants.items():
        cfg = R3DConfig(**base, **kv)
        loss, out, g = grads_for(cfg, params, stats, ep, rng)
        gf = flat(g)
        if ref is None:
            ref = gf
        cos = float(jnp.vdot(ref, gf) /
                    (jnp.linalg.norm(ref) * jnp.linalg.norm(gf) + 1e-30))
        nr = float(jnp.linalg.norm(gf) / (jnp.linalg.norm(ref) + 1e-30))
        nan = int(jnp.sum(~jnp.isfinite(gf)))
        print(f"{name:28s} loss={float(loss):.4f} "
              f"lp={float(out.lp_loss):.4f} cos={cos:+.4f} "
              f"|g|/|g_ref|={nr:.3f} nonfinite={nan}")


if __name__ == "__main__":
    main()
