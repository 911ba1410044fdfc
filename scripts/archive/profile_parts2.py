#!/usr/bin/env python
"""Chained per-component timings (tunnel-sync-free).

Each component runs k=10 dependent iterations per host sync: the output
feeds a scalar that perturbs the next input, so XLA cannot DCE or overlap
across the chain, and the ~30 ms tunnel round-trip amortises away.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _example_episode
    from r3dfsseg_tpu.config import R3DConfig
    from r3dfsseg_tpu.models.mpti import MPTINet
    from r3dfsseg_tpu.ops import label_propagate, local_constrained_affinity
    from r3dfsseg_tpu.ops.pallas_knn import knn_indices_pallas

    cfg = R3DConfig(compute_dtype="bfloat16", lp_cg_iters=30)
    rng = np.random.default_rng(0)
    ep = _example_episode(cfg, rng)
    model = MPTINet(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ep, train=False)

    K = 10

    def timeit(name, chain_fn, x0):
        """chain_fn: x -> x (same shape), jitted whole chain."""
        @jax.jit
        def chained(x):
            for _ in range(K):
                x = chain_fn(x)
            return jnp.sum(x.astype(jnp.float32))
        float(chained(x0))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            float(chained(x0))
        dt = (time.perf_counter() - t0) / (reps * K)
        print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    n, cin, d = cfg.pc_npts, cfg.pc_in_dim, cfg.feat_dim
    clouds = 12
    xs = jnp.asarray(rng.normal(size=(clouds, n, cin)), jnp.float32)

    # encoder forward
    def enc(x):
        out = model.apply(variables, x, train=False,
                          method=lambda m, xx, train: m.features(xx, train=train))
        return x * (1.0 + 1e-20 * jnp.sum(out))
    timeit("encoder fwd (12 clouds)", enc, xs)

    # encoder fwd+bwd
    def encg(x):
        def loss(xx):
            out = model.apply(variables, xx, train=False,
                              method=lambda m, a, train: m.features(a, train=train))
            return jnp.sum(out * out)
        g = jax.grad(loss)(x)
        return x + 1e-20 * g
    timeit("encoder fwd+bwd (12 clouds)", encg, xs)

    # kNN alone (3 dynamic graphs' worth: C=8 proxy for 9/64/64 widths)
    feats = jnp.asarray(rng.normal(size=(clouds, n, 64)), jnp.float32)

    def knn3(x):
        acc = 0.0
        for _ in range(3):
            idx = knn_indices_pallas(x, cfg.dgcnn_k)
            acc = acc + jnp.sum(idx)
        return x * (1.0 + 1e-20 * acc.astype(jnp.float32))
    timeit("3x pallas kNN (12x2048^2)", knn3, feats)

    # affinity + LP on the real node count
    m_nodes = cfg.num_nodes
    nf = jnp.asarray(rng.normal(size=(m_nodes, d)), jnp.float32)
    y = jnp.zeros((m_nodes, cfg.n_way + 1), jnp.float32)
    y = y.at[:100, 0].set(1.0)

    def aff(x):
        a = local_constrained_affinity(x, cfg.k_connect, cfg.sigma,
                                       impl=cfg.affinity_impl)
        return x * (1.0 + 1e-20 * jnp.sum(a))
    timeit(f"affinity ({m_nodes} nodes)", aff, nf)

    def lp_fwd(x):
        a = local_constrained_affinity(x, cfg.k_connect, cfg.sigma,
                                       impl=cfg.affinity_impl)
        z = label_propagate(a, y, cfg.lp_alpha, solver="cg",
                            cg_iters=cfg.lp_cg_iters)
        return x * (1.0 + 1e-20 * jnp.sum(z))
    timeit("affinity+LP cg30 fwd", lp_fwd, nf)

    def lp_grad(x):
        def loss(xx):
            a = local_constrained_affinity(xx, cfg.k_connect, cfg.sigma,
                                           impl=cfg.affinity_impl)
            z = label_propagate(a, y, cfg.lp_alpha, solver="cg",
                                cg_iters=cfg.lp_cg_iters)
            return jnp.sum(z * z)
        g = jax.grad(loss)(x)
        return x + 1e-20 * g
    timeit("affinity+LP cg30 fwd+bwd", lp_grad, nf)

    # full model forward (train mode, incl. contrast)
    epj = jax.tree.map(lambda a: jnp.asarray(a), ep)

    def full(x):
        out = model.apply(variables, epj._replace(support_x=x), train=True,
                          rngs={"dropout": jax.random.PRNGKey(0)},
                          mutable=["batch_stats"])[0]
        return x * (1.0 + 1e-20 * (out.lp_loss + out.contrast_loss))
    timeit("full fwd train (E=1)", full, epj.support_x)

    def fullg(x):
        def loss(xx):
            out = model.apply(variables, epj._replace(support_x=xx),
                              train=True,
                              rngs={"dropout": jax.random.PRNGKey(0)},
                              mutable=["batch_stats"])[0]
            return out.lp_loss + 0.1 * out.contrast_loss
        g = jax.grad(loss)(x)
        return x + 1e-20 * g
    timeit("full fwd+bwd train (E=1)", fullg, epj.support_x)


if __name__ == "__main__":
    main()
