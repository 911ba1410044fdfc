#!/usr/bin/env python
"""Round-3 fine-grained component timings at the current design point
(bf16, threshold affinity, cheby-50 LP, Pallas kNN, E=1).

Chained K=10 dependent iterations per host sync (tunnel-sync-free), same
methodology as profile_parts2.py, but additionally isolates: neighbour
gather fwd / scatter bwd at the EdgeConv shape, FPS multi-prototypes,
WayContrast, MDNS, and attention — to rank the remaining hotspots.
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
    from r3dfsseg_tpu.models.mpti import MPTINet, _contrast_prototypes
    from r3dfsseg_tpu.models.mpti import mdns_keep_mask
    from r3dfsseg_tpu.ops import label_propagate, local_constrained_affinity
    from r3dfsseg_tpu.ops.fast_gather import gather_neighbors_fast
    from r3dfsseg_tpu.ops.fps import multi_prototypes
    from r3dfsseg_tpu.ops.pallas_knn import knn_indices_pallas

    cfg = R3DConfig(compute_dtype="bfloat16", lp_solver="cheby",
                    lp_cg_iters=50)
    rng = np.random.default_rng(0)
    ep = _example_episode(cfg, rng)
    model = MPTINet(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ep, train=False)

    K = 10

    def timeit(name, chain_fn, x0):
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
        print(f"{name:40s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    n, cin, d = cfg.pc_npts, cfg.pc_in_dim, cfg.feat_dim
    clouds = 12
    kk = cfg.dgcnn_k

    # ---- neighbour gather at the EdgeConv shape, both dtypes ----
    idx = jnp.asarray(rng.integers(0, n, size=(clouds, n, kk)), jnp.int32)
    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        tbl = jnp.asarray(rng.normal(size=(clouds, n, 64)), dt)

        def gf(x):
            g = gather_neighbors_fast(x, idx, False)
            return x * (1.0 + 1e-20 * jnp.sum(g.astype(jnp.float32)))
        timeit(f"gather fwd ({dt_name}, 12x2048x20x64)", gf, tbl)

        def gb(x):
            def loss(xx):
                g = gather_neighbors_fast(xx, idx, False)
                return jnp.sum((g * g).astype(jnp.float32))
            g = jax.grad(loss)(x)
            return x + (1e-20 * g).astype(x.dtype)
        timeit(f"gather fwd+bwd ({dt_name})", gb, tbl)

    # ---- 3x kNN ----
    feats = jnp.asarray(rng.normal(size=(clouds, n, 64)), jnp.float32)

    def knn3(x):
        acc = 0.0
        for _ in range(3):
            i3 = knn_indices_pallas(x, kk)
            acc = acc + jnp.sum(i3)
        return x * (1.0 + 1e-20 * acc.astype(jnp.float32))
    timeit("3x pallas kNN (12x2048^2)", knn3, feats)

    # ---- attention fwd+bwd (12 clouds, 256->64), standalone module ----
    from r3dfsseg_tpu.nn.dgcnn import SelfAttention
    att_in = jnp.asarray(rng.normal(size=(clouds, n, 256)), jnp.float32)
    att_mod = SelfAttention(cfg.output_dim, cfg.attn_dropout,
                            dtype=jnp.bfloat16)
    att_vars = att_mod.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        att_in, train=False)

    def att(x):
        def loss(xx):
            out = att_mod.apply(att_vars, xx, train=True,
                                rngs={"dropout": jax.random.PRNGKey(0)})
            return jnp.sum(out.astype(jnp.float32) ** 2)
        g = jax.grad(loss)(x)
        return x + 1e-20 * g
    timeit("attention fwd+bwd (12x2048, train)", att, att_in)

    # ---- FPS multi-prototypes: 2 ways (k_shot*N pts) + bg (w*k*N pts) ----
    wpts = cfg.k_shot * n
    wfeat = jnp.asarray(rng.normal(size=(cfg.n_way, wpts, d)), jnp.float32)
    wmask = jnp.asarray(rng.random((cfg.n_way, wpts)) < 0.3)
    bfeat = jnp.asarray(
        rng.normal(size=(cfg.n_way * wpts, d)), jnp.float32)
    bmask = jnp.asarray(rng.random((cfg.n_way * wpts,)) < 0.6)

    def fps_all(x):
        mp = jax.vmap(
            lambda f, m: multi_prototypes(f, m, cfg.n_subprototypes))(x, wmask)
        bg = multi_prototypes(bfeat, bmask, cfg.n_subprototypes)
        s = jnp.sum(mp.prototypes.astype(jnp.float32)) + \
            jnp.sum(bg.prototypes.astype(jnp.float32))
        return x * (1.0 + 1e-20 * s)
    timeit("FPS protos (2 ways + bg, k=100)", fps_all, wfeat)

    def fps_grad(x):
        def loss(xx):
            mp = jax.vmap(
                lambda f, m: multi_prototypes(f, m, cfg.n_subprototypes))(xx, wmask)
            bg = multi_prototypes(bfeat, bmask, cfg.n_subprototypes)
            return jnp.sum(mp.prototypes.astype(jnp.float32) ** 2) + \
                jnp.sum(bg.prototypes.astype(jnp.float32) ** 2)
        g = jax.grad(loss)(x)
        return x + 1e-20 * g
    timeit("FPS protos fwd+bwd", fps_grad, wfeat)

    # ---- WayContrast path ----
    sfeat = jnp.asarray(
        rng.normal(size=(cfg.n_way, cfg.k_shot, n, d)), jnp.float32)
    sy = jnp.asarray(rng.random((cfg.n_way, cfg.k_shot, n)) < 0.3)
    sflag = jnp.asarray(
        rng.integers(1, 13, size=(cfg.n_way, cfg.k_shot)), jnp.float32)

    def contrast(x):
        def loss(xx):
            pr, pv, lab, sv = _contrast_prototypes(
                xx, sy, sflag, cfg.contrast_fps_k)
            return jnp.sum(pr.astype(jnp.float32) ** 2)
        g = jax.grad(loss)(x)
        return x + 1e-20 * g
    timeit("contrast protos fwd+bwd (fps_k=4)", contrast, sfeat)

    # ---- MDNS (eval path) ----
    xyz = jnp.asarray(rng.random((cfg.n_way, cfg.k_shot, n, 3)), jnp.float32)

    def mdns(x):
        keep, flag = mdns_keep_mask(x, sy, xyz, cfg.mdns_scales)
        return x * (1.0 + 1e-20 * jnp.sum(keep))
    timeit("MDNS keep mask (eval)", mdns, sfeat)

    # ---- affinity + LP at the design point ----
    m_nodes = cfg.num_nodes
    nf = jnp.asarray(rng.normal(size=(m_nodes, d)), jnp.float32)
    y = jnp.zeros((m_nodes, cfg.n_way + 1), jnp.float32)
    y = y.at[:100, 0].set(1.0)
    lowp = jnp.bfloat16

    def aff(x):
        a = local_constrained_affinity(x, cfg.k_connect, cfg.sigma,
                                       impl=cfg.affinity_impl,
                                       compare_dtype=lowp)
        return x * (1.0 + 1e-20 * jnp.sum(a))
    timeit(f"affinity ({m_nodes} nodes, bf16 cmp)", aff, nf)

    def lp_grad(x):
        def loss(xx):
            a = local_constrained_affinity(xx, cfg.k_connect, cfg.sigma,
                                           impl=cfg.affinity_impl,
                                           compare_dtype=lowp)
            z = label_propagate(a, y, cfg.lp_alpha, solver="cheby",
                                cg_iters=50, matvec_dtype=lowp)
            return jnp.sum(z * z)
        g = jax.grad(loss)(x)
        return x + 1e-20 * g
    timeit("affinity+LP cheby50 fwd+bwd", lp_grad, nf)

    # ---- encoder and full step ----
    xs = jnp.asarray(rng.normal(size=(clouds, n, cin)), jnp.float32)

    def enc(x):
        out = model.apply(variables, x, train=False,
                          method=lambda m, xx, train: m.features(xx, train=train))
        return x * (1.0 + 1e-20 * jnp.sum(out))
    timeit("encoder fwd (12 clouds)", enc, xs)

    def encg(x):
        def loss(xx):
            out = model.apply(variables, xx, train=False,
                              method=lambda m, a, train: m.features(a, train=train))
            return jnp.sum(out * out)
        g = jax.grad(loss)(x)
        return x + 1e-20 * g
    timeit("encoder fwd+bwd (12 clouds)", encg, xs)

    epj = jax.tree.map(lambda a: jnp.asarray(a), ep)

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
