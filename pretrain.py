#!/usr/bin/env python
"""Encoder pretraining: full-scene semantic segmentation over the training
classes with the DGCNN+attention segmentation head.

The reference performs this in the external attMPTI repo
(`/root/reference/README.md:43-44`) and only ships the vestigial heads
(`models/dgcnn.py:185-255`); here pretraining is a first-class CLI so the
whole pipeline runs inside one framework.  The saved artifact is the
encoder-only checkpoint consumed by `--pretrain_checkpoint_path`
(`utils/checkpoint_util.py:46-50` schema, msgpack flavour).
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from r3dfsseg_tpu.cli import args_to_config, build_parser
from r3dfsseg_tpu.config import R3DConfig
from r3dfsseg_tpu.utils.logger import ScalarWriter, init_logger


def pretrain(cfg: R3DConfig, *, batch_size: int = 16, lr: float = 0.001,
             n_epochs: Optional[int] = None):
    import jax
    import jax.numpy as jnp
    import optax

    from r3dfsseg_tpu.data.catalogs import get_catalog
    from r3dfsseg_tpu.data.sampler import sample_scan
    from r3dfsseg_tpu.nn import DGCNNSegAttention
    from r3dfsseg_tpu.utils.checkpoint import save_pretrain_checkpoint

    phase = cfg.phase if cfg.phase in ("pretrain", "finetune") else "pretrain"
    logger = init_logger(cfg.log_dir, cfg, phase=phase)
    writer = ScalarWriter(cfg.log_dir)
    catalog = get_catalog(cfg.dataset, cfg.cvfold, cfg.clean_data_path)
    train_classes = list(catalog.train_classes)
    # label remap: train class -> contiguous id (+1), everything else bg 0
    n_classes = len(train_classes) + 1
    logger.cprint(f"pretrain classes: {train_classes} (+bg)")

    scans = sorted({s for c in train_classes for s in catalog.class2scans[c]})
    rng = np.random.default_rng(cfg.seed)

    model = DGCNNSegAttention(
        num_classes=n_classes,
        edgeconv_widths=tuple(tuple(w) for w in cfg.edgeconv_widths),
        dgcnn_mlp_widths=tuple(cfg.dgcnn_mlp_widths),
        dgcnn_k=cfg.dgcnn_k, atten_dim=cfg.dg_atten_dim)

    def make_batch():
        xs, ys = [], []
        for name in rng.choice(scans, batch_size):
            pt, lb, _, _ = sample_scan(
                cfg.clean_data_path, name, cfg.pc_npts, cfg.pc_attribs,
                sampled_classes=train_classes, random_sample=True,
                pc_augm=cfg.pc_augm,
                pc_augm_config={"scale": cfg.pc_augm_scale,
                                "rot": cfg.pc_augm_rot,
                                "mirror_prob": cfg.pc_augm_mirror_prob,
                                "jitter": cfg.pc_augm_jitter},
                rng=rng)
            xs.append(pt)
            ys.append(lb)
        return np.stack(xs), np.stack(ys).astype(np.int32)

    jrng = jax.random.PRNGKey(cfg.seed)
    x0, _ = make_batch()
    variables = model.init({"params": jrng, "dropout": jrng},
                           jnp.asarray(x0), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    if cfg.pretrain_checkpoint_path:   # finetune: resume the encoder trunk
        from r3dfsseg_tpu.utils.checkpoint import load_pretrain_checkpoint
        p0, s0 = load_pretrain_checkpoint(cfg.pretrain_checkpoint_path, cfg)
        params = dict(params)
        batch_stats = dict(batch_stats)
        params["encoder"] = jax.tree.map(
            lambda a, b: jnp.asarray(b).astype(a.dtype).reshape(a.shape),
            params["encoder"], p0["features"]["encoder"])
        batch_stats["encoder"] = jax.tree.map(
            lambda a, b: jnp.asarray(b).astype(a.dtype).reshape(a.shape),
            batch_stats["encoder"], s0["features"]["encoder"])
        logger.cprint("finetune: loaded encoder from %s"
                      % cfg.pretrain_checkpoint_path)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    # scene-batch DP over a device mesh (same recipe as the meta-train
    # CLIs): params replicated, the (B, N, C) batch sharded on its scene
    # axis, XLA inserts the gradient all-reduce AND the cross-device
    # BatchNorm statistics reduction — pretraining keeps its whole-batch
    # BN semantics (16 scenes per stat batch) at any mesh size.
    n_dev = cfg.mesh_shape[0] if cfg.mesh_shape else len(jax.devices())
    data_sharding = None
    if n_dev > 1 and batch_size % n_dev == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from r3dfsseg_tpu.parallel import make_mesh, replicate
        mesh = make_mesh(n_dev)
        params, batch_stats, opt_state = replicate(
            (params, batch_stats, opt_state), mesh)
        data_sharding = NamedSharding(mesh, P("data"))
        logger.cprint("pretrain DP: %d-scene batches sharded over %d devices"
                      % (batch_size, n_dev))
    elif n_dev > 1:
        logger.cprint("WARNING: pretrain DP disabled — batch_size %d does "
                      "not divide the %d visible devices"
                      % (batch_size, n_dev))

    @jax.jit
    def step(params, batch_stats, opt_state, x, y, drng):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": drng})
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.mean(jnp.take_along_axis(logp, y[..., None], -1))
            acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
            return ce, (mut["batch_stats"], acc)
        (loss, (bs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, bs, opt_state, loss, acc

    n_steps = cfg.n_iters
    t0 = time.perf_counter()

    # pipeline the host side like the meta-train loop: batch assembly on a
    # background thread, H2D transfers two batches ahead of the step
    from r3dfsseg_tpu.data.loader import device_put_prefetch, prefetch_iter

    def batches():
        for _ in range(n_steps):
            yield make_batch()

    pipelined = device_put_prefetch(
        prefetch_iter(batches(), prefetch=4), n=2,
        put=lambda t: (jax.device_put(t[0], data_sharding),
                       jax.device_put(t[1], data_sharding)))
    for it, (x, y) in enumerate(pipelined):
        jrng, drng = jax.random.split(jrng)
        params, batch_stats, opt_state, loss, acc = step(
            params, batch_stats, opt_state, x, y, drng)
        if (it + 1) % 10 == 0:
            logger.cprint("[Pretrain] Iter %d | loss %.4f | acc %.4f | %.1f clouds/s"
                          % (it + 1, float(loss), float(acc),
                             batch_size * (it + 1) / (time.perf_counter() - t0)))
            writer.add_scalar("Pretrain/loss", loss, it)
            writer.add_scalar("Pretrain/accuracy", acc, it)

    # encoder-only artifact for meta-training: the FeatureExtractor trunk
    # shares the 'encoder' module; att_learner/segmenter heads are dropped
    # the same way load_pretrain_checkpoint's filtered merge does.
    out = os.path.join(cfg.log_dir, "pretrain_checkpoint.msgpack")
    save_pretrain_checkpoint(
        out,
        {"features": {"encoder": params["encoder"]}},
        {"features": {"encoder": batch_stats["encoder"]}})
    logger.cprint(f"saved encoder checkpoint to {out}")
    return out


def main():
    parser = build_parser(eval_mode=False)
    parser.add_argument("--pretrain_batch_size", type=int, default=16)
    parser.add_argument("--pretrain_lr", type=float, default=0.001)
    args = parser.parse_args()
    cfg = args_to_config(args, eval_mode=False).replace(phase="pretrain")
    np.random.seed(cfg.seed)
    pretrain(cfg, batch_size=args.pretrain_batch_size, lr=args.pretrain_lr)


if __name__ == "__main__":
    main()
