#!/usr/bin/env python
"""Meta-test evaluation CLI — flag-compatible with the reference
`/root/reference/eval_noise.py`.

Builds the (cached) clean or noisy test episode set, runs the learner over
every episode and reports per-class IoU + foreground mean-IoU.
"""
from __future__ import annotations

import os
import time
from datetime import datetime

import numpy as np

from r3dfsseg_tpu.cli import args_to_config, build_parser
from r3dfsseg_tpu.config import R3DConfig
from r3dfsseg_tpu.utils.logger import init_logger
from r3dfsseg_tpu.utils.metrics import IoUAccumulator


def make_learner(cfg: R3DConfig, mode: str):
    """Phase dispatch (eval_noise.py:120-127 / train phases)."""
    from r3dfsseg_tpu.learners import MPTILearner, ProtoLearner
    if cfg.phase in ("mptinoise_eval", "mptieval", "mptitrain"):
        return MPTILearner(cfg)
    if cfg.phase in ("protoeval", "prototrain"):
        return ProtoLearner(cfg, with_contrast=True)
    if cfg.phase in ("transformereval", "transformertrain"):
        from r3dfsseg_tpu.learners.transformer_learner import TransformerLearner
        return TransformerLearner(cfg)
    raise NotImplementedError(f"phase {cfg.phase} not supported")


def test_few_shot(dataset, learner, logger, test_classes, *, eval_mdns=False,
                  log_every=50, save_record=None):
    """Evaluate every cached episode (eval_noise.py:75-113).

    Episodes stream through a single jitted eval step; the IoU confusion
    counts accumulate vectorised on host (replacing the reference's
    per-point Python loop, eval_noise.py:39-62).  Episode h5 reads are
    prefetched on a background thread so the host IO overlaps device
    compute.  With `save_record` set, per-episode predictions/labels/
    sampled classes are dumped to `<save_record>.npz` (the reference builds
    this path at eval_noise.py:148-153 and threads it to the model, which
    never writes it — here the record is actually produced).
    """
    from r3dfsseg_tpu.data.loader import device_put_prefetch, prefetch_iter
    from r3dfsseg_tpu.models.episode import stack_episodes

    acc = IoUAccumulator(list(test_classes))
    total_loss = 0.0
    n = len(dataset)
    ebatch = max(1, getattr(learner.cfg, "episode_batch", 1))
    t0 = time.perf_counter()
    done = 0
    mdns_stats: dict = {}
    record = {"pred": [], "label": [], "classes": []} if save_record else None

    import jax
    import jax.numpy as jnp

    def batches():
        # h5 reads + stacking on the prefetch thread; the H2D copy happens
        # on the MAIN thread (device_put_prefetch below) — a device_put
        # concurrent with a jit compile deadlocks the tunnelled backend
        from r3dfsseg_tpu.models.episode import compress_episode_wire
        wire = getattr(learner.cfg, "wire_format", "int8")
        for start in range(0, n, ebatch):
            eps = [dataset[i] for i in range(start, min(start + ebatch, n))]
            stacked = stack_episodes(eps) if len(eps) > 1 else eps[0]
            yield eps, compress_episode_wire(stacked, wire)

    import inspect
    supports_aux = "return_aux" in inspect.signature(
        learner.test).parameters

    def dispatch(batch):
        """One eval step; returns (pred_ref, packed_scalars_ref, aux_keys):
        scalars ride ONE device array so the host pays one fetch, not one
        round-trip per aux leaf."""
        if supports_aux:
            pred, loss, _, aux = learner.test(batch, eval_mdns=eval_mdns,
                                              return_aux=True)
            keys = sorted(aux or {})
            packed = jnp.stack([loss.astype(jnp.float32)]
                               + [aux[k].astype(jnp.float32) for k in keys])
        else:               # learners without the aux channel
            pred, loss, _ = learner.test(batch, eval_mdns=eval_mdns)
            keys = []
            packed = jnp.stack([loss.astype(jnp.float32)])
        return pred, packed, keys

    def consume(eps, pred, packed, keys):
        nonlocal total_loss, done
        pred = np.asarray(pred)
        scalars = jax.device_get(packed)
        loss = float(scalars[0])
        for k, v in zip(keys, scalars[1:]):
            mdns_stats.setdefault(k, []).append(float(v))
        total_loss += loss * len(eps)
        for j, ep in enumerate(eps):  # pred is (E, Q, N); E==1 for single eps
            acc.update(pred[j], np.asarray(ep.query_y),
                       np.asarray(ep.sampled_classes))
            if record is not None:
                record["pred"].append(pred[j])
                record["label"].append(np.asarray(ep.query_y))
                record["classes"].append(np.asarray(ep.sampled_classes))
        done += len(eps)
        if done % max(log_every, 1) < len(eps):
            logger.cprint("[Eval] Iter: %d | Loss: %.4f | %s" % (
                done, loss, str(datetime.now())))

    # super-batch transfers, as in the train loop: group T equal-shaped
    # batches per device_put (one link round-trip for all T), slice per
    # step on device.  The tail batch may be ragged — it ships alone.
    from r3dfsseg_tpu.data.loader import (group_equal_shape, make_take_i,
                                          stack_superbatch)
    t_batch = max(1, getattr(learner.cfg, "transfer_batch", 1))
    take_i = make_take_i()

    def superbatches(gen):
        for g in group_equal_shape(gen, t_batch, get_batch=lambda t: t[1]):
            yield ([e for e, _ in g],
                   stack_superbatch([b for _, b in g]), len(g))

    src = device_put_prefetch(
        prefetch_iter(superbatches(batches()), prefetch=4), n=2,
        put=lambda t: (t[0], jax.device_put(t[1]), t[2]))
    pending = None
    for eps_group, sup, t_actual in src:
        for i in range(t_actual):
            eps = eps_group[i] if t_actual > 1 else eps_group[0]
            batch = take_i(sup, i) if t_actual > 1 else sup
            refs = dispatch(batch)  # async; previous step fetches below
            if pending is not None:
                consume(*pending)
            pending = (eps, *refs)
    if pending is not None:
        consume(*pending)
    mean_loss = total_loss / max(n, 1)
    for k, vals in sorted(mdns_stats.items()):
        if k.startswith("mdns"):
            logger.cprint("%s: %.4f" % (k, float(np.mean(vals))))
    iou = acc.iou()
    for c, v in enumerate(iou):
        logger.cprint("----- [class %d]  IoU: %f -----" % (c, v))
    mean_iou = acc.mean_iou()
    if record is not None:
        np.savez(save_record,
                 pred=np.stack(record["pred"]),
                 label=np.stack(record["label"]),
                 classes=np.stack(record["classes"]))
        logger.cprint("saved test record to %s.npz" % save_record)
    dt = time.perf_counter() - t0
    logger.cprint("eval throughput: %.2f episodes/s" % (n / max(dt, 1e-9)))
    return mean_loss, mean_iou


def evaluate(cfg: R3DConfig):
    from r3dfsseg_tpu.data import StaticTestDataset
    from r3dfsseg_tpu.utils.checkpoint import load_checkpoint

    logger = init_logger(cfg.log_dir, cfg)
    logger.cprint(
        "\n------------------- noise ratio= {}, noise type={} "
        "--------------------\n".format(cfg.noise_ratio, cfg.noise_type))

    # episode_batch == 0 (CLI default) = auto: one episode per device
    from r3dfsseg_tpu.parallel import resolve_episode_batch
    cfg = resolve_episode_batch(cfg, log=logger.cprint)

    dataset = StaticTestDataset(
        cfg.clean_data_path or cfg.data_path, cfg.dataset, cvfold=cfg.cvfold,
        num_episode_per_comb=cfg.n_episode_test, n_way=cfg.n_way,
        k_shot=cfg.k_shot, n_queries=cfg.n_queries, num_point=cfg.pc_npts,
        pc_attribs=cfg.pc_attribs, mode="test",
        noise_ratio=cfg.noise_ratio, noise_type=cfg.noise_type,
        noise_pair=cfg.noise_pair_dict, seed=cfg.seed)

    learner = make_learner(cfg, "test")
    learner.init(dataset[0])
    ckpt = os.path.join(cfg.model_checkpoint_path, "checkpoint.msgpack")
    if os.path.exists(ckpt):
        blob, state = load_checkpoint(ckpt, learner.state)
        learner.state = state
        logger.cprint("Load model checkpoint at Iteration %d (IoU %f)..."
                      % (blob["iteration"], blob["IoU"]))
    else:
        # reference torch checkpoint interop
        tar = os.path.join(cfg.model_checkpoint_path, "checkpoint.tar")
        if os.path.exists(tar):
            from r3dfsseg_tpu.utils.torch_convert import (
                convert_for_phase, load_torch_checkpoint)
            sd = load_torch_checkpoint(tar)
            params, stats = convert_for_phase(sd, cfg)
            learner.load_params(params, stats)
            logger.cprint("Loaded converted reference checkpoint %s" % tar)
        else:
            raise ValueError(
                "Model checkpoint file must be correctly given (%s)."
                % cfg.model_checkpoint_path)

    import jax
    n_dev = cfg.mesh_shape[0] if cfg.mesh_shape else len(jax.devices())
    if n_dev > 1:
        if cfg.episode_batch % n_dev == 0:
            from r3dfsseg_tpu.parallel import make_mesh
            learner.attach_mesh(make_mesh(n_dev))
            logger.cprint("episode-DP eval over %d devices" % n_dev)
        else:
            logger.cprint(
                "WARNING: episode-DP disabled — episode_batch %d does not "
                "divide the %d visible devices" % (cfg.episode_batch, n_dev))

    record_path = None
    if cfg.save_test_record:
        # reference path layout: '{noise_type}_{ratio:.3f}_test_record'
        # under model_checkpoint_path (eval_noise.py:148-151)
        record_path = os.path.join(
            cfg.model_checkpoint_path or cfg.log_dir,
            "%s_%.3f_test_record" % (cfg.noise_type, cfg.noise_ratio))
    test_loss, mean_iou = test_few_shot(
        dataset, learner, logger, list(dataset.classes), eval_mdns=True,
        save_record=record_path)
    logger.cprint("\n=====[TEST] Loss: %.4f | Mean IoU: %f =====\n"
                  % (test_loss, mean_iou))
    return mean_iou


def main():
    args = build_parser(eval_mode=True).parse_args()
    cfg = args_to_config(args, eval_mode=True)
    np.random.seed(cfg.seed)
    evaluate(cfg)


if __name__ == "__main__":
    main()
