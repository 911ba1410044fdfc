#!/usr/bin/env python
"""Noise-robust meta-training CLI — flag-compatible with the reference
`/root/reference/mpti_train_noise.py`.

Per-episode noisy meta-training with WayContrast, periodic clean-set
validation and best/periodic checkpointing.  TPU-native extras: episode
batching (--episode_batch), prefetched host episode generation, one jitted
train step per batch.
"""
from __future__ import annotations

import os

import numpy as np

from eval_noise import make_learner, test_few_shot
from r3dfsseg_tpu.cli import args_to_config, build_parser
from r3dfsseg_tpu.config import R3DConfig
from r3dfsseg_tpu.utils.checkpoint import save_checkpoint
from r3dfsseg_tpu.utils.logger import ScalarWriter, init_logger


def train(cfg: R3DConfig):
    from r3dfsseg_tpu.data import EpisodeLoader, NoisyEpisodeSampler, StaticTestDataset
    from r3dfsseg_tpu.utils.checkpoint import load_checkpoint, load_pretrain_checkpoint

    logger = init_logger(cfg.log_dir, cfg)
    writer = ScalarWriter(cfg.log_dir)

    # episode_batch == 0 (the CLI default) = auto: one episode per visible
    # device, so episode-DP engages with default flags on multi-chip hosts
    from r3dfsseg_tpu.parallel import resolve_episode_batch
    cfg = resolve_episode_batch(cfg, log=logger.cprint)

    pc_augm_config = {"scale": cfg.pc_augm_scale, "rot": cfg.pc_augm_rot,
                      "mirror_prob": cfg.pc_augm_mirror_prob,
                      "jitter": cfg.pc_augm_jitter}

    train_sampler = NoisyEpisodeSampler(
        cfg.clean_data_path, cfg.dataset, cvfold=cfg.cvfold,
        n_way=cfg.n_way, k_shot=cfg.k_shot, n_queries=cfg.n_queries,
        mode="train", num_point=cfg.pc_npts, pc_attribs=cfg.pc_attribs,
        pc_augm=cfg.pc_augm, pc_augm_config=pc_augm_config,
        noise_ratio=list(cfg.train_noise_ratio), noise_type="train",
        seed=cfg.seed)

    valid_set = StaticTestDataset(
        cfg.clean_data_path, cfg.dataset, cvfold=cfg.cvfold,
        num_episode_per_comb=cfg.n_episode_test, n_way=cfg.n_way,
        k_shot=cfg.k_shot, n_queries=cfg.n_queries, num_point=cfg.pc_npts,
        pc_attribs=cfg.pc_attribs, mode="valid", seed=cfg.seed)

    logger.cprint("--------- cvfold=%d, train class: %s, test class: %s ------"
                  % (cfg.cvfold, train_sampler.classes, valid_set.classes))

    learner = make_learner(cfg, "train")
    learner.init(train_sampler.sample())

    if cfg.model_checkpoint_path:      # resume (mpti_train_noise.py:172-173)
        msgpack = os.path.join(cfg.model_checkpoint_path, "checkpoint.msgpack")
        tar = os.path.join(cfg.model_checkpoint_path, "checkpoint.tar")
        if os.path.exists(msgpack):
            blob, state = load_checkpoint(msgpack, learner.state,
                                          episode_batch=cfg.episode_batch)
            learner.state = state
        elif os.path.exists(tar):
            # reference torch checkpoint: params + BN stats + Adam moments
            # (checkpoint_util.py:26-44 train-mode restore)
            from r3dfsseg_tpu.utils.torch_convert import (
                resume_from_reference_checkpoint)
            blob = resume_from_reference_checkpoint(tar, learner)
            logger.cprint("Converted reference checkpoint %s "
                          "(optimizer state restored)" % tar)
        else:
            raise ValueError("no checkpoint.msgpack or checkpoint.tar in %s"
                             % cfg.model_checkpoint_path)
        logger.cprint("Resume from checkpoint at Iteration %d (IoU %f)..."
                      % (blob["iteration"], blob["IoU"]))
    elif cfg.pretrain_checkpoint_path:
        params, stats = load_pretrain_checkpoint(
            cfg.pretrain_checkpoint_path, cfg)
        learner.load_params(params, stats, encoder_only=True)
        logger.cprint("Load encoder module from pretrained checkpoint...")

    # episode-DP: shard the per-step episode batch over a device mesh when
    # --mesh is given or more than one device is visible (SURVEY §2c: this
    # is the rebuild's new capability — the reference is single-GPU batch-1)
    import jax
    n_dev = cfg.mesh_shape[0] if cfg.mesh_shape else len(jax.devices())
    if n_dev > 1:
        if cfg.episode_batch % n_dev == 0:
            from r3dfsseg_tpu.parallel import make_mesh
            learner.attach_mesh(make_mesh(n_dev))
            logger.cprint(
                "episode-DP: %d-episode batches sharded over %d devices"
                % (cfg.episode_batch, n_dev))
        else:
            # warn ALWAYS (not only under --mesh): the user is silently
            # training single-chip on a multi-chip host otherwise
            logger.cprint(
                "WARNING: episode-DP disabled — episode_batch %d does not "
                "divide the %d visible devices (pass --episode_batch 0 for "
                "auto, or a multiple of %d)"
                % (cfg.episode_batch, n_dev, n_dev))

    # at least one optimizer step even when n_iters < episode_batch (tiny
    # smoke runs on wide meshes)
    n_steps = max(cfg.n_iters // max(cfg.episode_batch, 1), 1)
    # one independent sampler per worker thread (numpy rng is not
    # thread-safe); seeds derived from the base seed
    n_workers = max(1, min(cfg.n_workers, 8))
    workers = [train_sampler] + [
        NoisyEpisodeSampler(
            cfg.clean_data_path, cfg.dataset, cvfold=cfg.cvfold,
            n_way=cfg.n_way, k_shot=cfg.k_shot, n_queries=cfg.n_queries,
            mode="train", num_point=cfg.pc_npts, pc_attribs=cfg.pc_attribs,
            pc_augm=cfg.pc_augm, pc_augm_config=pc_augm_config,
            noise_ratio=list(cfg.train_noise_ratio), noise_type="train",
            seed=cfg.seed + 1000 + w)
        for w in range(n_workers - 1)]
    loader = EpisodeLoader(
        workers[0].sample, num_batches=n_steps,
        episode_batch=cfg.episode_batch, prefetch=4,
        worker_fns=[s.sample for s in workers])

    best_iou = 0.0
    eval_every = max(cfg.eval_interval // max(cfg.episode_batch, 1), 1)
    if cfg.profile_dir:
        # optional device trace of the first few steps (SURVEY section 5:
        # the reference has no profiling at all)
        import jax
        try:
            jax.profiler.start_trace(cfg.profile_dir)
        except Exception as e:
            logger.cprint(f"profiler unavailable: {e}")
    import time as _time

    from r3dfsseg_tpu.data.loader import device_put_prefetch

    t_start = _time.perf_counter()

    import jax.numpy as jnp

    eval_elapsed = [0.0]   # subtracted from the throughput denominator

    def fetch_steps(pending):
        """ONE host transfer for a whole window of steps' metrics:
        device_get costs a tunnel round-trip, so per-step (let alone
        per-scalar) fetching dominates the loop; the window amortises it."""
        if not pending:
            return []
        keys = sorted(pending[0][1])
        stacked = jnp.stack([
            jnp.stack([m[k].astype(jnp.float32) for k in keys])
            for _, m in pending])
        vals = jax.device_get(stacked)                  # (W, n_keys)
        return [(step, dict(zip(keys, row)))
                for (step, _), row in zip(pending, vals)]

    def log_step(step, metrics):
        """Host-side logging for one completed (already fetched) step."""
        nonlocal t_start
        it = (step + 1) * cfg.episode_batch
        # learners expose different loss decompositions (ProtoLearner has no
        # lp_loss; TransformerLearner adds clean_proto_loss) — log what each
        # provides, defaulting missing parts sensibly
        lp = metrics.get("lp_loss", metrics["loss"])
        contrast = metrics.get("contrast_loss", 0.0)
        logger.cprint(
            "==[Train] Iter: %d | Loss: %.4f |  lp_loss: %.4f | "
            "contrast_loss: %.4f | Accuracy: %f  ==" % (
                it, float(metrics["loss"]), float(lp),
                float(contrast), float(metrics["accuracy"])))
        writer.add_scalar("Train/loss", metrics["loss"], it)
        writer.add_scalar("Train/lp_loss", lp, it)
        writer.add_scalar("Train/edge_loss", contrast, it)
        writer.add_scalar("Train/accuracy", metrics["accuracy"], it)
        for k in ("clean_ratio_LP", "clean_ratio_original",
                  "query_acc_LP", "query_acc_original"):
            if k in metrics:
                writer.add_scalar(f"Train/{k}", metrics[k], it)
        if step == 0:
            t_start = _time.perf_counter()   # exclude jit compile of step 1
        if (step + 1) % 100 == 0:
            dt = _time.perf_counter() - t_start - eval_elapsed[0]
            eps_s = (it - cfg.episode_batch) / max(dt, 1e-9)
            writer.add_scalar("Train/episodes_per_sec", eps_s, it)
            logger.cprint("== throughput: %.2f episodes/s ==" % eps_s)

    # The loop runs ahead of the host: batches transfer via the prefetch
    # generator, steps dispatch asynchronously, and metrics are fetched in
    # windows of LOG_WINDOW steps (log lines appear in small bursts with
    # the correct per-iteration values).
    LOG_WINDOW = 8
    pending = []

    def flush():
        for s, m in fetch_steps(pending):
            log_step(s, m)
        pending.clear()

    from r3dfsseg_tpu.models.episode import compress_episode_wire

    # narrow-wire H2D: label arrays int8 (lossless), optionally f16 points
    # (--wire_format) — the jitted step widens on device.  Cuts the
    # per-step transfer ~2.4x on a bandwidth-limited link.
    wired = (compress_episode_wire(b, cfg.wire_format) for b in loader)

    # super-batch transfer (--transfer_batch): ship T steps' batches in ONE
    # device_put and cut per-step slices on device.  device_put blocks the
    # host for a full link round-trip (52 ms measured on this container's
    # tunnel, scripts/bench_cli_sustained.py) while step dispatch is
    # fire-and-forget — grouping transfers amortises the RTT T-fold and is
    # a no-op for step semantics.
    from r3dfsseg_tpu.data.loader import (group_equal_shape, make_take_i,
                                          stack_superbatch)
    t_batch = max(1, cfg.transfer_batch)
    take_i = make_take_i()

    def step_batches():
        if t_batch == 1:
            yield from device_put_prefetch(wired, n=2)
            return
        groups = (
            (len(g), stack_superbatch(g))
            for g in group_equal_shape(wired, t_batch))
        for n_in, sup in device_put_prefetch(
                groups, n=2, put=lambda t: (t[0], jax.device_put(t[1]))):
            if n_in == 1:
                yield sup
            else:
                for i in range(n_in):
                    yield take_i(sup, i)

    for step, batch in enumerate(step_batches()):
        if cfg.profile_dir and step == 3:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
        metrics = learner.train(batch)         # async dispatch
        pending.append((step, metrics))
        if len(pending) >= LOG_WINDOW:
            flush()

        if (step + 1) % eval_every == 0:
            flush()                            # drain before validating
            t_eval = _time.perf_counter()
            it = (step + 1) * cfg.episode_batch
            valid_loss, mean_iou = test_few_shot(
                valid_set, learner, logger, list(valid_set.classes))
            logger.cprint("\n=====[VALID] Loss: %.4f | Mean IoU: %f  =====\n"
                          % (valid_loss, mean_iou))
            writer.add_scalar("Valid/loss", valid_loss, it)
            writer.add_scalar("Valid/meanIoU", mean_iou, it)
            if mean_iou > best_iou:
                best_iou = mean_iou
                logger.cprint("*******************Model Saved*******************")
                save_checkpoint(os.path.join(cfg.log_dir, "checkpoint.msgpack"),
                                learner.state, loss=valid_loss, iou=best_iou,
                                iteration=it)
            save_checkpoint(
                os.path.join(cfg.log_dir, f"checkpoint_{it}.msgpack"),
                learner.state, loss=valid_loss, iou=best_iou, iteration=it)
            eval_elapsed[0] += _time.perf_counter() - t_eval
    flush()
    writer.close()


def main():
    args = build_parser(eval_mode=False).parse_args()
    cfg = args_to_config(args, eval_mode=False)
    np.random.seed(cfg.seed)
    if cfg.phase in ("pretrain", "finetune"):
        # encoder (re-)pretraining; finetune resumes from
        # --pretrain_checkpoint_path (the reference defers both to the
        # external attMPTI repo, README.md:43-44)
        from pretrain import pretrain
        pretrain(cfg)
    else:
        train(cfg)


if __name__ == "__main__":
    main()
