"""MPTI learner: jitted episode train/eval steps with Adam + StepLR.

Re-design of `MPTILearner_V3` (`/root/reference/models/mpti_learner.py:16-102`):
the zero_grad/backward/step/scheduler.step sequence becomes one compiled
`train_step`; loss = lp_loss + contrast_weight * contrast
(mpti_learner.py:66).  Supports episode batches (the reference is locked to
batch_size=1) and optional data-parallel sharding over a device mesh.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from r3dfsseg_tpu.config import R3DConfig
from r3dfsseg_tpu.learners.base import (MeshedLearner, TrainState,
                                         create_train_state, make_optimizer)
from r3dfsseg_tpu.models.episode import Episode, widen_episode
from r3dfsseg_tpu.models.mpti import MPTINet

Array = jax.Array


class MPTILearner(MeshedLearner):
    def __init__(self, cfg: R3DConfig, rng: Optional[jax.Array] = None):
        self.cfg = cfg
        self.model = MPTINet(cfg)
        self.tx = make_optimizer(cfg)
        if rng is None:
            rng = jax.random.PRNGKey(cfg.seed)
        self._rng = rng
        self.state: Optional[TrainState] = None

        # donate the TrainState: params/opt-state buffers alias
        # in place instead of staging copies (the caller always
        # replaces self.state with the returned one)
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=0)
        self._eval_step = jax.jit(
            functools.partial(self._eval_step_impl), static_argnames=("eval_mdns",))

    # ------------------------------------------------------------------
    def init(self, example_episode: Episode) -> TrainState:
        self.state = create_train_state(
            self.model, self.cfg, example_episode, self._rng)
        return self.state

    def load_params(self, params, batch_stats=None, *, encoder_only=False):
        """Install converted weights.  With encoder_only=True only the
        pretrained feature-extractor trunk is replaced, mirroring
        `load_pretrain_checkpoint`'s filtered merge
        (`/root/reference/utils/checkpoint_util.py:9-23`)."""
        assert self.state is not None, "call init() first"
        import flax

        cur_p = flax.core.unfreeze(self.state.params)
        cur_s = flax.core.unfreeze(self.state.batch_stats)

        def merge(dst, src):
            for k, v in src.items():
                if k in dst and isinstance(dst[k], dict) and isinstance(v, dict):
                    merge(dst[k], v)
                elif k in dst:
                    dst[k] = jnp.asarray(v).astype(dst[k].dtype).reshape(dst[k].shape)
        if encoder_only:
            merge(cur_p.get("features", {}), params.get("features", params))
            if batch_stats:
                merge(cur_s.get("features", {}), batch_stats.get("features", batch_stats))
        else:
            merge(cur_p, params)
            if batch_stats:
                merge(cur_s, batch_stats)
        self.state = self.state._replace(
            params=cur_p, batch_stats=cur_s,
            opt_state=self.tx.init(cur_p))

    # ------------------------------------------------------------------
    def _train_step_impl(self, state: TrainState, ep: Episode, rng):
        ep = widen_episode(ep)   # narrow-wire H2D format -> model dtypes
        c = self.cfg

        def loss_fn(params):
            out, mut = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                ep, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            loss = out.lp_loss + c.contrast_weight * out.contrast_loss
            return loss, (out, mut["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(state.step + 1, params, new_stats, opt_state)
        metrics = dict(out.aux)
        metrics.update(loss=loss, lp_loss=out.lp_loss,
                       contrast_loss=out.contrast_loss)
        return new_state, metrics

    def _eval_step_impl(self, state: TrainState, ep: Episode, *, eval_mdns: bool):
        ep = widen_episode(ep)
        out = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            ep, train=False, eval_mdns=eval_mdns)
        pred = jnp.argmax(out.query_logits, axis=-1)   # (E, Q, N)
        acc = jnp.mean((pred == ep.with_batch_dim().query_y).astype(jnp.float32))
        return pred, out.lp_loss, acc, out.aux

    # ------------------------------------------------------------------
    def train(self, ep: Episode) -> Dict[str, Array]:
        """One optimizer step on an episode (batch). Returns metrics."""
        self._rng, rng = jax.random.split(self._rng)
        self.state, metrics = self._train_step(self.state,
                                               self._maybe_shard(ep), rng)
        return metrics

    def test(self, ep: Episode, *, eval_mdns: bool = False,
             return_aux: bool = False):
        """Predictions + loss + accuracy under running BN stats
        (mpti_learner.py:84-102).  With return_aux=True also returns the
        MDNS diagnostics dict (shot/point clean ratios, precision/recall)."""
        pred, loss, acc, aux = self._eval_step(self.state,
                                               self._maybe_shard(ep),
                                               eval_mdns=eval_mdns)
        if return_aux:
            return pred, loss, acc, aux
        return pred, loss, acc
