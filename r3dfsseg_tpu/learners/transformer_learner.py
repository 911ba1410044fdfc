"""Learner for the TraNFS-style transformer baseline
(`ProtoNet_transformer_learner` path, `/root/reference/eval_noise.py:126-127`;
losses wired as in `models/protonet.py:1255-1260`)."""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from r3dfsseg_tpu.config import R3DConfig
from r3dfsseg_tpu.learners.base import (MeshedLearner, TrainState,
                                         create_train_state, make_optimizer)
from r3dfsseg_tpu.models.episode import Episode, widen_episode
from r3dfsseg_tpu.models.transformer import ProtoNetTransformer


class TransformerLearner(MeshedLearner):
    def __init__(self, cfg: R3DConfig, rng: Optional[jax.Array] = None,
                 d_model: Optional[int] = None, n_layers: Optional[int] = None,
                 n_head: Optional[int] = None, d_feed: Optional[int] = None):
        self.cfg = cfg
        # architecture comes from the config (--d_model/--n_head/--n_layers/
        # --d_feed); explicit kwargs override for tests
        self.model = ProtoNetTransformer(
            cfg, d_model=d_model or cfg.d_model,
            n_layers=n_layers or cfg.n_layers,
            n_head=n_head or cfg.n_head,
            d_feed=d_feed or cfg.d_feed)
        self.tx = make_optimizer(cfg)
        self._rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        self.state: Optional[TrainState] = None
        # donate the TrainState: params/opt-state buffers alias
        # in place instead of staging copies (the caller always
        # replaces self.state with the returned one)
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=0)
        self._eval_step = jax.jit(self._eval_step_impl,
                                  static_argnames=("eval_mdns",))

    def init(self, example_episode: Episode) -> TrainState:
        self.state = create_train_state(
            self.model, self.cfg, example_episode, self._rng)
        return self.state

    def load_params(self, params, batch_stats=None, *, encoder_only=False):
        from r3dfsseg_tpu.learners.mpti_learner import MPTILearner
        MPTILearner.load_params(self, params, batch_stats,
                                encoder_only=encoder_only)

    def _train_step_impl(self, state: TrainState, ep: Episode, rng):
        ep = widen_episode(ep)

        def loss_fn(params):
            out, mut = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                ep, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            # total = CE + 0.5*BCE + 1.0*MSE (protonet.py:1156-1157,1260)
            loss = out.loss + out.binary_loss + out.clean_proto_loss
            return loss, (out, mut["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(state.step + 1, params, new_stats, opt_state)
        metrics = dict(out.aux)
        metrics.update(loss=loss, lp_loss=out.loss,
                       contrast_loss=out.binary_loss,
                       clean_proto_loss=out.clean_proto_loss)
        return new_state, metrics

    def _eval_step_impl(self, state: TrainState, ep: Episode, *,
                        eval_mdns: bool):
        ep = widen_episode(ep)
        out = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            ep, train=False)
        pred = jnp.argmax(out.query_logits, axis=-1)
        acc = jnp.mean((pred == ep.with_batch_dim().query_y).astype(jnp.float32))
        return pred, out.loss, acc

    def train(self, ep: Episode) -> Dict[str, jax.Array]:
        self._rng, rng = jax.random.split(self._rng)
        self.state, metrics = self._train_step(self.state,
                                               self._maybe_shard(ep), rng)
        return metrics

    def test(self, ep: Episode, *, eval_mdns: bool = False):
        return self._eval_step(self.state, self._maybe_shard(ep),
                               eval_mdns=eval_mdns)
