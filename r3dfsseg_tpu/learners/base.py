"""Optimizer + train-state shared by the MPTI and ProtoNet learners.

Reference semantics (`/root/reference/models/mpti_learner.py:27-36`,
`models/proto_learner.py:23-35`):
  * Adam, encoder param group at lr=1e-4, every other module at `args.lr`;
  * StepLR(step_size, gamma) stepped once **per iteration** —
    lr(t) = base * gamma^(t // step_size), implemented as a staircase
    exponential-decay schedule baked into optax (no host-side stepping).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from r3dfsseg_tpu.config import R3DConfig

Array = jax.Array


class TrainState(NamedTuple):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any


class MeshedLearner:
    """Episode-data-parallel mixin: replicate state over a 1-D 'data' mesh
    and shard incoming episode batches on their leading axis.  XLA/GSPMD
    propagates the shardings through the jitted step and inserts the
    gradient all-reduce over ICI (no hand-written collectives)."""

    mesh = None

    def attach_mesh(self, mesh) -> None:
        from r3dfsseg_tpu.parallel import replicate
        self.mesh = mesh
        if getattr(self, "state", None) is not None:
            self.state = replicate(self.state, mesh)

    def _maybe_shard(self, ep):
        """Shard a batched episode over the mesh; pass through when no mesh
        is attached or the batch doesn't divide the mesh (e.g. a ragged
        final eval batch)."""
        if self.mesh is None or not getattr(ep, "batched", False):
            return ep
        if ep.support_x.shape[0] % self.mesh.devices.size:
            return ep
        from r3dfsseg_tpu.parallel import shard_episode
        return shard_episode(ep, self.mesh)


def _param_labels(params) -> Any:
    """'encoder' for the pretrained DGCNN trunk, 'rest' for everything else
    (mpti_learner.py:27-32)."""
    flat = traverse_util.flatten_dict(params)
    labels = {
        k: ("encoder" if "encoder" in k[:3] else "rest") for k in flat
    }
    return traverse_util.unflatten_dict(labels)


def make_optimizer(cfg: R3DConfig) -> optax.GradientTransformation:
    # step_size counts *episodes* (the reference steps StepLR once per
    # episode, mpti_train_noise.py:72).  One optimizer step here consumes
    # episode_batch episodes, so the schedule is scaled to keep the decay
    # points aligned in episode terms.
    transition = max(cfg.step_size // max(cfg.episode_batch, 1), 1)

    def sched(base_lr):
        return optax.exponential_decay(
            init_value=base_lr, transition_steps=transition,
            decay_rate=cfg.gamma, staircase=True)

    return optax.multi_transform(
        {
            "encoder": optax.adam(sched(cfg.encoder_lr)),
            "rest": optax.adam(sched(cfg.lr)),
        },
        _param_labels,
    )


def create_train_state(model, cfg: R3DConfig, example_episode, rng) -> TrainState:
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        example_episode, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
