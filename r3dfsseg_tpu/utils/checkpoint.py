"""Checkpoint save/load.

Reference artifact kinds (`/root/reference/utils/checkpoint_util.py`,
`mpti_train_noise.py:135-152`): best + periodic full checkpoints with
{iteration, model_state_dict, optimizer_state_dict, loss, IoU}, and
encoder-only pretrain checkpoints.  Here the same schema is serialised with
flax msgpack (fast, dependency-free); `load_torch_checkpoint` +
`torch_convert` cover interop with reference `.tar` files.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization

from r3dfsseg_tpu.learners.base import TrainState


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: TrainState, *, loss: float = 0.0,
                    iou: float = 0.0, iteration: Optional[int] = None):
    """Write {iteration, params, batch_stats, opt_state, loss, IoU}.

    `iteration` is in EPISODE terms like the reference's (one optimizer
    step consumes episode_batch episodes); callers with episode batching
    pass it explicitly — the default equals state.step, which is correct
    at episode_batch=1."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = {
        "iteration": int(iteration if iteration is not None else state.step),
        "params": _to_host(serialization.to_state_dict(state.params)),
        "batch_stats": _to_host(serialization.to_state_dict(state.batch_stats)),
        # optax states (e.g. multi_transform's PartitionState) need the
        # state-dict flattening before msgpack
        "opt_state": _to_host(serialization.to_state_dict(state.opt_state)),
        "loss": float(loss),
        "IoU": float(iou),
    }
    data = serialization.msgpack_serialize(blob)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, state: Optional[TrainState] = None,
                    *, episode_batch: int = 1
                    ) -> Tuple[dict, Optional[TrainState]]:
    """Read a checkpoint; if a template TrainState is given, restore into it
    (shapes/dtypes validated by flax).  `iteration` is stored in episode
    terms; TrainState.step counts optimizer steps, so the train-mode
    caller passes its episode_batch for the conversion."""
    with open(path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    if state is None:
        return blob, None
    import jax.numpy as jnp
    restored = TrainState(
        step=jnp.asarray(blob["iteration"] // max(episode_batch, 1),
                         jnp.int32),
        params=serialization.from_state_dict(state.params, blob["params"]),
        batch_stats=serialization.from_state_dict(
            state.batch_stats, blob["batch_stats"]),
        opt_state=serialization.from_state_dict(
            state.opt_state, blob["opt_state"]),
    )
    return blob, restored


def save_pretrain_checkpoint(path: str, params, batch_stats):
    """Encoder-only artifact (checkpoint_util.py:46-50)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = {"params": _to_host(params), "batch_stats": _to_host(batch_stats)}
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(blob))


def load_pretrain_checkpoint(path: str, cfg=None) -> Tuple[dict, dict]:
    """Returns (params, batch_stats) for the feature-extractor trunk.

    Accepts either our msgpack pretrain artifact or a reference torch .tar
    (detected by extension/magic), converted on the fly.  Pass the session
    config so a non-default architecture (edgeconv/mlp/base widths,
    attention) converts against the right layer layout instead of the
    converter defaults.
    """
    with open(path, "rb") as f:
        head = f.read(2)
    if path.endswith(".tar") or head == b"PK" or head[:1] == b"\x80":
        from r3dfsseg_tpu.utils.torch_convert import (
            convert_feature_extractor, load_torch_checkpoint)
        sd = load_torch_checkpoint(path)
        kw = {}
        if cfg is not None:
            kw = dict(edgeconv_widths=cfg.edgeconv_widths,
                      dgcnn_mlp_widths=cfg.dgcnn_mlp_widths,
                      base_widths=cfg.base_widths,
                      use_attention=cfg.use_attention)
        params, stats = convert_feature_extractor(sd, **kw)
        return {"features": params}, {"features": stats}
    with open(path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    return blob["params"], blob["batch_stats"]
