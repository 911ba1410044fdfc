"""Episode container: the device-side view of one (or a batch of) few-shot
episode(s).

Array layout is channels-LAST, matching the TPU backbone.  Shapes below are
for a single episode; every field may carry an extra leading episode-batch
axis `E` (the models vmap their episode cores over it).

The reference moves 11 loose tensors through `batch_test_task_collate`
(`/root/reference/dataloaders/loader.py:1662-1684`); here they are one
typed pytree.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import numpy as np

Array = jax.Array


class Episode(NamedTuple):
    support_x: Array            # (n_way, k_shot, n_points, C_in) float
    support_y: Array            # (n_way, k_shot, n_points) int32 {0,1} fg mask
    query_x: Array              # (n_q*n_way, n_points, C_in) float
    query_y: Array              # (n_q*n_way, n_points) int32 in [0, n_way]
    gt_support_y: Optional[Array] = None   # clean fg masks (debug / MDNS metrics)
    gt_query_y: Optional[Array] = None     # clean query labels (train debug)
    support_flag: Optional[Array] = None   # (n_way, k_shot) absolute class per shot
    sampled_classes: Optional[Array] = None  # (n_way,) dataset class ids

    @property
    def batched(self) -> bool:
        return self.support_x.ndim == 5

    def with_batch_dim(self) -> "Episode":
        """Add a leading episode axis of size 1 if missing."""
        if self.batched:
            return self
        return jax.tree.map(lambda a: a[None] if a is not None else None, self)


def compress_episode_wire(ep: Episode, wire_format: str = "int8") -> Episode:
    """Shrink the host->device transfer (numpy, host side).

    The H2D copy is the CLI loop's dominant per-step cost on a
    bandwidth-limited link (~1.2 MB/step at f32/int32 for the flagship
    episode).  Label/mask/flag arrays hold values in [0, n_classes] so the
    int32->int8 narrowing is LOSSLESS — on by default.  'f16' additionally
    sends the point attributes as float16 (~2^-11 relative rounding of
    inputs that are O(1); opt-in).  `widen_episode` restores wide dtypes
    inside the jitted step, so models never see narrow arrays.
    """
    if wire_format in (None, "none", "f32"):
        return ep

    def narrow(x):
        if x is None:
            return None
        x = np.asarray(x)
        if np.issubdtype(x.dtype, np.integer):
            return x.astype(np.int8)     # labels/masks/flags/class ids
        if wire_format == "f16" and x.dtype == np.float32:
            return x.astype(np.float16)
        return x

    return Episode(*(narrow(v) for v in ep))


def widen_episode(ep: Episode) -> Episode:
    """Inverse of `compress_episode_wire`, traced inside the jitted step
    (the casts fuse with the first consumers; no extra launches)."""
    import jax.numpy as jnp

    def widen(x):
        if x is None:
            return None
        if jnp.issubdtype(x.dtype, jnp.integer) and x.dtype != jnp.int32:
            return x.astype(jnp.int32)
        if x.dtype == jnp.float16:
            return x.astype(jnp.float32)
        return x

    return Episode(*(widen(v) for v in ep))


def stack_episodes(episodes) -> Episode:
    """Stack host-side episodes into one batched Episode (numpy)."""
    fields = {}
    for name in Episode._fields:
        vals = [getattr(e, name) for e in episodes]
        fields[name] = None if any(v is None for v in vals) else np.stack(vals, 0)
    return Episode(**fields)
