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


def stack_episodes(episodes) -> Episode:
    """Stack host-side episodes into one batched Episode (numpy)."""
    fields = {}
    for name in Episode._fields:
        vals = [getattr(e, name) for e in episodes]
        fields[name] = None if any(v is None for v in vals) else np.stack(vals, 0)
    return Episode(**fields)
