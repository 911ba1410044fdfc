"""Fixed-size segment reductions and masked means.

TPU-native replacement for `torch_scatter.scatter_mean/add/max`
(`/root/reference/models/mpti.py:15,395`, `models/protonet.py:11,81-89`).
`jax.ops.segment_sum` lowers to an XLA scatter-add with a static segment
count, which is what a fixed-shape episode pipeline needs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def segment_sum(data: Array, segment_ids: Array, num_segments: int) -> Array:
    """Sum ``data`` rows into ``num_segments`` buckets (static count)."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(
    data: Array, segment_ids: Array, num_segments: int, *, weights: Array | None = None
) -> Array:
    """Per-segment mean; empty segments return 0 (torch_scatter returns 0 too)."""
    if weights is not None:
        data = data * weights[..., None]
        ones = weights
    else:
        ones = jnp.ones(data.shape[:1], data.dtype)
    sums = segment_sum(data, segment_ids, num_segments)
    cnts = segment_sum(ones, segment_ids, num_segments)
    return sums / jnp.maximum(cnts, 1e-12)[..., None]


def masked_mean(x: Array, mask: Array, axis, *, eps: float = 1e-5) -> Array:
    """Mean of ``x`` over ``axis`` counting only ``mask`` entries.

    The 1e-5 denominator guard matches the reference's masked average
    pooling (`/root/reference/models/protonet.py:306`).
    """
    mask = mask.astype(x.dtype)
    num = jnp.sum(x * mask, axis=axis)
    den = jnp.sum(mask, axis=axis) + eps
    return num / den
