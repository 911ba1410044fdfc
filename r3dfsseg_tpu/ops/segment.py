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
    """Sum ``data`` rows into ``num_segments`` buckets (static count).

    On TPU with a small bucket count (the prototype/cluster means: <=512
    of 192-d) the XLA scatter-add is descriptor-bound on the scalar core —
    traced at ~200 us per (N, P) scatter for outputs of a few hundred rows.
    A one-hot einsum runs the same reduction on the MXU in ~10 us; with an
    exactly-representable 0/1 factor and HIGHEST precision the f32
    products are exact (only the accumulation tree order differs from the
    scatter).  Out-of-range ids produce an all-zero one-hot row — dropped,
    same as segment_sum.
    """
    import os
    impl = os.environ.get("R3D_SEGSUM_IMPL", "auto")
    use_onehot = (impl == "onehot"
                  or (impl == "auto" and jax.default_backend() == "tpu"))
    if use_onehot and data.ndim == 2 and num_segments <= 512:
        oh = jax.nn.one_hot(segment_ids, num_segments, dtype=data.dtype)
        return jnp.einsum("np,nc->pc", oh, data,
                          precision=jax.lax.Precision.HIGHEST)
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
