"""Masked farthest point sampling and multi-prototype extraction.

TPU-native replacement for `torch_cluster.fps` + the per-cluster Python
loop in the reference's `getMutiplePrototypes`
(`/root/reference/models/mpti.py:597-634`).  The reference gathers a ragged
set of foreground points and runs a CUDA FPS with `random_start=False`
(deterministic start at the first point).  Here the point set stays at a
fixed size with a validity mask, FPS is a fixed-trip `lax.fori_loop` of
argmax-over-min-distance (fully vectorised, VPU-friendly), and cluster
means are one `segment_sum` — so the whole thing jits and vmaps.

Semantics matched to the reference:
  * start seed = first valid point (random_start=False);
  * if n_valid <= k, every valid point becomes its own prototype
    (the reference's ratio>=1 branch, mpti.py:631-634) — padded slots are
    flagged invalid;
  * assignments are hard nearest-seed (mpti.py:622), prototypes are
    per-cluster means (mpti.py:625-629).
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from r3dfsseg_tpu.ops.segment import segment_sum

Array = jax.Array

_NEG = -1.0  # masked sentinel: strictly below any sq-distance (>= 0)


def masked_fps(feat: Array, valid: Array, k: int,
               select_dtype=None, impl: str = "auto") -> tuple[Array, Array]:
    """Deterministic farthest point sampling over the valid subset.

    Args:
      feat: (N, C) float points (any feature space — the reference runs FPS
        in the 192-d embedding space).
      valid: (N,) bool mask.
      k: number of seeds to draw (static).
      select_dtype: optional low-precision dtype (bf16) for the distance
        updates.  Measured NEUTRAL on v5e at the MPTI shape (the (N, C)
        matrix stays VMEM-resident across iterations, so the loop is
        VPU-throughput-bound, not HBM-bound, and bf16 does not change VPU
        ops/lane) — kept as an experiment knob, not used by the models.
    Returns:
      seed_idx: (k,) int32 indices into ``feat``.  Slots >= min(k, n_valid)
        repeat already-chosen points and must be ignored via ``seed_valid``.
      seed_valid: (k,) bool — slot i is a real seed iff i < min(k, n_valid).
    """
    n = feat.shape[0]
    feat = feat.astype(select_dtype or jnp.float32)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    seed_valid = jnp.arange(k) < jnp.minimum(k, n_valid)

    # impl='auto' runs every selection round inside one Pallas kernel with
    # the (N, C) matrix VMEM-resident on TPU (ops/pallas_fps.py): same
    # masking/tie semantics, but Gram-trick distances, so near-exact ties
    # may pick different (equally-farthest) seeds.  impl='xla' keeps this
    # fori_loop (the reference-faithful direct sum((x-c)^2) ordering) and
    # is what the bench parity mode uses.  R3D_FPS_IMPL overrides for A/Bs.
    impl = os.environ.get("R3D_FPS_IMPL", impl)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from r3dfsseg_tpu.ops.pallas_fps import masked_fps_pallas
        return masked_fps_pallas(feat, valid, k), seed_valid

    # min squared distance to the chosen seed set; +inf for unchosen valid
    # points so the very first argmax picks the *first* valid point
    # (ties in argmax resolve to the lowest index).  All loop-carried
    # arrays stay in feat.dtype so the bf16 selection mode really halves
    # the per-iteration traffic.
    big = jnp.asarray(3.4e38, feat.dtype)
    neg = jnp.asarray(_NEG, feat.dtype)
    init_dist = jnp.where(valid, big, neg)

    def body(i, carry):
        min_dist, seeds = carry
        pick = jnp.argmax(min_dist).astype(jnp.int32)
        seeds = seeds.at[i].set(pick)
        d = jnp.sum((feat - feat[pick]) ** 2, axis=-1)
        d = jnp.where(valid, d, neg)
        min_dist = jnp.minimum(min_dist, d)
        return min_dist, seeds

    _, seed_idx = jax.lax.fori_loop(
        0, k, body, (init_dist, jnp.zeros((k,), jnp.int32))
    )
    return seed_idx, seed_valid


class MultiPrototypes(NamedTuple):
    prototypes: Array   # (k, C) cluster means (0 in invalid slots)
    proto_valid: Array  # (k,) bool
    assignments: Array  # (N,) int32 nearest-seed slot per point (garbage where ~valid)


def multi_prototypes(feat: Array, valid: Array, k: int,
                     select_dtype=None, impl: str = "auto") -> MultiPrototypes:
    """FPS seeds + hard assignment + per-cluster means, fixed shapes.

    Mirrors `getMutiplePrototypes` (mpti.py:597-634) under masking: the
    output always has ``k`` prototype slots; ``proto_valid`` marks the
    min(k, n_valid) real ones.  ``select_dtype`` relaxes the seed/assignment
    *selection* distances to bf16 (see masked_fps); means stay f32.
    """
    n, c = feat.shape
    feat32 = feat.astype(jnp.float32)
    seed_idx, seed_valid = masked_fps(feat32, valid, k, select_dtype, impl)
    seeds = feat32[seed_idx]                                  # (k, C)

    # point -> nearest valid seed (mpti.py:618-622); Gram-trick matmul keeps
    # this on the MXU instead of materialising an (N, k, C) broadcast.
    from r3dfsseg_tpu.ops.knn import pairwise_sqdist
    if select_dtype is not None:
        d = pairwise_sqdist(feat32.astype(select_dtype),
                            seeds.astype(select_dtype)).astype(jnp.float32)
    else:
        d = pairwise_sqdist(feat32, seeds)                    # (N, k)
    big = jnp.asarray(3.4e38, jnp.float32)
    d = jnp.where(seed_valid[None, :], d, big)
    assign = jnp.argmin(d, axis=-1).astype(jnp.int32)        # (N,)

    # cluster means over valid points only (mpti.py:625-629)
    w = valid.astype(jnp.float32)
    sums = segment_sum(feat32 * w[:, None], assign, k)        # (k, C)
    cnts = segment_sum(w[:, None], assign, k)[:, 0]           # (k,)
    # a valid seed can end up empty only when duplicate points collapse;
    # fall back to the seed's own feature to stay finite.
    means = sums / jnp.maximum(cnts, 1.0)[:, None]
    protos = jnp.where((cnts > 0.0)[:, None], means, seeds)
    protos = jnp.where(seed_valid[:, None], protos, 0.0).astype(feat.dtype)
    return MultiPrototypes(protos, seed_valid, assign)
