"""Cluster-level clean detection (cluster-CCNS), TPU-native.

Port of the reference's `aggregate_cluster_one_class` /
`detect_clean_cluster_one_class` (`/root/reference/models/protonet.py:58-157`).
That block is DEAD in the reference — zero source-level callers (the live
clean detection is the seed-level MDNS, `mpti.py:87-223`) — but it is the
only reference algorithm without a counterpart here, so it is ported for
completeness and exposed as a standalone op (usable as an alternative
clean-shot detector over pre-clustered scans, e.g. the loader's cluster
column, `dataloaders/loader.py:339-349`).

Reference semantics, re-derived fixed-shape:

* aggregate (protonet.py:72-105): per shot, segment-mean features over the
  cluster id column, count cluster sizes, keep clusters whose mean binary
  label exceeds 0.5 ("this class").  The per-shot python loop + torch
  `unique`/`scatter_mean` becomes a one-hot einsum batched over shots —
  the reduction runs on the MXU with no dynamic shapes (absent cluster
  ids simply have size 0 and are masked out).
* detect (protonet.py:118-140): L2-normalise cluster features, all-pairs
  cosine similarity (diagonal KEPT, unlike seed-MDNS), column weights
  size/max_size, row-sum score, clean = score > mean(score).  The
  `begin_use_global_proto` branch is unreachable in the reference
  (initialised to 1e9 and never changed, protonet.py:57) and is omitted.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def aggregate_class_clusters(
    feat: Array, label: Array, cluster_label: Array, num_clusters: int
):
    """Per-shot cluster aggregation (protonet.py:58-105), fixed-shape.

    Args:
      feat: (K, N, d) point features, channels-last.
      label: (K, N) binary this-class membership per point.
      cluster_label: (K, N) int cluster ids in [0, num_clusters).
      num_clusters: static cluster-slot count (pad of torch `unique`).

    Returns:
      means: (K, C, d) per-cluster mean features (zero rows for empty slots).
      sizes: (K, C) point counts per cluster.
      is_class: (K, C) bool — cluster exists in the shot AND its mean binary
        label > 0.5 (the reference's class-membership test, :89-94).
    """
    feat = jnp.asarray(feat)
    one_hot = jax.nn.one_hot(cluster_label, num_clusters, dtype=feat.dtype)
    sizes = one_hot.sum(axis=1)                                   # (K, C)
    sums = jnp.einsum("knc,knd->kcd", one_hot, feat,
                      precision=jax.lax.Precision.HIGHEST)
    means = sums / jnp.maximum(sizes, 1.0)[..., None]
    mean_label = jnp.einsum("knc,kn->kc", one_hot,
                            label.astype(feat.dtype),
                            precision=jax.lax.Precision.HIGHEST)
    mean_label = mean_label / jnp.maximum(sizes, 1.0)
    is_class = (mean_label > 0.5) & (sizes > 0)
    return means, sizes, is_class


def detect_clean_clusters(cluster_feat: Array, sizes: Array, valid: Array
                          ) -> Array:
    """Size-weighted cosine-degree clean mask (protonet.py:107-157).

    Args:
      cluster_feat: (M, d) class-cluster features (all shots concatenated,
        padded rows allowed).
      sizes: (M,) cluster point counts.
      valid: (M,) bool — live rows; padded rows never score and never count
        toward the mean threshold.

    Returns: (M,) bool clean mask (False on padded rows).
    """
    f = jnp.asarray(cluster_feat)
    valid_f = valid.astype(f.dtype)
    norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    f = f / jnp.maximum(norm, 1e-12)                   # F.normalize, :120
    sim = f @ f.T                                      # diagonal kept, :127
    max_size = jnp.max(jnp.where(valid, sizes, 0.0))
    w = (sizes / jnp.maximum(max_size, 1.0)) * valid_f  # column weights, :129
    score = sim @ w                                     # row sums, :137-139
    denom = jnp.maximum(jnp.sum(valid_f), 1.0)
    mean_score = jnp.sum(score * valid_f) / denom
    return (score > mean_score) & valid                 # :140
