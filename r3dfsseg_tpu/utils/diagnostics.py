"""Noise-robustness diagnostics.

Vectorised re-designs of the reference's debug instrumentation, computed
against ground-truth labels during training/evaluation:

  * `clean_detection_precision_recall` — `check_clean_detection`
    (`/root/reference/models/protonet.py:159-182`);
  * `query_label_precision_recall` — `check_query_label`
    (protonet.py:184-212);
  * `support_mask_accuracy` — `check_support_mask_accuracy`
    (protonet.py:214-242);
  * `prototype_cleanness` — `Check_Proto_Cleanness`
    (`models/mpti.py:374-412`).

All are pure jnp functions usable inside jitted steps (returned in aux
metric dicts) or on host arrays.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from r3dfsseg_tpu.ops.segment import segment_mean

Array = jax.Array


def clean_detection_precision_recall(gt_flags: Array, pred_flags: Array
                                     ) -> Tuple[Array, Array]:
    """Precision/recall of predicted clean flags vs ground truth
    (protonet.py:159-182).  Any matching shapes; 1 = clean."""
    gt = gt_flags.astype(jnp.float32)
    pr = pred_flags.astype(jnp.float32)
    tp = jnp.sum(gt * pr)
    fn = jnp.sum(gt * (1.0 - pr))
    fp = jnp.sum((1.0 - gt) * pr)
    precision = tp / jnp.maximum(tp + fp, 1e-12)
    recall = tp / jnp.maximum(tp + fn, 1e-12)
    return precision, recall


def query_label_precision_recall(gt_label: Array, pred_label: Array,
                                 n_classes: int) -> Dict[str, Array]:
    """Per-class precision/recall averaged over classes incl. background
    (protonet.py:184-212)."""
    precisions, recalls = [], []
    for c in range(n_classes):
        g = (gt_label == c)
        p = (pred_label == c)
        tp = jnp.sum(g & p).astype(jnp.float32)
        fn = jnp.sum(g & ~p).astype(jnp.float32)
        fp = jnp.sum(~g & p).astype(jnp.float32)
        precisions.append(tp / jnp.maximum(tp + fp, 1e-12))
        recalls.append(tp / jnp.maximum(tp + fn, 1e-12))
    return {
        "avg_precision": jnp.mean(jnp.stack(precisions)),
        "avg_recall": jnp.mean(jnp.stack(recalls)),
    }


def support_mask_accuracy(estimate_mask: Array, original_mask: Array,
                          gt_mask: Array) -> Dict[str, Array]:
    """Point-level mask quality after clean detection
    (protonet.py:214-242): clean ratio inside the estimated mask and the
    surviving-size ratio, averaged over ways.

    Shapes: (n_way, k_shot, n_points) binary.
    """
    est = estimate_mask.astype(jnp.float32)
    orig = original_mask.astype(jnp.float32)
    gt = gt_mask.astype(jnp.float32)
    est_1 = jnp.sum(est, axis=(1, 2))
    orig_1 = jnp.sum(orig, axis=(1, 2))
    est_clean = jnp.sum(est * gt, axis=(1, 2))
    return {
        "clean_ratio": jnp.mean(est_clean / jnp.maximum(est_1, 1.0)),
        "size_ratio": jnp.mean(est_1 / jnp.maximum(orig_1, 1.0)),
    }


def prototype_cleanness(gt_support_y: Array, support_y: Array,
                        fg_assign: Array, fg_valid_points: Array,
                        n_protos: int) -> Dict[str, Array]:
    """Per-prototype mean cleanness of assigned fg points (mpti.py:374-412).

    Args:
      gt_support_y / support_y: (n_way, k_shot, n_points) binary masks.
      fg_assign: (n_way, k_shot*n_points) point->prototype slot.
      fg_valid_points: (n_way, k_shot*n_points) bool (the fg mask, flat).
      n_protos: prototype slots per way.
    Returns per-way proto cleanness matrix + original support cleanness.
    """
    n_way = support_y.shape[0]
    clean = (gt_support_y.reshape(n_way, -1) > 0).astype(jnp.float32)
    w = fg_valid_points.astype(jnp.float32)

    def per_way(cl, assign, wt):
        return segment_mean(cl[:, None], assign, n_protos, weights=wt)[:, 0]

    proto_clean = jax.vmap(per_way)(clean, fg_assign, w)        # (w, P)
    orig = jnp.sum(clean * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
    return {
        "proto_cleanness": proto_clean,
        "count_fully_clean": jnp.sum((proto_clean == 1.0).astype(jnp.int32), axis=1),
        "original_cleanness": orig,
    }
