"""Golden parity for the cluster-CCNS port (`ops/ccns.py`) against the REAL
reference implementation (`/root/reference/models/protonet.py:58-157`).

The reference block is dead there (zero callers); the port is validated by
calling the reference methods directly — they touch no module state on the
live (train=False) path, so they run unbound with the torch_scatter stubs.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/scripts")
try:
    from make_reference_fixture import install_stubs  # noqa: E402
finally:
    sys.path.remove("/root/repo/scripts")

install_stubs()
# scoped insertion (see test_backbone.py): never leave /root/reference on
# sys.path past the import, or `import eval_noise` in a later test module
# can resolve to the reference's same-named entry script
sys.path.insert(0, "/root/reference")
try:
    from models.protonet import ProtoNet as RefProtoNet  # noqa: E402
finally:
    sys.path.remove("/root/reference")

from r3dfsseg_tpu.ops.ccns import (  # noqa: E402
    aggregate_class_clusters, detect_clean_clusters)


def _random_clusters(gen, K=4, N=96, d=16, C=7):
    feat = gen.normal(size=(K, N, d)).astype(np.float32)
    label = (gen.uniform(size=(K, N)) < 0.4).astype(np.float32)
    # every point gets a cluster id; not all ids appear in every shot
    cluster = gen.integers(0, C, size=(K, N)).astype(np.int64)
    cluster[0, :10] = 6  # ensure a shared id with mixed labels
    return feat, label, cluster


def test_aggregate_matches_reference(rng):
    K, N, d, C = 4, 96, 16, 7
    feat, label, cluster = _random_clusters(rng, K, N, d, C)

    ref_feats, ref_idx, ref_sizes = RefProtoNet.aggregate_cluster_one_class(
        None,
        torch.tensor(feat).transpose(1, 2),   # reference is channels-first
        torch.tensor(label),
        torch.tensor(cluster))

    means, sizes, is_class = aggregate_class_clusters(feat, label, cluster, C)
    means, sizes, is_class = map(np.asarray, (means, sizes, is_class))

    for k in range(K):
        ours_ids = np.nonzero(is_class[k])[0]
        np.testing.assert_array_equal(ours_ids, ref_idx[k].numpy())
        np.testing.assert_allclose(
            means[k, ours_ids], ref_feats[k].numpy().T, rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(
            sizes[k, ours_ids], ref_sizes[k].numpy(), rtol=1e-6)


def test_detect_matches_reference(rng):
    K, N, d, C = 4, 96, 16, 7
    feat, label, cluster = _random_clusters(rng, K, N, d, C)
    means, sizes, is_class = map(
        np.asarray, aggregate_class_clusters(feat, label, cluster, C))

    # reference consumes the class clusters of all shots concatenated
    sel = [(k, c) for k in range(K) for c in np.nonzero(is_class[k])[0]]
    cls_feat = np.stack([means[k, c] for k, c in sel])        # (M, d)
    cls_size = np.array([sizes[k, c] for k, c in sel], np.float32)

    ref_clean = RefProtoNet.detect_clean_cluster_one_class(
        None, torch.tensor(cls_feat.T), torch.tensor(cls_size)).numpy()

    # ours: same rows plus padding, mask excludes the pad from the mean
    pad = 5
    M = len(sel)
    feat_p = np.concatenate([cls_feat, np.ones((pad, d), np.float32)])
    size_p = np.concatenate([cls_size, np.full(pad, 1e6, np.float32)])
    valid = np.concatenate([np.ones(M, bool), np.zeros(pad, bool)])
    clean = np.asarray(detect_clean_clusters(feat_p, size_p, valid))

    np.testing.assert_array_equal(clean[:M], ref_clean)
    assert not clean[M:].any()


def test_detect_weighting_favours_large_coherent_clusters(rng):
    """Sanity: two tight large clusters + one far outlier — the outlier is
    flagged unclean."""
    base = rng.normal(size=(1, 8)).astype(np.float32)
    f = np.concatenate([
        base + 0.01 * rng.normal(size=(3, 8)).astype(np.float32),
        -5.0 * base + 0.01 * rng.normal(size=(1, 8)).astype(np.float32)])
    sizes = np.array([100, 90, 80, 10], np.float32)
    valid = np.ones(4, bool)
    clean = np.asarray(detect_clean_clusters(f, sizes, valid))
    assert clean[:3].all() and not clean[3]
