"""Diagnostics vs transliterated reference formulas."""
import numpy as np
import jax.numpy as jnp

from r3dfsseg_tpu.utils.diagnostics import (
    clean_detection_precision_recall,
    prototype_cleanness,
    query_label_precision_recall,
    support_mask_accuracy,
)


def test_clean_detection_pr(rng):
    gt = rng.integers(0, 2, size=(2, 5)).astype(np.float32)
    pr = rng.integers(0, 2, size=(2, 5)).astype(np.float32)
    p, r = clean_detection_precision_recall(jnp.asarray(gt), jnp.asarray(pr))
    tp = (gt * pr).sum(); fn = (gt * (1 - pr)).sum(); fp = ((1 - gt) * pr).sum()
    np.testing.assert_allclose(float(p), tp / (tp + fp), rtol=1e-6)
    np.testing.assert_allclose(float(r), tp / (tp + fn), rtol=1e-6)


def test_query_label_pr(rng):
    gt = rng.integers(0, 3, size=(2, 40))
    pr = rng.integers(0, 3, size=(2, 40))
    out = query_label_precision_recall(jnp.asarray(gt), jnp.asarray(pr), 3)
    # transliteration (protonet.py:190-212)
    ps, rs = [], []
    for c in range(3):
        g, p = gt == c, pr == c
        tp = (g & p).sum(); fn = (g & ~p).sum(); fp = (~g & p).sum()
        ps.append(tp / max(tp + fp, 1e-12)); rs.append(tp / max(tp + fn, 1e-12))
    np.testing.assert_allclose(float(out["avg_precision"]), np.mean(ps), rtol=1e-5)
    np.testing.assert_allclose(float(out["avg_recall"]), np.mean(rs), rtol=1e-5)


def test_support_mask_accuracy(rng):
    orig = rng.integers(0, 2, size=(2, 3, 30))
    est = orig * rng.integers(0, 2, size=(2, 3, 30))
    gt = rng.integers(0, 2, size=(2, 3, 30))
    out = support_mask_accuracy(jnp.asarray(est), jnp.asarray(orig), jnp.asarray(gt))
    want_clean = np.mean([
        (est[w] * gt[w]).sum() / max(est[w].sum(), 1) for w in range(2)])
    np.testing.assert_allclose(float(out["clean_ratio"]), want_clean, rtol=1e-5)


def test_prototype_cleanness(rng):
    n_way, k, n, P = 2, 2, 16, 4
    sy = rng.integers(0, 2, size=(n_way, k, n))
    gt = sy * rng.integers(0, 2, size=(n_way, k, n))
    assign = rng.integers(0, P, size=(n_way, k * n))
    valid = sy.reshape(n_way, -1) > 0
    out = prototype_cleanness(jnp.asarray(gt), jnp.asarray(sy),
                              jnp.asarray(assign), jnp.asarray(valid), P)
    pc = np.asarray(out["proto_cleanness"])
    for w in range(n_way):
        for p in range(P):
            sel = (assign[w] == p) & valid[w]
            if sel.sum():
                want = (gt.reshape(n_way, -1)[w][sel] > 0).mean()
                np.testing.assert_allclose(pc[w, p], want, rtol=1e-5)
