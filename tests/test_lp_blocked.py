"""Matrix-free scene LP (`ops/lp_blocked.py`) vs the dense path: identical
semantics on graphs small enough to compare directly."""
import numpy as np
import pytest

import jax.numpy as jnp

from r3dfsseg_tpu.ops.lp import label_propagate, local_constrained_affinity
from r3dfsseg_tpu.ops.lp_blocked import blocked_label_propagate


def _graph(rng, m=700, d=24, c=3, n_invalid=37):
    feat = rng.normal(size=(m, d)).astype(np.float32)
    valid = np.ones(m, bool)
    valid[rng.choice(m, n_invalid, replace=False)] = False
    y = np.zeros((m, c), np.float32)
    rows = rng.choice(m, 40, replace=False)
    y[rows, rng.integers(0, c, size=40)] = 1.0
    return feat, valid, y


@pytest.mark.parametrize("sigma", [1.0, 0.0])   # fixed + auto bandwidth
def test_blocked_matches_dense(rng, sigma):
    feat, valid, y = _graph(rng)
    k, alpha, iters = 20, 0.99, 60

    a = local_constrained_affinity(
        jnp.asarray(feat), k, sigma, valid=jnp.asarray(valid),
        impl="threshold")
    z_dense = np.asarray(label_propagate(
        a, jnp.asarray(y), alpha, solver="cheby", cg_iters=iters))

    z_blocked = np.asarray(blocked_label_propagate(
        jnp.asarray(feat), jnp.asarray(y), k=k, sigma=sigma, alpha=alpha,
        valid=jnp.asarray(valid), iters=iters, row_tile=128))

    # same solver on the same (tie-free) graph: tight agreement, and
    # identical argmax labels everywhere a label is defined
    np.testing.assert_allclose(z_blocked, z_dense, rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(z_blocked[valid].argmax(-1),
                                  z_dense[valid].argmax(-1))


def test_blocked_bf16_close_to_f32(rng):
    feat, valid, y = _graph(rng, m=400)
    z32 = np.asarray(blocked_label_propagate(
        jnp.asarray(feat), jnp.asarray(y), k=15, sigma=0.0, alpha=0.99,
        valid=jnp.asarray(valid), iters=50, row_tile=128))
    zbf = np.asarray(blocked_label_propagate(
        jnp.asarray(feat), jnp.asarray(y), k=15, sigma=0.0, alpha=0.99,
        valid=jnp.asarray(valid), iters=50, row_tile=128,
        compute_dtype=jnp.bfloat16))
    agree = (z32[valid].argmax(-1) == zbf[valid].argmax(-1)).mean()
    assert agree > 0.97, agree


def test_blocked_tile_size_invariant(rng):
    """The row tiling is an implementation detail: different tile sizes
    give the same answer (padding rows never leak into the graph)."""
    feat, valid, y = _graph(rng, m=330)   # not a multiple of any tile
    out = [np.asarray(blocked_label_propagate(
        jnp.asarray(feat), jnp.asarray(y), k=12, sigma=1.0, alpha=0.99,
        valid=jnp.asarray(valid), iters=40, row_tile=rt))
        for rt in (64, 128, 512)]
    np.testing.assert_allclose(out[0], out[1], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[0], out[2], rtol=1e-5, atol=1e-6)


def test_blocked_store_matches_stream(rng):
    """store_graph=True (build-once matrix) and False (rematerialising
    matvecs) produce the same propagation."""
    feat, valid, y = _graph(rng, m=330)
    kw = dict(k=12, sigma=0.0, alpha=0.99, valid=jnp.asarray(valid),
              iters=40, row_tile=128)
    z_store = np.asarray(blocked_label_propagate(
        jnp.asarray(feat), jnp.asarray(y), store_graph=True, **kw))
    z_stream = np.asarray(blocked_label_propagate(
        jnp.asarray(feat), jnp.asarray(y), store_graph=False, **kw))
    np.testing.assert_allclose(z_store, z_stream, rtol=1e-5, atol=1e-6)


def test_sparse_close_to_dense(rng):
    """Sparsify-once path: >99% label agreement with the dense graph and
    tight Z agreement when width covers every row's true entry count."""
    from r3dfsseg_tpu.ops.lp_blocked import sparse_label_propagate

    feat, valid, y = _graph(rng, m=600)
    k, alpha, iters = 20, 0.99, 60
    a = local_constrained_affinity(
        jnp.asarray(feat), k, 1.0, valid=jnp.asarray(valid),
        impl="threshold")
    z_dense = np.asarray(label_propagate(
        a, jnp.asarray(y), alpha, solver="cheby", cg_iters=iters))

    # width = m: no truncation — matches the dense graph tightly
    z_full = np.asarray(sparse_label_propagate(
        jnp.asarray(feat), jnp.asarray(y), k=k, sigma=1.0, alpha=alpha,
        valid=jnp.asarray(valid), iters=iters, row_tile=128, width=600))
    np.testing.assert_allclose(z_full, z_dense, rtol=2e-4, atol=2e-5)

    # default width (2k + slack): serving-grade agreement
    z_sparse = np.asarray(sparse_label_propagate(
        jnp.asarray(feat), jnp.asarray(y), k=k, sigma=1.0, alpha=alpha,
        valid=jnp.asarray(valid), iters=iters, row_tile=128))
    agree = (z_sparse[valid].argmax(-1) == z_dense[valid].argmax(-1)).mean()
    assert agree > 0.99, agree


def test_split_store_matches_f32_dense_tiles(rng):
    """split_store (f32 distances/exp, half-width selection compares,
    bf16 storage + split-bf16 hi/lo direction vectors — the f32-cliff
    closer, VERDICT r3 #4): agreement with the exact f32 path is
    rounding-tight except at neighbour-selection margins (bf16-resolved
    radii may flip a node on the k-th-distance boundary), labels agree
    overwhelmingly, and there is NO 50-iteration compounding."""
    feat, valid, y = _graph(rng, m=700)
    kw = dict(k=20, sigma=0.0, alpha=0.99, valid=jnp.asarray(valid),
              iters=60, row_tile=128)
    z_f32 = np.asarray(blocked_label_propagate(
        jnp.asarray(feat), jnp.asarray(y), **kw))
    z_split = np.asarray(blocked_label_propagate(
        jnp.asarray(feat), jnp.asarray(y), split_store=True, **kw))
    scale = np.abs(z_f32).max()
    # bulk agreement inside bf16's 2^-8 storage rounding; allow the rare
    # selection-margin node (measured: 1/2100 entries at m=700)
    close = np.isclose(z_split, z_f32, rtol=0, atol=2e-2 * scale)
    assert close.mean() > 0.995, close.mean()
    lab_agree = (z_split[valid].argmax(-1) == z_f32[valid].argmax(-1)).mean()
    assert lab_agree > 0.995, lab_agree
