"""Unit tests for the core ops against tiny numpy oracles transliterated
from the cited reference lines (see SURVEY.md section 4 test plan)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from r3dfsseg_tpu.ops import (
    pairwise_sqdist,
    knn_indices,
    gather_neighbors,
    masked_fps,
    multi_prototypes,
    segment_mean,
    masked_mean,
    local_constrained_affinity,
    label_propagate,
    grid_seed_pool,
)


# ---------------------------------------------------------------- knn ----
def test_pairwise_sqdist_matches_numpy(rng):
    x = rng.normal(size=(5, 7)).astype(np.float32)
    y = rng.normal(size=(6, 7)).astype(np.float32)
    want = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    got = np.asarray(pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_knn_includes_self_like_dgcnn(rng):
    # reference EdgeConv kNN keeps self as a neighbour (dgcnn.py:17-23)
    x = rng.normal(size=(16, 3)).astype(np.float32)
    idx = np.asarray(knn_indices(jnp.asarray(x), k=4))
    d = ((x[:, None] - x[None]) ** 2).sum(-1)
    for i in range(16):
        want = set(np.argsort(d[i])[:4].tolist())
        assert set(idx[i].tolist()) == want
        assert i in idx[i]  # self included


def test_knn_exclude_self_and_valid(rng):
    x = rng.normal(size=(10, 3)).astype(np.float32)
    valid = np.ones(10, bool); valid[7:] = False
    idx = np.asarray(knn_indices(jnp.asarray(x), k=3,
                                 valid=jnp.asarray(valid), exclude_self=True))
    for i in range(10):
        assert i not in idx[i]
        assert all(j < 7 for j in idx[i])


def test_gather_neighbors(rng):
    x = rng.normal(size=(2, 8, 5)).astype(np.float32)
    idx = rng.integers(0, 8, size=(2, 8, 3)).astype(np.int32)
    got = np.asarray(gather_neighbors(jnp.asarray(x), jnp.asarray(idx)))
    for b in range(2):
        for n in range(8):
            for k in range(3):
                np.testing.assert_array_equal(got[b, n, k], x[b, idx[b, n, k]])


# ---------------------------------------------------------------- fps ----
def _fps_oracle(x, n_valid, k):
    """Greedy farthest point sampling starting at point 0 (random_start=False)."""
    pts = x[:n_valid]
    chosen = [0]
    mind = ((pts - pts[0]) ** 2).sum(-1)
    for _ in range(min(k, n_valid) - 1):
        nxt = int(np.argmax(mind))
        chosen.append(nxt)
        mind = np.minimum(mind, ((pts - pts[nxt]) ** 2).sum(-1))
    return chosen


def test_masked_fps_matches_greedy_oracle(rng):
    x = rng.normal(size=(20, 4)).astype(np.float32)
    valid = np.ones(20, bool); valid[15:] = False
    idx, ok = masked_fps(jnp.asarray(x), jnp.asarray(valid), 6)
    idx, ok = np.asarray(idx), np.asarray(ok)
    want = _fps_oracle(x, 15, 6)
    assert ok.sum() == 6
    np.testing.assert_array_equal(idx[:6], want)


def test_masked_fps_fewer_points_than_k(rng):
    x = rng.normal(size=(10, 3)).astype(np.float32)
    valid = np.zeros(10, bool); valid[2:6] = True  # 4 valid points
    idx, ok = masked_fps(jnp.asarray(x), jnp.asarray(valid), 7)
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert ok.sum() == 4
    # all valid points selected exactly once in the valid slots
    assert set(idx[:4].tolist()) == {2, 3, 4, 5}


def test_multi_prototypes_identity_when_small(rng):
    # ratio >= 1 branch (mpti.py:631-634): every point is its own prototype
    x = rng.normal(size=(8, 5)).astype(np.float32)
    valid = np.zeros(8, bool); valid[:3] = True
    out = multi_prototypes(jnp.asarray(x), jnp.asarray(valid), 5)
    protos = np.asarray(out.prototypes)[np.asarray(out.proto_valid)]
    # set equality: the 3 valid points, order = FPS order
    got = {tuple(np.round(r, 5)) for r in protos}
    want = {tuple(np.round(r, 5)) for r in x[:3]}
    assert got == want


def test_multi_prototypes_cluster_means(rng):
    # two well-separated blobs, k=2 -> prototypes == blob means
    a = rng.normal(size=(10, 3)).astype(np.float32) * 0.01
    b = rng.normal(size=(10, 3)).astype(np.float32) * 0.01 + 100.0
    x = np.concatenate([a, b])
    valid = np.ones(20, bool)
    out = multi_prototypes(jnp.asarray(x), jnp.asarray(valid), 2)
    protos = np.asarray(out.prototypes)
    assert np.asarray(out.proto_valid).all()
    means = sorted([a.mean(0).sum(), b.mean(0).sum()])
    got = sorted([protos[0].sum(), protos[1].sum()])
    np.testing.assert_allclose(got, means, rtol=1e-4)
    assign = np.asarray(out.assignments)
    assert len(np.unique(assign[:10])) == 1 and len(np.unique(assign[10:])) == 1


# ------------------------------------------------------------ segment ----
def test_segment_mean(rng):
    x = rng.normal(size=(12, 4)).astype(np.float32)
    ids = rng.integers(0, 3, size=12)
    got = np.asarray(segment_mean(jnp.asarray(x), jnp.asarray(ids), 4))
    for s in range(3):
        np.testing.assert_allclose(got[s], x[ids == s].mean(0), rtol=1e-5)
    np.testing.assert_allclose(got[3], 0.0)  # empty segment -> 0


def test_segment_sum_onehot_impl_matches_scatter(rng, monkeypatch):
    """The TPU one-hot-einsum fast path (R3D_SEGSUM_IMPL=onehot) is exact
    vs the XLA scatter, including dropped out-of-range/negative ids and
    the gradient (cotangent gather)."""
    from r3dfsseg_tpu.ops.segment import segment_sum

    x = rng.normal(size=(40, 7)).astype(np.float32)
    ids = rng.integers(-2, 6, size=40)  # includes negative + >= num_segments
    xj, idsj = jnp.asarray(x), jnp.asarray(ids)

    monkeypatch.setenv("R3D_SEGSUM_IMPL", "scatter")
    want = np.asarray(segment_sum(xj, idsj, 5))
    gw = np.asarray(jax.grad(lambda a: segment_sum(a, idsj, 5).sum())(xj))
    monkeypatch.setenv("R3D_SEGSUM_IMPL", "onehot")
    got = np.asarray(segment_sum(xj, idsj, 5))
    gg = np.asarray(jax.grad(lambda a: segment_sum(a, idsj, 5).sum())(xj))

    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(gg, gw, rtol=1e-6, atol=1e-6)


def test_masked_mean(rng):
    x = rng.normal(size=(3, 6)).astype(np.float32)
    m = rng.integers(0, 2, size=(3, 6)).astype(np.float32)
    got = np.asarray(masked_mean(jnp.asarray(x), jnp.asarray(m), axis=1))
    want = (x * m).sum(1) / (m.sum(1) + 1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ----------------------------------------------------------- affinity ----
def _affinity_oracle(x, k, sigma, valid=None):
    """Transliteration of calculateLocalConstrainedAffinity (mpti.py:717-756)."""
    n = x.shape[0]
    d2 = ((x[:, None] - x[None]) ** 2).sum(-1)
    d2s = d2.copy()
    np.fill_diagonal(d2s, np.inf)
    if valid is not None:
        d2s[:, ~valid] = np.inf
    idx = np.argsort(d2s, axis=1, kind="stable")[:, :k]
    a = np.zeros((n, n), np.float32)
    for i in range(n):
        for j in idx[i]:
            a[i, j] = np.exp(-0.5 * d2[i, j] / sigma**2)
    a = a + a.T
    np.fill_diagonal(a, 0)
    if valid is not None:
        a = a * valid[:, None] * valid[None, :]
    return a


def test_affinity_matches_oracle(rng):
    x = rng.normal(size=(30, 6)).astype(np.float32)
    got = np.asarray(local_constrained_affinity(jnp.asarray(x), k=5, sigma=1.3))
    want = _affinity_oracle(x, 5, 1.3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_exact_topk_select_matches_lax_top_k(rng):
    """The round-5 bisection selection is set-identical to lax.top_k —
    including exact-value ties (lowest-index-first) and zero distances —
    so the 'topk' (parity) affinity it feeds is bit-identical to the old
    gather/scatter build."""
    from r3dfsseg_tpu.ops.lp import _exact_topk_select

    for trial in range(3):
        d = np.abs(rng.normal(size=(40, 40))).astype(np.float32)
        # engineer exact ties: duplicate entries inside and across rows,
        # plus exact zeros (bitcast 0x00000000 edge)
        d[5, 7] = d[5, 12] = d[5, 31]
        d[9, :6] = d[9, 6]
        d[11, 3] = 0.0
        d[11, 19] = 0.0
        jd = jnp.asarray(d)
        mask, kth = jax.jit(_exact_topk_select, static_argnums=1)(jd, 7)
        mask = np.asarray(mask)
        negv, idx = jax.lax.top_k(-jd, 7)
        want = np.zeros_like(d, dtype=bool)
        want[np.arange(40)[:, None], np.asarray(idx)] = True
        np.testing.assert_array_equal(mask, want, err_msg=f"trial {trial}")
        assert (mask.sum(1) == 7).all()
        np.testing.assert_array_equal(np.asarray(kth)[:, 0],
                                      -np.asarray(negv)[:, -1])


def test_topk_affinity_matches_old_scatter_build(rng):
    """The mask-based 'topk' affinity equals the gather/scatter build it
    replaced, bit for bit."""
    x = rng.normal(size=(50, 8)).astype(np.float32)
    got = np.asarray(local_constrained_affinity(
        jnp.asarray(x), k=9, sigma=1.1, impl="topk"))
    # old implementation, verbatim semantics
    from r3dfsseg_tpu.ops.knn import pairwise_sqdist
    sqd = np.asarray(pairwise_sqdist(jnp.asarray(x)))
    sel = sqd.copy()
    np.fill_diagonal(sel, 1e30)
    negv, idx = jax.lax.top_k(-jnp.asarray(sel), 9)
    sim_full = np.asarray(jnp.exp(-0.5 * jnp.asarray(sqd) / (1.1 * 1.1)))
    sim = np.take_along_axis(sim_full, np.asarray(idx), axis=1)
    a = np.zeros((50, 50), np.float32)
    a[np.arange(50)[:, None], np.asarray(idx)] = sim
    a = a + a.T
    np.fill_diagonal(a, 0)
    np.testing.assert_array_equal(got, a)


def test_affinity_masks_invalid_nodes(rng):
    x = rng.normal(size=(20, 4)).astype(np.float32)
    valid = np.ones(20, bool); valid[17:] = False
    got = np.asarray(local_constrained_affinity(
        jnp.asarray(x), k=4, sigma=1.0, valid=jnp.asarray(valid)))
    want = _affinity_oracle(x, 4, 1.0, valid)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert (got[17:] == 0).all() and (got[:, 17:] == 0).all()


def test_affinity_auto_sigma_scale_invariant(rng):
    """sigma<=0 self-tunes the bandwidth to the median k-th-neighbour
    distance: scaling the features must leave the graph (weights AND
    selection) unchanged, where fixed sigma=1 underflows to a dead graph
    (the ln(3) collapse mode, DESIGN.md)."""
    x = rng.normal(size=(40, 8)).astype(np.float32)
    a1 = np.asarray(local_constrained_affinity(jnp.asarray(x), k=6, sigma=0.0))
    a2 = np.asarray(local_constrained_affinity(jnp.asarray(30.0 * x), k=6,
                                               sigma=0.0))
    np.testing.assert_allclose(a1, a2, rtol=1e-3, atol=1e-5)
    # fixed sigma at the same scale: graph numerically dead
    dead = np.asarray(local_constrained_affinity(jnp.asarray(30.0 * x), k=6,
                                                 sigma=1.0))
    assert dead.max() < 1e-12 and a1.max() > 0.01
    # k-th neighbour keeps weight ~exp(-2) by construction
    nz = a1[a1 > 0]
    assert nz.min() > 1e-4


def test_affinity_auto_sigma_respects_valid_mask(rng):
    x = rng.normal(size=(30, 6)).astype(np.float32)
    x[20:] *= 1e3          # junk rows must not poison the median
    valid = np.ones(30, bool); valid[20:] = False
    a = np.asarray(local_constrained_affinity(
        jnp.asarray(x), k=5, sigma=-1.0, valid=jnp.asarray(valid)))
    assert (a[20:] == 0).all() and (a[:, 20:] == 0).all()
    assert a.max() > 0.01


@pytest.mark.slow
def test_threshold_affinity_no_transpose_form(rng):
    """The threshold path computes A_knn + A_knn^T as the elementwise
    sim * ((d<=r_i) + (d<=r_j)) — no transpose.  Pin the two observable
    consequences: one-way edges carry sim once, mutual edges twice, and
    the output is exactly symmetric (also in bf16 compare mode with a
    valid mask)."""
    # On a line: A=0, B=1, C=1.6.  k=1 (self excluded): A->B, B->C, C->B.
    x = np.array([[0.0], [1.0], [1.6]], np.float32)
    a = np.asarray(local_constrained_affinity(jnp.asarray(x), k=1,
                                              sigma=1.0))
    sim = lambda d2: np.exp(-0.5 * d2)  # noqa: E731
    np.testing.assert_allclose(a[0, 1], sim(1.0), rtol=1e-6)       # one-way
    np.testing.assert_allclose(a[1, 2], 2 * sim(0.36), rtol=1e-6)  # mutual
    assert a[0, 2] == 0 and a[2, 0] == 0
    np.testing.assert_array_equal(a, a.T)

    xb = rng.normal(size=(40, 8)).astype(np.float32)
    valid = np.ones(40, bool); valid[33:] = False
    ab = np.asarray(local_constrained_affinity(
        jnp.asarray(xb), k=6, sigma=0.0, valid=jnp.asarray(valid),
        compare_dtype=jnp.bfloat16))
    np.testing.assert_array_equal(ab, ab.T)
    assert (np.diag(ab) == 0).all()
    assert (ab[33:] == 0).all() and (ab[:, 33:] == 0).all()


# ------------------------------------------------------------------ lp ----
def _lp_oracle(a, y, alpha=0.99):
    """Transliteration of label_propagate (mpti.py:758-776)."""
    eps = np.finfo(float).eps
    d = a.sum(1)
    dsi = np.sqrt(1.0 / (d + eps))
    s = np.diag(dsi) @ a @ np.diag(dsi)
    return np.linalg.inv(np.eye(a.shape[0]) - alpha * s + eps) @ y


@pytest.mark.parametrize("solver", ["solve", "cg", "cheby"])
def test_label_propagate_matches_oracle(rng, solver):
    x = rng.normal(size=(40, 5)).astype(np.float32)
    a = _affinity_oracle(x, 8, 1.0)
    y = np.zeros((40, 3), np.float32)
    y[:6] = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 6)]
    want = _lp_oracle(a.astype(np.float64), y.astype(np.float64))
    got = np.asarray(label_propagate(jnp.asarray(a), jnp.asarray(y),
                                     solver=solver, cg_iters=200))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_label_propagate_grad_flows(rng):
    x = rng.normal(size=(12, 3)).astype(np.float32)

    def loss(xx):
        a = local_constrained_affinity(xx, k=4, sigma=1.0)
        y = jnp.zeros((12, 2)).at[0, 0].set(1.0).at[1, 1].set(1.0)
        z = label_propagate(a, y, solver="cg", cg_iters=50)
        return jnp.sum(z[2:] ** 2)

    g = jax.grad(loss)(jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


# ---------------------------------------------------------------- grid ----
def _grid_oracle(xyz, feat, valid, n_cells):
    """Transliteration of grid_sampling (mpti.py:316-371) with slots."""
    pts, ft = xyz[valid], feat[valid]
    lo, hi = pts.min(0), pts.max(0)
    # f32 stride arithmetic matches torch (mpti.py:337-339); numpy would
    # silently promote f32/int to f64 and move the closed-interval bounds
    d = (hi - lo) / np.asarray(n_cells, np.float32)
    seeds, ok = [], []
    for ix in range(n_cells[0]):
        for iy in range(n_cells[1]):
            for iz in range(n_cells[2]):
                start = lo + d * np.asarray([ix, iy, iz], np.float32)
                m = np.ones(len(pts), bool)
                for ax in range(3):
                    m &= (pts[:, ax] >= start[ax]) & (pts[:, ax] <= start[ax] + d[ax])
                if m.sum() > 0:
                    seeds.append(ft[m].mean(0)); ok.append(True)
                else:
                    seeds.append(np.zeros(feat.shape[1])); ok.append(False)
    return np.stack(seeds), np.asarray(ok)


def test_grid_seed_pool_matches_oracle(rng):
    xyz = rng.uniform(size=(50, 3)).astype(np.float32)
    feat = rng.normal(size=(50, 6)).astype(np.float32)
    valid = rng.integers(0, 2, 50).astype(bool); valid[:5] = True
    for cells in [(1, 1, 1), (2, 2, 1)]:
        seeds, ok = grid_seed_pool(jnp.asarray(xyz), jnp.asarray(feat),
                                   jnp.asarray(valid), cells)
        wseeds, wok = _grid_oracle(xyz, feat, valid, cells)
        np.testing.assert_array_equal(np.asarray(ok), wok)
        # closed-interval cell bounds make membership razor-edge: XLA op
        # fusion (FMA) can flip a boundary point in/out of a cell, shifting
        # that cell's mean slightly — tolerate small absolute drift.
        np.testing.assert_allclose(np.asarray(seeds), wseeds, rtol=1e-4, atol=6e-3)
