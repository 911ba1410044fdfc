"""Relaxed-precision graph knobs (round 2): bf16 neighbour selection and
bf16 CG matvec storage — close to the f32 path, exact where it matters."""
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r3dfsseg_tpu.ops import label_propagate, local_constrained_affinity  # noqa: E402


def _affinity_pair(rng, n=256, c=32, k=24):
    nf = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    a32 = local_constrained_affinity(nf, k, 1.0, impl="threshold")
    a16 = local_constrained_affinity(nf, k, 1.0, impl="threshold",
                                     compare_dtype=jnp.bfloat16)
    return np.asarray(a32), np.asarray(a16)


@pytest.mark.slow
def test_bf16_neighbour_selection_matches_f32(rng):
    a32, a16 = _affinity_pair(rng)
    # structural invariants hold in both
    for a in (a32, a16):
        np.testing.assert_allclose(a, a.T, atol=0)
        assert np.all(np.diag(a) == 0)
        assert np.all((a >= 0) & (a <= 2.0))        # sym of exp(-d/2) pairs
    # selection differs only on near-tie boundary entries
    same = ((a32 > 0) == (a16 > 0)).mean()
    assert same > 0.995, same
    # where both selected, values agree up to the a+a^T multiplicity
    # (an edge picked in both directions by one variant but one direction
    # by the other differs by exactly 2x) times bf16-gram rounding: since
    # round 3 the relaxed mode computes the inner product from
    # mean-centered bf16 inputs (f32 norms), giving median ~0.1% / max
    # ~2.5% similarity error (ops/lp.py — a RAW bf16 gram was rejected at
    # 10-20% error).
    both = (a32 > 0) & (a16 > 0)
    ratio = a32[both] / a16[both]
    log2r = np.log2(ratio)
    dist = np.abs(log2r[:, None] - np.array([[-1.0, 0.0, 1.0]])).min(1)
    assert np.median(dist) < 0.02, np.median(dist)   # bulk within ~1.4%
    assert dist.max() < 0.12, dist.max()             # tail within ~9%


def test_bf16_selection_keeps_at_least_k(rng):
    n, k = 256, 24
    nf = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    a = np.asarray(local_constrained_affinity(
        nf, k, 1.0, impl="threshold", compare_dtype=jnp.bfloat16))
    # pre-symmetrisation each row had >= k neighbours; after a + a^T each
    # row has at least that many nonzeros
    assert (np.count_nonzero(a, axis=1) >= k).all()


@pytest.mark.slow
def test_bf16_cg_matvec_close_to_f32(rng):
    n = 400
    nf = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    y = jnp.zeros((n, 3), jnp.float32)
    y = y.at[:20, 0].set(1.0).at[20:40, 1].set(1.0).at[40:60, 2].set(1.0)
    a = local_constrained_affinity(nf, 24, 1.0, impl="threshold")
    zf = label_propagate(a, y, 0.99, solver="cg", cg_iters=60)
    zb = label_propagate(a, y, 0.99, solver="cg", cg_iters=60,
                         matvec_dtype=jnp.bfloat16)
    # same propagation structure: predictions agree on almost all queries
    agree = (np.argmax(np.asarray(zf)[60:], 1)
             == np.argmax(np.asarray(zb)[60:], 1)).mean()
    assert agree > 0.98, agree
    # and the bf16 solution still solves a nearby system accurately:
    # residual of the f32 operator applied to zb is small relative to y
    s = np.asarray(a, np.float64)
    d = s.sum(1)
    dinv = 1.0 / np.sqrt(d + np.finfo(float).eps)
    s = s * dinv[:, None] * dinv[None, :]
    r = np.asarray(y, np.float64) - (np.asarray(zb, np.float64)
                                     - 0.99 * s @ np.asarray(zb, np.float64))
    rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(y))
    assert rel < 0.05, rel


@pytest.mark.slow
def test_centered_sqdist_custom_grad_matches_autodiff(rng):
    """The relaxed gram's custom VJP (bf16 cotangent into the backward
    dots) matches plain autodiff through the same primal up to the
    cotangent quantisation (~0.4%)."""
    from r3dfsseg_tpu.ops.lp import _centered_sqdist

    n, c = 64, 16
    xc = rng.normal(size=(n, c)).astype(np.float32)
    xb = jnp.asarray(xc).astype(jnp.bfloat16)
    xx = jnp.sum(jnp.asarray(xc) ** 2, axis=-1, keepdims=True)
    w = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))

    def primal(xb_, xx_):
        inner = jnp.einsum("nc,mc->nm", xb_, xb_,
                           preferred_element_type=jnp.float32)
        return jnp.maximum(xx_ - 2.0 * inner + xx_.T, 0.0)

    def loss(fn, xb_, xx_):
        return jnp.sum(fn(xb_, xx_) * w)

    g_ref = jax.grad(lambda a, b: loss(primal, a, b), argnums=(0, 1))(xb, xx)
    g_got = jax.grad(lambda a, b: loss(_centered_sqdist, a, b),
                     argnums=(0, 1))(xb, xx)
    for got, ref in zip(g_got, g_ref):
        got = np.asarray(got, np.float32)
        ref = np.asarray(ref, np.float32)
        cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
        assert cos > 0.999, cos


@pytest.mark.slow
def test_bf16_affinity_returns_half_width_graph(rng):
    """Relaxed threshold mode stores the whole graph chain in bf16 (the
    solver's matvec copy would be bf16 anyway); values stay within one
    store-rounding of the f32 chain and the bf16 in-place normalisation in
    label_propagate matches f32-normalise-then-cast to bf16 resolution."""
    n = 200
    nf = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    a16 = local_constrained_affinity(nf, 12, 0.0, impl="threshold",
                                     compare_dtype=jnp.bfloat16)
    assert a16.dtype == jnp.bfloat16
    # f32-normalise the upcast graph (the old path) vs what the relaxed
    # label_propagate matvec sees — compare via a 1-iteration cheby solve
    # being finite and close to the f32-graph solve
    y = jnp.zeros((n, 3), jnp.float32).at[:10, 0].set(1.0)
    zb = label_propagate(a16, y, 0.99, solver="cheby", cg_iters=40,
                         matvec_dtype=jnp.bfloat16)
    zf = label_propagate(a16.astype(jnp.float32), y, 0.99, solver="cheby",
                         cg_iters=40, matvec_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(zb), np.asarray(zf),
                               rtol=0.05, atol=5e-3)


@pytest.mark.slow
def test_bf16_cg_gradients_flow(rng):
    n = 128
    nf = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    y = jnp.zeros((n, 3), jnp.float32).at[:10, 0].set(1.0)

    def loss(feats):
        a = local_constrained_affinity(feats, 8, 1.0, impl="threshold",
                                       compare_dtype=jnp.bfloat16)
        z = label_propagate(a, y, 0.99, solver="cg", cg_iters=20,
                            matvec_dtype=jnp.bfloat16)
        return jnp.sum(z * z)

    g = jax.grad(loss)(nf)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_packed_knn_tie_break_lowest_index():
    """Duplicate points: packed-key extraction must resolve exact ties to
    the lowest column index (lax.top_k semantics)."""
    import functools
    from jax.experimental import pallas as pl
    from r3dfsseg_tpu.ops import pallas_knn as pk

    x = np.zeros((1, 16, 4), np.float32)
    x[0, :8] = 1.0          # points 0-7 identical; 8-15 identical
    x = jnp.asarray(x)
    got = np.asarray(pl.pallas_call(
        functools.partial(pk._knn_kernel, k=4, n_keys=16),
        out_shape=jax.ShapeDtypeStruct((1, 16, 4), jnp.int32),
        grid=(1, 1),
        in_specs=[pl.BlockSpec((1, 16, 4), lambda i, j: (i, j, 0)),
                  pl.BlockSpec((1, 16, 4), lambda i, j: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 16, 4), lambda i, j: (i, j, 0)),
        interpret=True,
    )(x, x))
    for i in range(16):
        assert got[0, i].tolist() == ([0, 1, 2, 3] if i < 8 else
                                      [8, 9, 10, 11]), (i, got[0, i])


def test_bf16_jit_auto_bandwidth_does_not_saturate(rng):
    """Regression: the self/invalid sentinel used to be 3.4e38 — at the
    edge of bf16 representability.  XLA's constant-folded f32->bf16
    convert rounds such a value differently (max-finite) than the eager
    runtime convert (inf), so under whole-program jit the sentinel masks
    in _kth_smallest_per_row never fired: the bisection returned garbage
    radii, auto-bandwidth (sigma<=0) blew up to sigma2=inf, the affinity
    saturated to the uniform COMPLETE graph and lp_loss pinned at ln(3)
    from step 1 of every bf16-graph training run.  Pin the contract under
    jit: near-k row degrees, finite values, close to the eager result."""
    n, k = 256, 24
    nf = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    valid = jnp.ones((n,), bool).at[-10:].set(False)

    def build(x):
        return local_constrained_affinity(x, k, 0.0, valid=valid,
                                          impl="threshold",
                                          compare_dtype=jnp.bfloat16)

    a_jit = np.asarray(jax.jit(build)(nf))
    a_eager = np.asarray(build(nf))
    assert np.isfinite(a_jit).all()
    deg = np.count_nonzero(a_jit, axis=1)[:-10]
    # threshold selection admits bf16-resolution ties (plentiful on
    # concentrated gaussian distances at this scale) and symmetrisation
    # adds more — but nothing near the COMPLETE graph, which is the
    # failure signature (deg = n - 11 for every row)
    assert deg.min() >= k, deg.min()
    assert deg.max() <= int(0.7 * n), deg.max()
    # k-th neighbour keeps weight ~exp(-2) under auto bandwidth
    assert a_jit[a_jit > 0].min() > 1e-4
    np.testing.assert_allclose(a_jit, a_eager, atol=1e-5)
