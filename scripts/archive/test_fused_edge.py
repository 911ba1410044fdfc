"""Fused EdgeConv tail (Pallas, interpret mode on CPU) vs an unfused jnp
oracle: forward values, batch stats, and ALL gradients in train and eval
BN modes."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ARCHIVED with the kernel (round 4): load the module from the archive dir
import importlib.util as _ilu  # noqa: E402
_spec = _ilu.spec_from_file_location(
    "fused_edge", os.path.join(os.path.dirname(__file__), "fused_edge.py"))
fused_edge = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(fused_edge)


@pytest.fixture(autouse=True)
def _interpret():
    fused_edge._INTERPRET = True
    yield
    fused_edge._INTERPRET = False


def _oracle(e_raw, gamma0, beta0, w1, gamma1, beta1, m0, v0, m1, v1):
    def leaky(x):
        return jnp.where(x > 0, x, 0.2 * x)
    f = e_raw.astype(jnp.float32)
    x0 = (f - m0) / jnp.sqrt(v0 + 1e-5)
    h0 = leaky(gamma0 * x0 + beta0)
    l1 = h0 @ w1
    x1 = (l1 - m1) / jnp.sqrt(v1 + 1e-5)
    h1 = leaky(gamma1 * x1 + beta1)
    return jnp.max(h1, axis=2)


def _oracle_train(e_raw, gamma0, beta0, w1, gamma1, beta1):
    """Batch-stat BN end-to-end (stats inside the graph -> autodiff gives
    the full BN backward)."""
    def leaky(x):
        return jnp.where(x > 0, x, 0.2 * x)
    f = e_raw.astype(jnp.float32)
    m0 = jnp.mean(f, axis=(0, 1, 2))
    v0 = jnp.mean((f - m0) ** 2, axis=(0, 1, 2))
    h0 = leaky(gamma0 * (f - m0) / jnp.sqrt(v0 + 1e-5) + beta0)
    l1 = h0 @ w1
    m1 = jnp.mean(l1, axis=(0, 1, 2))
    v1 = jnp.mean((l1 - m1) ** 2, axis=(0, 1, 2))
    h1 = leaky(gamma1 * (l1 - m1) / jnp.sqrt(v1 + 1e-5) + beta1)
    return jnp.max(h1, axis=2)


def _inputs(rng, b=2, n=32, k=5, c=16):
    e = jnp.asarray(rng.normal(size=(b, n, k, c)).astype(np.float32))
    gamma0 = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
    beta0 = jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.1)
    w1 = jnp.asarray((rng.normal(size=(c, c)) / np.sqrt(c)).astype(np.float32))
    gamma1 = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
    beta1 = jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.1)
    return e, gamma0, beta0, w1, gamma1, beta1


def test_eval_forward_matches_oracle(rng):
    e, g0, b0, w1, g1, b1 = _inputs(rng)
    c = e.shape[-1]
    m0 = jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.1)
    v0 = jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32))
    m1 = jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.1)
    v1 = jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32))
    got = fused_edge.fused_edge_tail(e, g0, b0, w1, g1, b1,
                                     m0, v0, m1, v1, False)
    want = _oracle(e, g0, b0, w1, g1, b1, m0, v0, m1, v1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_batch_stats_match(rng):
    e, g0, b0, w1, g1, b1 = _inputs(rng)
    m0, v0, m1, v1 = fused_edge.edge_batch_stats(e, g0, b0, w1)
    f = np.asarray(e, np.float64)
    np.testing.assert_allclose(np.asarray(m0), f.mean((0, 1, 2)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v0), f.var((0, 1, 2)), atol=1e-5)
    # l1 oracle
    h0 = np.where(
        (np.asarray(g0) * (f - f.mean((0, 1, 2))) / np.sqrt(f.var((0, 1, 2)) + 1e-5)
         + np.asarray(b0)) > 0,
        np.asarray(g0) * (f - f.mean((0, 1, 2))) / np.sqrt(f.var((0, 1, 2)) + 1e-5)
        + np.asarray(b0),
        0.2 * (np.asarray(g0) * (f - f.mean((0, 1, 2)))
               / np.sqrt(f.var((0, 1, 2)) + 1e-5) + np.asarray(b0)))
    l1 = h0 @ np.asarray(w1, np.float64)
    np.testing.assert_allclose(np.asarray(m1), l1.mean((0, 1, 2)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1), l1.var((0, 1, 2)),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_train_forward_and_grads_match_oracle(rng):
    e, g0, b0, w1, g1, b1 = _inputs(rng)

    def fused_loss(e_, g0_, b0_, w1_, g1_, b1_):
        m0, v0, m1, v1 = fused_edge.edge_batch_stats(e_, g0_, b0_, w1_)
        m0, v0, m1, v1 = map(jax.lax.stop_gradient, (m0, v0, m1, v1))
        out = fused_edge.fused_edge_tail(e_, g0_, b0_, w1_, g1_, b1_,
                                         m0, v0, m1, v1, True)
        # weighted sum -> nontrivial cotangent
        w = jnp.cos(jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape)
        return jnp.sum(out * w)

    def oracle_loss(e_, g0_, b0_, w1_, g1_, b1_):
        out = _oracle_train(e_, g0_, b0_, w1_, g1_, b1_)
        w = jnp.cos(jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape)
        return jnp.sum(out * w)

    args = (e, g0, b0, w1, g1, b1)
    got_v = fused_loss(*args)
    want_v = oracle_loss(*args)
    np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-5)

    got_g = jax.grad(fused_loss, argnums=tuple(range(6)))(*args)
    want_g = jax.grad(oracle_loss, argnums=tuple(range(6)))(*args)
    names = ["de", "dgamma0", "dbeta0", "dW1", "dgamma1", "dbeta1"]
    for nm, gg, wg in zip(names, got_g, want_g):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(wg),
                                   atol=2e-4, rtol=2e-4, err_msg=nm)


@pytest.mark.slow
def test_eval_grads_treat_stats_constant(rng):
    e, g0, b0, w1, g1, b1 = _inputs(rng, b=1, n=16, k=3, c=16)
    c = e.shape[-1]
    m0 = jnp.zeros(c); v0 = jnp.ones(c)
    m1 = jnp.zeros(c); v1 = jnp.ones(c)

    def fused_loss(e_):
        return jnp.sum(fused_edge.fused_edge_tail(
            e_, g0, b0, w1, g1, b1, m0, v0, m1, v1, False) ** 2)

    def oracle_loss(e_):
        return jnp.sum(_oracle(e_, g0, b0, w1, g1, b1, m0, v0, m1, v1) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(fused_loss)(e)),
                               np.asarray(jax.grad(oracle_loss)(e)),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_edgeconv_module_fused_matches_unfused(rng):
    """Same params, same outputs + grads through the flax EdgeConv module
    in both paths (fused runs in interpret mode on CPU); the parameter
    trees are identical so checkpoints interchange."""
    from r3dfsseg_tpu.nn.dgcnn import EdgeConv

    x = jnp.asarray(rng.normal(size=(3, 32, 8)).astype(np.float32))
    kw = dict(widths=(16, 16), k=4, knn_impl="xla")
    mod_f = EdgeConv(fuse_edge="on", **kw)
    mod_u = EdgeConv(fuse_edge="off", **kw)

    vars_u = mod_u.init(jax.random.PRNGKey(0), x, train=False)
    vars_f = mod_f.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree.structure(vars_u) == jax.tree.structure(vars_f))
    for lu, lf in zip(jax.tree.leaves(vars_u), jax.tree.leaves(vars_f)):
        assert lu.shape == lf.shape
    # drive both with the SAME variables
    variables = vars_u

    # eval forward
    yu = mod_u.apply(variables, x, train=False)
    yf = mod_f.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yu),
                               atol=1e-5, rtol=1e-5)

    # train forward + batch-stats update + gradient
    def loss(m, v, xx):
        out, mut = m.apply(v, xx, train=True, mutable=["batch_stats"])
        w = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape)
        return jnp.sum(out * w), mut["batch_stats"]

    (lu, bsu), gu = jax.value_and_grad(
        lambda p: loss(mod_u, {"params": p,
                               "batch_stats": variables["batch_stats"]}, x),
        has_aux=True)(variables["params"])
    (lf, bsf), gf = jax.value_and_grad(
        lambda p: loss(mod_f, {"params": p,
                               "batch_stats": variables["batch_stats"]}, x),
        has_aux=True)(variables["params"])
    np.testing.assert_allclose(float(lf), float(lu), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)
    for a, b in zip(jax.tree.leaves(bsf), jax.tree.leaves(bsu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)
