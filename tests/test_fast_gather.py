"""Fast gather: forward exactness + backward correctness (exact path on
CPU; the bf16 Pallas backward is TPU-only and exercised by bench runs)."""
import numpy as np
import jax
import jax.numpy as jnp

from r3dfsseg_tpu.ops.fast_gather import gather_neighbors_fast, _scatter_exact
from r3dfsseg_tpu.ops.knn import gather_neighbors


def test_fast_gather_forward_exact(rng):
    x = jnp.asarray(rng.normal(size=(3, 32, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 32, size=(3, 32, 5)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(gather_neighbors_fast(x, idx)),
        np.asarray(gather_neighbors(x, idx)))


def test_fast_gather_grad_matches(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 4)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 16, size=(2, 16, 3)).astype(np.int32))

    def loss_fast(a):
        return jnp.sum(jnp.sin(gather_neighbors_fast(a, idx)))

    def loss_ref(a):
        return jnp.sum(jnp.sin(gather_neighbors(a, idx)))

    gf = np.asarray(jax.grad(loss_fast)(x))
    gr = np.asarray(jax.grad(loss_ref)(x))
    np.testing.assert_allclose(gf, gr, rtol=1e-5, atol=1e-6)


def test_scatter_exact_oracle(rng):
    g = rng.normal(size=(2, 8, 3, 4)).astype(np.float32)
    idx = rng.integers(0, 8, size=(2, 8, 3)).astype(np.int32)
    got = np.asarray(_scatter_exact(jnp.asarray(g), jnp.asarray(idx), 8))
    want = np.zeros((2, 8, 4), np.float32)
    for b in range(2):
        for n in range(8):
            for k in range(3):
                want[b, idx[b, n, k]] += g[b, n, k]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_onehot_take_matches_flat_take(rng):
    """The TPU-default one-hot-einsum forward is elementwise exact vs the
    flat take (every one-hot product is 0 or 1 x value), in f32 and bf16."""
    from r3dfsseg_tpu.ops.fast_gather import _flat_take, _onehot_take
    for dt in (np.float32, jnp.bfloat16):
        x = jnp.asarray(rng.normal(size=(3, 32, 8))).astype(dt)
        idx = jnp.asarray(rng.integers(0, 32, size=(3, 16, 5)).astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(_onehot_take(x, idx).astype(np.float32)),
            np.asarray(_flat_take(x, idx).astype(np.float32)))
