"""Pallas fused kNN kernel vs the exact XLA path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
from r3dfsseg_tpu.ops.knn import knn_indices


def _pallas_interpret(x, k, tile_n, exact=False):
    import functools
    from jax.experimental import pallas as pl
    from r3dfsseg_tpu.ops import pallas_knn as pk

    b, n, c = x.shape
    grid = (b, n // tile_n)
    return pl.pallas_call(
        functools.partial(pk._knn_kernel, k=k, n_keys=n, exact=exact),
        out_shape=jax.ShapeDtypeStruct((b, n, k), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, k), lambda i, j: (i, j, 0)),
        interpret=True,
    )(x, x)


def test_pallas_knn_matches_exact(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 8)).astype(np.float32))
    want = np.asarray(knn_indices(x, 5))
    got = np.asarray(_pallas_interpret(x, 5, tile_n=32))
    # same neighbour sets; order may differ only on exact distance ties
    for b in range(2):
        for i in range(64):
            assert set(got[b, i].tolist()) == set(want[b, i].tolist()), (b, i)
    # self always included first (distance 0)
    np.testing.assert_array_equal(got[:, :, 0],
                                  np.tile(np.arange(64), (2, 1)))


def test_pallas_knn_exact_bit_matches_xla(rng):
    """The exact=True (parity) kernel returns EXACTLY knn_indices' output
    — same indices in the same order, including duplicated points whose
    distances tie bit-for-bit (lowest index first)."""
    x = rng.normal(size=(2, 64, 8)).astype(np.float32)
    x[0, 11] = x[0, 40]           # exact duplicate -> distance ties
    x[1, 3] = x[1, 5] = x[1, 57]  # triple
    jx = jnp.asarray(x)
    want = np.asarray(knn_indices(jx, 5))
    got = np.asarray(_pallas_interpret(jx, 5, tile_n=32, exact=True))
    np.testing.assert_array_equal(got, want)


def test_kth_smallest_pallas_matches_xla_loop():
    """One-pass VMEM bisection (ops/pallas_kth.py, interpret mode) vs the
    16/32-pass XLA loop: identical fixed point up to the per-row-vs-global
    starting bracket, so both must admit >= k neighbours and agree with the
    exact k-th distance to bisection resolution."""
    import jax.numpy as jnp
    from r3dfsseg_tpu.ops.lp import _BIG, _kth_smallest_per_row
    from r3dfsseg_tpu.ops.pallas_kth import kth_smallest_per_row_pallas

    rng = np.random.default_rng(5)
    n, k = 96, 7
    d = rng.uniform(0.1, 9.0, size=(n, n)).astype(np.float32)
    d[np.arange(n), np.arange(n)] = _BIG          # self-exclusion sentinel
    d[:, -4:] = _BIG                              # invalid columns

    for dt in (jnp.float32, jnp.bfloat16):
        dd = jnp.asarray(d, dt)
        got = np.asarray(kth_smallest_per_row_pallas(
            dd, k, iters=32, tile_n=32, interpret=True))[:, 0]
        ref = np.asarray(_kth_smallest_per_row(dd, k, iters=32))[:, 0]
        exact = np.sort(d, axis=1)[:, k - 1]
        # both bisections bracket the exact k-th distance from above
        assert (got >= exact - 1e-2).all() and (ref >= exact - 1e-2).all()
        # >= k neighbours must survive at the radius, in the dtype the
        # membership pass actually compares in (ops/lp.py:157)
        d_cmp = np.asarray(dd, np.float32)
        counts = (d_cmp <= got[:, None]).sum(1)
        assert (counts >= k).all(), "radius admits fewer than k neighbours"
        tol = 0.05 if dt == jnp.bfloat16 else 1e-3
        np.testing.assert_allclose(got, exact, rtol=tol, atol=tol)
        np.testing.assert_allclose(ref, exact, rtol=tol, atol=tol)
