"""Pallas fused kNN kernel vs the exact XLA path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
from r3dfsseg_tpu.ops.knn import knn_indices


def _pallas_interpret(x, k, tile_n):
    import functools
    from jax.experimental import pallas as pl
    from r3dfsseg_tpu.ops import pallas_knn as pk

    b, n, c = x.shape
    grid = (b, n // tile_n)
    return pl.pallas_call(
        functools.partial(pk._knn_kernel, k=k, n_keys=n),
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
