#!/usr/bin/env python
"""Microbench: XLA gather formulations at the EdgeConv shape
(12 x 2048 x 20 x 64).  Hunting for anything faster than ~10 ns/row."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from r3dfsseg_tpu.ops.fast_gather import _flat_take, gather_onehot_pallas

    rng = np.random.default_rng(0)
    b, n, c, k = 12, 2048, 64, 20
    idx = jnp.asarray(rng.integers(0, n, size=(b, n, k)), jnp.int32)
    K = 10

    def timeit(name, fn, x0, check=None):
        @jax.jit
        def chained(x):
            acc = 0.0
            xx = x
            for _ in range(K):
                g = fn(xx, idx)
                acc = acc + jnp.sum(g.astype(jnp.float32))
                xx = x * (1.0 + 1e-20 * acc).astype(x.dtype)
            return acc
        try:
            float(chained(x0))
        except Exception as e:
            print(f"{name:44s} FAILED {type(e).__name__}", flush=True)
            return
        t0 = time.perf_counter()
        for _ in range(3):
            float(chained(x0))
        dt = (time.perf_counter() - t0) / (3 * K)
        ok = ""
        if check is not None:
            got = fn(x0, idx)
            ok = "  exact" if bool(jnp.all(check == got)) else "  INEXACT"
        print(f"{name:44s} {dt*1e3:8.2f} ms{ok}", flush=True)

    def v_take_along(x, idx):
        # (B, N, K) -> (B, N*K, C) batched take_along_axis
        bb, nn, cc = x.shape
        flat = idx.reshape(bb, -1, 1)
        return jnp.take_along_axis(
            x, jnp.broadcast_to(flat, (bb, flat.shape[1], cc)), axis=1
        ).reshape(bb, nn, k, cc)

    def onehot_einsum(x, idx):
        oh = jax.nn.one_hot(idx.reshape(b, -1), n, dtype=x.dtype)
        return jnp.einsum("bmn,bnc->bmc", oh, x).reshape(b, n, k, c)

    def col_gather(x, idx):
        # transpose table to (B, C, N), gather along lanes
        xt = jnp.swapaxes(x, 1, 2)                    # (B, C, N)
        g = jnp.take_along_axis(
            xt[:, :, None, :],
            jnp.broadcast_to(idx.reshape(b, 1, 1, -1), (b, c, 1, n * k)),
            axis=3)
        return jnp.moveaxis(g.reshape(b, c, n, k), 1, 3)

    def sorted_take(x, idx):
        flat = idx.reshape(b, -1)
        order = jnp.argsort(flat, axis=1)
        sorted_idx = jnp.take_along_axis(flat, order, axis=1)
        g = jnp.take_along_axis(
            x, sorted_idx[..., None].repeat(1, axis=-1), axis=1)
        inv = jnp.argsort(order, axis=1)
        g = jnp.take_along_axis(g, inv[..., None], axis=1)
        return g.reshape(b, n, k, c)

    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        tbl = jnp.asarray(rng.normal(size=(b, n, c)), dt)
        ref = _flat_take(tbl, idx)
        timeit(f"flat_take ({dt_name})", _flat_take, tbl)
        timeit(f"take_along_axis ({dt_name})", v_take_along, tbl, check=ref)
        timeit(f"onehot einsum XLA ({dt_name})", onehot_einsum, tbl,
               check=ref if dt == jnp.bfloat16 else None)
        timeit(f"column-gather ({dt_name})", col_gather, tbl, check=ref)


if __name__ == "__main__":
    main()
