#!/usr/bin/env python
"""Isolate the in-kernel matvec cost for the cheby kernel design space."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 4480
ITERS = 500


def timeit(f, s, b, chain=3):
    def run():
        z = b
        for _ in range(chain):
            z = f(s, z)
        float(z[0, 0])
    run()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return min(ts) / chain


def make_matmul_only(ncols, tile_rows=None):
    def kernel(s_ref, b_ref, out_ref, acc):
        def body(i, _):
            if tile_rows is None:
                sd = jnp.dot(s_ref[:], acc[:].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            else:
                db = acc[:].astype(jnp.bfloat16)
                parts = []
                for r0 in range(0, M, tile_rows):
                    parts.append(jnp.dot(s_ref[r0:r0 + tile_rows, :], db,
                                         preferred_element_type=jnp.float32))
                sd = jnp.concatenate(parts, axis=0)
            acc[:] = sd * 0.99
            return 0
        acc[:] = b_ref[:]
        jax.lax.fori_loop(0, ITERS, body, 0)
        out_ref[:] = acc[:]

    def run(s, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, ncols), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((M, ncols), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(s, b)
    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.random((M, M), dtype=np.float32), jnp.bfloat16)
    for ncols in (8, 128):
        b = jnp.ones((M, ncols), jnp.float32)
        for tr in (None, 512, 1120, 2240):
            try:
                f = make_matmul_only(ncols, tr)
                t = timeit(f, s, b)
                print(f"ncols={ncols:3d} tile_rows={tr}: "
                      f"{t/ITERS*1e6:7.1f} us/matvec")
            except Exception as e:
                print(f"ncols={ncols:3d} tile_rows={tr}: FAIL {str(e)[:80]}")

    # XLA reference: same matvec via einsum, S resident via donate? plain
    def xla_loop(s_, b_):
        def body(i, z):
            return 0.99 * jnp.einsum("nm,mc->nc", s_, z.astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, b_)
    for ncols in (8, 128):
        b = jnp.ones((M, ncols), jnp.float32)
        f = jax.jit(xla_loop)
        t = timeit(f, s, b)
        print(f"XLA ncols={ncols:3d}: {t/ITERS*1e6:7.1f} us/matvec")


if __name__ == "__main__":
    main()
