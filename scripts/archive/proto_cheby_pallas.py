#!/usr/bin/env python
"""Prototype: VMEM-resident multi-iteration Chebyshev LP solve kernel.

Compares against the XLA fori_loop path (ops/lp.py:_chebyshev) on the
real problem shape (m=4396 nodes, 3 classes, alpha=0.99, 50 fwd iters).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cheby_kernel(s_ref, b_ref, out_ref, x_s, r_s, d_s, *,
                  alpha: float, iters: int):
    lmin, lmax = 1.0 - alpha, 1.0 + alpha
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta

    r_s[:] = b_ref[:]
    d_s[:] = r_s[:] * (1.0 / theta)
    x_s[:] = d_s[:]

    def body(i, rho):
        sd = jnp.dot(s_ref[:], d_s[:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        md = d_s[:] - alpha * sd
        r_s[:] = r_s[:] - md
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        d_s[:] = (rho_new * rho) * d_s[:] + (2.0 * rho_new / delta) * r_s[:]
        x_s[:] = x_s[:] + d_s[:]
        return rho_new

    jax.lax.fori_loop(0, iters - 1, body, 1.0 / sigma1)
    out_ref[:] = x_s[:]


def cheby_pallas(s_bf16, b, alpha: float, iters: int, ncols: int = 128):
    m = s_bf16.shape[0]
    mp = ((m + 255) // 256) * 256
    sp = jnp.zeros((mp, mp), jnp.bfloat16).at[:m, :m].set(s_bf16)
    bp = jnp.zeros((mp, ncols), jnp.float32).at[:m, :b.shape[1]].set(b)
    out = pl.pallas_call(
        functools.partial(_cheby_kernel, alpha=alpha, iters=iters),
        out_shape=jax.ShapeDtypeStruct((mp, ncols), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((mp, ncols), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(sp, bp)
    return out[:m, :b.shape[1]]


def _chebyshev_xla(s_bf16, b, alpha, iters):
    theta = 0.5 * 2.0
    delta = 0.5 * 2.0 * alpha
    theta = 0.5 * ((1 + alpha) + (1 - alpha))
    delta = 0.5 * ((1 + alpha) - (1 - alpha))
    sigma1 = theta / delta

    def matvec(z):
        sz = jnp.einsum("nm,mc->nc", s_bf16, z,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        return z - alpha * sz

    x = jnp.zeros_like(b)
    r = b
    d = r / theta
    x = x + d
    rho = 1.0 / sigma1

    def body(_, carry):
        x, r, d, rho = carry
        r = r - matvec(d)
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * r
        x = x + d
        return x, r, d, rho_new

    x, _, _, _ = jax.lax.fori_loop(0, iters - 1, body, (x, r, d, rho))
    return x


def main():
    m, ncls, alpha, iters = 4396, 3, 0.99, 50
    rng = np.random.default_rng(0)
    a = rng.random((m, m), dtype=np.float32)
    a = (a + a.T) * 0.5
    deg = a.sum(1)
    s = a / np.sqrt(np.outer(deg, deg))
    s_bf16 = jnp.asarray(s, jnp.bfloat16)
    b = jnp.zeros((m, ncls), jnp.float32).at[:200, 0].set(1.0)

    f_pl = jax.jit(lambda s_, b_: cheby_pallas(s_, b_, alpha, iters))
    f_xla = jax.jit(lambda s_, b_: _chebyshev_xla(s_, b_, alpha, iters))

    zp = f_pl(s_bf16, b)
    zx = f_xla(s_bf16, b)
    err = float(jnp.max(jnp.abs(zp - zx)) / (jnp.max(jnp.abs(zx)) + 1e-30))
    print("rel max err pallas vs xla:", err)

    for name, f in (("pallas", f_pl), ("xla", f_xla)):
        def chain():
            z = b
            for _ in range(10):
                z = f(s_bf16, z)
            z.block_until_ready()
        chain()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            chain()
            ts.append((time.perf_counter() - t0) / 10)
        print(f"{name}: {min(ts)*1e3:.3f} ms/solve "
              f"({min(ts)/iters*1e6:.1f} us/iter)")


if __name__ == "__main__":
    main()
