"""Pallas one-pass per-row k-th-distance kernel for the threshold affinity.

The XLA `_kth_smallest_per_row` bisection (ops/lp.py) re-reads the full
(N, N) distance matrix from HBM on every one of its 16 value-space steps
— ~1.0 ms/step at the MPTI graph size (4396^2 bf16 = 38 MB x 16 passes).
This kernel tiles rows through VMEM once and runs the complete bisection
on the resident tile: 16 HBM passes collapse to one.

Semantics vs the XLA path: identical fixed-point bisection on `d <= mid`
counts with the upward-biased `hi` result, except the starting bracket is
the PER-ROW maximum finite distance instead of the global one — both are
valid upper bounds for the row's k-th distance, so the result differs
only in which exact-resolution ties at the radius are admitted (the
threshold impl already admits >= k tied neighbours by contract,
ops/lp.py:58-63).  The CPU/parity paths keep the XLA loop; this kernel is
TPU-only.  Design-point accuracy is gated by the sigma-0 convergence A/B
(BASELINE.md).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BIG = 1e30  # must match ops/lp.py sentinel


def _kth_kernel(d_ref, out_ref, *, k: int, iters: int, n_keys: int):
    d = d_ref[0].astype(jnp.float32)                     # (T, N_pad)
    # mask pad lanes (grid overshoot on the lane dim) and sentinel entries
    col_ok = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) < n_keys
    finite = col_ok & (d < 0.5 * _BIG)
    hi = jnp.max(jnp.where(finite, d, 0.0), axis=1, keepdims=True)
    hi = jnp.maximum(hi, 1e-6)
    lo = jnp.zeros_like(hi)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(jnp.where(col_ok & (d <= mid), 1.0, 0.0),
                      axis=1, keepdims=True)
        ge = cnt >= k
        return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

    _, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    out_ref[0] = hi


@functools.partial(jax.jit,
                   static_argnames=("k", "iters", "tile_n", "interpret"))
def kth_smallest_per_row_pallas(d: Array, k: int, iters: int = 16,
                                *, tile_n: int | None = None,
                                interpret: bool = False) -> Array:
    """d: (N, N) distances (f32 or bf16; >= 0 with _BIG sentinel entries)
    -> (N, 1) f32 upward-biased per-row k-th smallest value."""
    n, m = d.shape
    if tile_n is None:
        # scoped-VMEM model (16 MiB limit), calibrated against Mosaic's
        # reported scoped sizes at m=8492: two double-buffered input
        # blocks (2*itemsize bytes/elt) plus ONE full-tile f32 working
        # copy (the astype at _kth_kernel:34 for bf16; the masked-where
        # temp for f32) — observed 240*8492*(2*2+4)=16.07M bf16 and
        # 200*8492*(2*4+4)=20.39M f32, matching this model exactly.
        # Budget 13 MiB leaves headroom for out/carry temps.  256 rows at
        # the episode graph widths (<=4396), shrinking for scene-scale
        # graphs (predict_scene: m = 300 + P can reach 20k+).
        itemsize = d.dtype.itemsize
        per_row = m * (2 * itemsize + 4)
        tile_n = min(256, (13 * 1024 * 1024) // max(per_row, 1))
        tile_n = max(8, (tile_n // 8) * 8)
    grid = (pl.cdiv(n, tile_n),)
    return pl.pallas_call(
        functools.partial(_kth_kernel, k=k, iters=iters, n_keys=m),
        out_shape=jax.ShapeDtypeStruct((1, n, 1), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile_n, m), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_n, 1), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(d[None])[0]


__all__ = ["kth_smallest_per_row_pallas"]
