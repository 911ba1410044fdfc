"""Fast neighbour gather with a Pallas scatter-add backward.

Honest measurements at the EdgeConv shape (56 clouds x 2048 pts x k=20 x
64 ch on v5e, non-trivial cotangent):

  * XLA batched gather fwd:            27.8 ms
  * XLA flattened single-table take:   18.7 ms   <- forward here
  * XLA scatter-add backward:          44.5 ms
  * Pallas one-hot scatter (bf16 g):   18.3 ms   <- backward here

The backward builds a (TILE, N) one-hot mask per tile and lets the MXU do
the transpose-scatter as `onehot^T @ g`, accumulating across tiles into the
VMEM-resident output block.  Gradients pass through one bf16 matmul pass
(~0.2% relative error — mixed-precision-training grade); set
`exact_grad_gather=True` on `R3DConfig` (plumbed through FeatureExtractor ->
DGCNN -> EdgeConv) for an exact (slower) segment-sum backward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _flat_take(x: Array, idx: Array) -> Array:
    """Forward: single-table take (1.5x faster than XLA's batched gather)."""
    b, n, c = x.shape
    _, nq, k = idx.shape
    off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    flat = (idx + off).reshape(-1)
    return jnp.take(x.reshape(b * n, c), flat, axis=0,
                    unique_indices=False).reshape(b, nq, k, c)


def _scatter_kernel(idx_ref, g_ref, out_ref, *, n_keys: int):
    j = pl.program_id(1)
    ids = idx_ref[0]                                          # (TM, 1)
    g = g_ref[0]                                              # (TM, C) f32|bf16
    col = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], n_keys), 1)
    oh = (col == ids).astype(jnp.bfloat16)                    # (TM, N)
    contrib = jax.lax.dot_general(
        oh, g.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),           # oh^T @ g
        preferred_element_type=jnp.float32)                   # (N, C)

    @pl.when(j == 0)
    def _():
        out_ref[0] = contrib

    @pl.when(j != 0)
    def _():
        out_ref[0] = out_ref[0] + contrib


def scatter_add_pallas(g: Array, idx: Array, n: int) -> Array:
    """dx[b, j] += g[b, n, k] where idx[b, n, k] == j  (bf16 matmul pass).

    The cotangent is read at its incoming width — in bf16 mode upstream
    already produces bf16, and upcasting before the kernel would double
    the HBM read of the (B, N, K, C) edge-gradient tensor."""
    b, nq, k, c = g.shape
    m = nq * k
    tm = 2048
    while m % tm:
        tm //= 2
    flat = idx.reshape(b, m, 1)
    if g.dtype not in (jnp.float32, jnp.bfloat16):
        g = g.astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_scatter_kernel, n_keys=n),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        grid=(b, m // tm),
        in_specs=[
            pl.BlockSpec((1, tm, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(flat, g.reshape(b, m, c))


def _gather_kernel(idx_ref, tbl_ref, out_ref):
    ids = idx_ref[0]                                          # (TM, 1)
    tbl = tbl_ref[0]                                          # (N, C)
    col = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], tbl.shape[0]), 1)
    oh = (col == ids).astype(tbl.dtype)                       # (TM, N)
    out_ref[0] = jax.lax.dot_general(
        oh, tbl,
        dimension_numbers=(((1,), (0,)), ((), ())),           # oh @ tbl
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def gather_onehot_pallas(x: Array, idx: Array) -> Array:
    """Row gather as a one-hot MXU matmul (mirror of the scatter backward).

    out[b, i, k] = x[b, idx[b, i, k]] — each one-hot row has exactly one 1,
    so every output element is a single product 1.0 * x[j, c]: EXACT in
    bf16.  Kept for the record as a measured negative result (round 3,
    v5e, 12x2048x20x64): 4.52 ms vs 4.39 ms for the XLA flat take — the
    VPU-side one-hot build + 8 MB VMEM tile traffic eats the MXU win —
    and in f32 it is INEXACT (Mosaic's fp32 contract precision rounds
    through bf16 passes even with one-hot factors).  Not used.
    """
    b, n, c = x.shape
    _, nq, k = idx.shape
    m = nq * k
    # keep the (TM, N) one-hot tile under ~8 MB of VMEM
    tm = 2048 if x.dtype == jnp.bfloat16 else 512
    while m % tm:
        tm //= 2
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((b, m, c), x.dtype),
        grid=(b, m // tm),
        in_specs=[
            pl.BlockSpec((1, tm, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )(idx.reshape(b, m, 1), x).reshape(b, nq, k, c)


def _onehot_take(x: Array, idx: Array) -> Array:
    """Gather as an XLA one-hot einsum: XLA fuses the one-hot generation
    into the dot (no (B, M, N) materialisation), and the MXU does the row
    selection.  Exact in bf16 (every product is 0 or 1 x value; verified
    elementwise vs flat take).  Measured 3.88 ms vs 4.39 ms flat take at
    12x2048x20x64 on v5e — and unlike the scalar-core gather it runs on
    the MXU, so it overlaps with the VPU/scalar work around it."""
    b, n, c = x.shape
    # 4-D dot (no post-einsum reshape): layout assignment hands the
    # (B, NQ, K, C) result straight to the consumer conv — the 2-D
    # `bmn,bnc->bmc` + reshape form paid ~470 us/layer of reshape +
    # relayout copies after the dot (trace round 5; step A/B 25.7 vs
    # 23.2 ms).  Exact either way: every output element is one product.
    oh = jax.nn.one_hot(idx, n, dtype=x.dtype)                # (B, NQ, K, N)
    return jnp.einsum("bikn,bnc->bikc", oh, x)


def _take_fwd_impl(x: Array, idx: Array) -> Array:
    # Measured (round 3, v5e, 12x2048x20x64): XLA flat take 4.39 ms,
    # hand-written one-hot Pallas kernel 4.52 ms (negative result — see
    # gather_onehot_pallas), XLA one-hot einsum 3.88 ms (bf16, exact).
    # f32 keeps the flat take: the MXU's fp32 x3-decomposition rounds
    # through bf16 passes, so the einsum is inexact there.
    # At the round-3 31.6-ms step the two were step-level neutral (the
    # scalar-core gather overlapped MXU work); at the round-4 28-ms step
    # the gather IS the critical path — trace: 0.71 ms/take x3 plus
    # ~0.75 ms/block of layout copies around the flat take's 2-D reshape —
    # and the einsum wins the step A/B 28.0 vs 30.8 ms.  Default is now
    # onehot on TPU+bf16; R3D_GATHER_IMPL=flat restores the take.
    import os
    if (jax.default_backend() == "tpu" and x.dtype == jnp.bfloat16
            and os.environ.get("R3D_GATHER_IMPL", "onehot") == "onehot"):
        return _onehot_take(x, idx)
    return _flat_take(x, idx)


def _scatter_exact(g: Array, idx: Array, n: int) -> Array:
    b, nq, k, c = g.shape
    off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    flat = (idx + off).reshape(-1)
    return jax.ops.segment_sum(
        g.reshape(-1, c), flat, num_segments=b * n).reshape(b, n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_neighbors_fast(x: Array, idx: Array, exact_grad: bool = False
                          ) -> Array:
    """Drop-in for `gather_neighbors` with the fast fwd/bwd pair above.
    Falls back to exact XLA paths off-TPU."""
    return _take_fwd_impl(x, idx)


def _fwd(x, idx, exact_grad):
    token = jnp.zeros((x.shape[1], 0), x.dtype)
    return _take_fwd_impl(x, idx), (idx, token)


def _scatter_onehot_einsum(g: Array, idx: Array, n: int) -> Array:
    """Scatter-add as an XLA one-hot einsum.  Same bf16-products/f32-accum
    quality as the Pallas kernel, but XLA fuses the one-hot generation AND
    the cotangent producer into the dot — no forced layout copies around a
    custom call (the Pallas path costs ~1.0 ms/block of pure data
    formatting: the cotangent arrives in the BN backward's {1,3,2,0}
    layout and custom calls demand the default layout)."""
    oh = jax.nn.one_hot(idx, n, dtype=g.dtype)        # (B, NQ, K, N) fused
    return jnp.einsum("bnkm,bnkc->bmc", oh, g,
                      preferred_element_type=jnp.float32)


def _bwd(exact_grad, res, g):
    idx, token = res
    n = token.shape[0]
    if exact_grad or jax.default_backend() != "tpu":
        dx = _scatter_exact(g, idx, n)
    elif g.dtype == jnp.bfloat16:
        dx = _scatter_onehot_einsum(g, idx, n)
    else:
        dx = scatter_add_pallas(g, idx, n)
    return dx.astype(token.dtype), None


gather_neighbors_fast.defvjp(_fwd, _bwd)
