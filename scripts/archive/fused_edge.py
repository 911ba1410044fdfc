"""Fused EdgeConv tail: BN0 -> leaky -> W1 matmul -> BN1 -> leaky -> max.

The (B, N, K, C) edge tensor is the encoder's HBM wall: the unfused path
materialises it ~7 times per block (BN stats, normalise, matmul in/out,
second BN, max) — ablation attributes ~14 ms/step of 40 to it.  These
kernels read the raw edge tensor `e_raw = gather(a, idx) + b` (produced
once by XLA) and keep every intermediate in VMEM:

  forward:  1 stats pass (train only, for BN1's batch statistics of the
            matmul output) + 1 compute pass -> pooled (B, N, C)
  backward: 3 passes (BN backward needs two rounds of channel reductions
            finalised between passes), each recomputing the forward chain
            from e_raw in VMEM -> d_e_raw + all parameter grads

BN semantics match torch/flax exactly (eps 1e-5, batch statistics over
(B, N, K) in train, running statistics in eval); the train backward is the
full batch-norm gradient (statistics are functions of the input).  Ties in
the max route to the lowest k, like XLA's reduce-max gradient.

Available behind `fuse_edge='on'` on `nn.dgcnn.EdgeConv`.  Measured on
v5e the fused path LOSES to XLA's own bf16 fusion (DESIGN.md), so 'auto'
resolves to the unfused flax modules; the kernels stay as a verified
alternative.  CPU tests run them in interpret mode against the unfused
path (values and grads).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

_INTERPRET = False   # set by CPU tests
_NEG_SLOPE = 0.2
_EPS = 1e-5


def _leaky(x):
    return jnp.where(x > 0, x, _NEG_SLOPE * x)


def _dleaky(x):
    return jnp.where(x > 0, 1.0, _NEG_SLOPE)


def _tile_n(n: int, want: int = 256) -> int:
    t = min(want, n)
    while n % t:
        t //= 2
    if t < 8:
        # silent tail-dropping would corrupt stats and gradients; the fused
        # path requires a tileable point count
        raise ValueError(
            f"fuse_edge='on' needs the point count ({n}) divisible by 8")
    return t


# ---------------------------------------------------------------- forward
def _stats1_kernel(e_ref, aff0_ref, sh0_ref, w1_ref, s1_ref, s2_ref):
    """Accumulate per-channel sum / sum-of-squares of l1 = leaky(bn0) @ W1."""
    i, j = pl.program_id(0), pl.program_id(1)
    e = e_ref[0].astype(jnp.float32)                    # (T, K, C)
    t, k, c = e.shape
    h0 = _leaky(e * aff0_ref[0] + sh0_ref[0])
    l1 = jax.lax.dot_general(
        h0.reshape(t * k, c), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (T*K, C)
    s1 = jnp.sum(l1, axis=0, keepdims=True)
    s2 = jnp.sum(l1 * l1, axis=0, keepdims=True)

    @pl.when((i == 0) & (j == 0))
    def _():
        s1_ref[...] = s1
        s2_ref[...] = s2

    @pl.when((i != 0) | (j != 0))
    def _():
        s1_ref[...] = s1_ref[...] + s1
        s2_ref[...] = s2_ref[...] + s2


def _fwd_kernel(e_ref, aff0_ref, sh0_ref, aff1_ref, sh1_ref, w1_ref, out_ref):
    e = e_ref[0].astype(jnp.float32)                    # (T, K, C)
    t, k, c = e.shape
    h0 = _leaky(e * aff0_ref[0] + sh0_ref[0])
    l1 = jax.lax.dot_general(
        h0.reshape(t * k, c), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h1 = _leaky(l1 * aff1_ref[0] + sh1_ref[0]).reshape(t, k, c)
    out_ref[0] = jnp.max(h1, axis=1)


# ---------------------------------------------------------------- backward
def _recompute(e, aff0, sh0, w1, aff1, sh1):
    """Shared forward recomputation inside backward kernels."""
    t, k, c = e.shape
    z0 = e * aff0 + sh0
    h0 = _leaky(z0)
    l1 = jax.lax.dot_general(
        h0.reshape(t * k, c), w1,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(t, k, c)
    z1 = l1 * aff1 + sh1
    h1 = _leaky(z1)
    return z0, h0, l1, z1, h1


def _route_dz1(e, dout, aff0, sh0, w1, aff1, sh1):
    """dz1 = d(pre-leaky BN1 output): route dout through max (lowest-k tie
    break) and leaky'."""
    t, k, c = e.shape
    z0, h0, l1, z1, h1 = _recompute(e, aff0, sh0, w1, aff1, sh1)
    rowmax = jnp.max(h1, axis=1, keepdims=True)         # (T, 1, C)
    kio = jax.lax.broadcasted_iota(jnp.int32, (t, k, c), 1)
    kstar = jnp.min(jnp.where(h1 >= rowmax, kio, k), axis=1, keepdims=True)
    mask = (kio == kstar).astype(jnp.float32)
    dh1 = dout[:, None, :] * mask                       # (T, K, C)
    return z0, h0, l1, dh1 * _dleaky(z1)


def _bwd1_kernel(e_ref, dout_ref, aff0_ref, sh0_ref, aff1_ref, sh1_ref,
                 inv1_ref, mu1_ref, w1_ref, r1_ref, r2_ref):
    """Accumulate r1 = sum dz1 (= dbeta1), r2 = sum dz1 * x_hat1 (= dgamma1)."""
    i, j = pl.program_id(0), pl.program_id(1)
    e = e_ref[0].astype(jnp.float32)
    dout = dout_ref[0].astype(jnp.float32)
    _, _, l1, dz1 = _route_dz1(e, dout, aff0_ref[0], sh0_ref[0], w1_ref[...],
                               aff1_ref[0], sh1_ref[0])
    xhat1 = (l1 - mu1_ref[0]) * inv1_ref[0]
    r1 = jnp.sum(dz1, axis=(0, 1))[None]
    r2 = jnp.sum(dz1 * xhat1, axis=(0, 1))[None]

    @pl.when((i == 0) & (j == 0))
    def _():
        r1_ref[...] = r1
        r2_ref[...] = r2

    @pl.when((i != 0) | (j != 0))
    def _():
        r1_ref[...] = r1_ref[...] + r1
        r2_ref[...] = r2_ref[...] + r2


def _bwd2_kernel(e_ref, dout_ref, aff0_ref, sh0_ref, aff1_ref, sh1_ref,
                 inv1_ref, mu1_ref, g1inv_ref, mr1_ref, mr2_ref,
                 inv0_ref, mu0_ref, w1_ref,
                 dw1_ref, q1_ref, q2_ref):
    """With BN1-backward means finalised: accumulate dW1 and the BN0
    reduction terms q1 = sum dz0, q2 = sum dz0 * x_hat0."""
    i, j = pl.program_id(0), pl.program_id(1)
    e = e_ref[0].astype(jnp.float32)
    dout = dout_ref[0].astype(jnp.float32)
    t, k, c = e.shape
    z0, h0, l1, dz1 = _route_dz1(e, dout, aff0_ref[0], sh0_ref[0],
                                 w1_ref[...], aff1_ref[0], sh1_ref[0])
    xhat1 = (l1 - mu1_ref[0]) * inv1_ref[0]
    dl1 = g1inv_ref[0] * (dz1 - mr1_ref[0] - xhat1 * mr2_ref[0])  # (T,K,C)
    dw1 = jax.lax.dot_general(                          # h0^T @ dl1: (C, C)
        h0.reshape(t * k, c), dl1.reshape(t * k, c),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh0 = jax.lax.dot_general(                          # dl1 @ W1^T
        dl1.reshape(t * k, c), w1_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(t, k, c)
    dz0 = dh0 * _dleaky(z0)
    xhat0 = (e - mu0_ref[0]) * inv0_ref[0]
    q1 = jnp.sum(dz0, axis=(0, 1))[None]
    q2 = jnp.sum(dz0 * xhat0, axis=(0, 1))[None]

    @pl.when((i == 0) & (j == 0))
    def _():
        dw1_ref[...] = dw1
        q1_ref[...] = q1
        q2_ref[...] = q2

    @pl.when((i != 0) | (j != 0))
    def _():
        dw1_ref[...] = dw1_ref[...] + dw1
        q1_ref[...] = q1_ref[...] + q1
        q2_ref[...] = q2_ref[...] + q2


def _bwd3_kernel(e_ref, dout_ref, aff0_ref, sh0_ref, aff1_ref, sh1_ref,
                 inv1_ref, mu1_ref, g1inv_ref, mr1_ref, mr2_ref,
                 inv0_ref, mu0_ref, g0inv_ref, mq1_ref, mq2_ref, w1_ref,
                 de_ref):
    """With BN0-backward means finalised: write d_e_raw."""
    e = e_ref[0].astype(jnp.float32)
    dout = dout_ref[0].astype(jnp.float32)
    t, k, c = e.shape
    z0, h0, l1, dz1 = _route_dz1(e, dout, aff0_ref[0], sh0_ref[0],
                                 w1_ref[...], aff1_ref[0], sh1_ref[0])
    xhat1 = (l1 - mu1_ref[0]) * inv1_ref[0]
    dl1 = g1inv_ref[0] * (dz1 - mr1_ref[0] - xhat1 * mr2_ref[0])
    dh0 = jax.lax.dot_general(
        dl1.reshape(t * k, c), w1_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(t, k, c)
    dz0 = dh0 * _dleaky(z0)
    xhat0 = (e - mu0_ref[0]) * inv0_ref[0]
    de_ref[0] = (g0inv_ref[0] * (dz0 - mq1_ref[0] - xhat0 * mq2_ref[0])
                 ).astype(de_ref.dtype)


# -------------------------------------------------------------- dispatch
def _call(kernel, e_raw, dout, vecs, mats, out_shapes, *, tile: int = 256):
    """Shared pallas_call plumbing.

    vecs: list of (C,) f32 arrays fed as (1, C) whole-array blocks.
    mats: list of (C, C) arrays fed whole.
    out_shapes: list of ShapeDtypeStruct; accumulated outputs use a
    constant block index (flushed once at the end of the grid).
    """
    b, n, k, c = e_raw.shape
    t = _tile_n(n, tile)
    grid = (b, n // t)
    in_specs = [pl.BlockSpec((1, t, k, c), lambda i, j: (i, j, 0, 0))]
    args = [e_raw]
    if dout is not None:
        in_specs.append(pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0)))
        args.append(dout)
    for v in vecs:
        in_specs.append(pl.BlockSpec((1, c), lambda i, j: (0, 0)))
        args.append(v.reshape(1, c).astype(jnp.float32))
    for m in mats:
        in_specs.append(pl.BlockSpec((c, c), lambda i, j: (0, 0)))
        args.append(m.astype(jnp.float32))
    out_specs = []
    for s in out_shapes:
        if len(s.shape) == 3:       # per-tile output (B, N, C) or (B,N,K,C)
            out_specs.append(pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0)))
        elif len(s.shape) == 4:
            out_specs.append(
                pl.BlockSpec((1, t, k, c), lambda i, j: (i, j, 0, 0)))
        else:                        # accumulated (1, C) or (C, C)
            out_specs.append(
                pl.BlockSpec(s.shape, lambda i, j: tuple(0 for _ in s.shape)))
    return pl.pallas_call(
        kernel, out_shape=tuple(out_shapes) if len(out_shapes) > 1
        else out_shapes[0],
        grid=grid, in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        interpret=_INTERPRET,
    )(*args)


def _bn_affines(gamma, beta, mean, var):
    inv = 1.0 / jnp.sqrt(var + _EPS)
    aff = gamma * inv
    sh = beta - mean * aff
    return aff, sh, inv


# ------------------------------------------------------------- public API
@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def fused_edge_tail(e_raw: Array, gamma0, beta0, w1, gamma1, beta1,
                    m0, v0, m1, v1, train: bool) -> Array:
    """pooled = max_k leaky(BN1(leaky(BN0(e_raw)) @ W1)).

    Statistics (m0, v0, m1, v1) are explicit inputs: batch statistics in
    train (compute them with `edge_batch_stats`), running statistics in
    eval.  In train the custom backward applies the full batch-norm
    gradient, so the stats inputs themselves get zero cotangent.
    """
    out, _ = _fwd_impl(e_raw, gamma0, beta0, w1, gamma1, beta1,
                       m0, v0, m1, v1)
    return out


def _fwd_impl(e_raw, gamma0, beta0, w1, gamma1, beta1, m0, v0, m1, v1):
    aff0, sh0, inv0 = _bn_affines(gamma0, beta0, m0, v0)
    aff1, sh1, inv1 = _bn_affines(gamma1, beta1, m1, v1)
    b, n, k, c = e_raw.shape
    out = _call(_fwd_kernel, e_raw, None, [aff0, sh0, aff1, sh1], [w1],
                [jax.ShapeDtypeStruct((b, n, c), jnp.float32)])
    return out, (aff0, sh0, inv0, aff1, sh1, inv1)


def edge_batch_stats(e_raw, gamma0, beta0, w1) -> Tuple[Array, ...]:
    """(m0, v0, m1, v1): batch statistics of e_raw and of the layer-1
    matmul output (which depends on BN0's batch normalisation).

    Non-differentiable by construction: the statistics' dependence on the
    inputs is accounted for inside `fused_edge_tail`'s custom backward
    (the full batch-norm gradient), so gradients must NOT also flow
    through this function."""
    e_raw, gamma0, beta0, w1 = map(
        jax.lax.stop_gradient, (e_raw, gamma0, beta0, w1))
    f = e_raw.astype(jnp.float32)
    m0 = jnp.mean(f, axis=(0, 1, 2))
    # two-pass variance: raw edge features have mean >> std, where the
    # E[x^2]-m^2 shortcut cancels catastrophically (see ConvBN); the
    # post-BN0 l1 statistics below are zero-mean-ish so the kernel's
    # single-pass accumulation is fine there
    v0 = jnp.mean((f - m0) ** 2, axis=(0, 1, 2))
    aff0, sh0, _ = _bn_affines(gamma0, beta0, m0, v0)
    b, n, k, c = e_raw.shape
    s1, s2 = _call(_stats1_kernel, e_raw, None, [aff0, sh0], [w1],
                   [jax.ShapeDtypeStruct((1, c), jnp.float32),
                    jax.ShapeDtypeStruct((1, c), jnp.float32)])
    count = b * n * k
    m1 = s1[0] / count
    v1 = s2[0] / count - m1 * m1
    return m0, v0, m1, v1


def _vjp_fwd(e_raw, gamma0, beta0, w1, gamma1, beta1, m0, v0, m1, v1, train):
    out, _ = _fwd_impl(e_raw, gamma0, beta0, w1, gamma1, beta1, m0, v0, m1, v1)
    return out, (e_raw, gamma0, beta0, w1, gamma1, beta1, m0, v0, m1, v1)


def _vjp_bwd(train, res, dout):
    e_raw, gamma0, beta0, w1, gamma1, beta1, m0, v0, m1, v1 = res
    aff0, sh0, inv0 = _bn_affines(gamma0, beta0, m0, v0)
    aff1, sh1, inv1 = _bn_affines(gamma1, beta1, m1, v1)
    b, n, k, c = e_raw.shape
    count = float(b * n * k)
    zero = jnp.zeros((c,), jnp.float32)

    r1, r2 = _call(_bwd1_kernel, e_raw, dout,
                   [aff0, sh0, aff1, sh1, inv1, m1], [w1],
                   [jax.ShapeDtypeStruct((1, c), jnp.float32),
                    jax.ShapeDtypeStruct((1, c), jnp.float32)],
                   tile=128)
    dbeta1, dgamma1 = r1[0], r2[0]
    if train:
        mr1, mr2 = dbeta1 / count, dgamma1 / count
    else:                      # running stats are constants in eval
        mr1, mr2 = zero, zero
    g1inv = gamma1 * inv1

    dw1, q1, q2 = _call(_bwd2_kernel, e_raw, dout,
                        [aff0, sh0, aff1, sh1, inv1, m1, g1inv, mr1, mr2,
                         inv0, m0], [w1],
                        [jax.ShapeDtypeStruct((c, c), jnp.float32),
                         jax.ShapeDtypeStruct((1, c), jnp.float32),
                         jax.ShapeDtypeStruct((1, c), jnp.float32)],
                   tile=128)
    dbeta0, dgamma0 = q1[0], q2[0]
    if train:
        mq1, mq2 = dbeta0 / count, dgamma0 / count
    else:
        mq1, mq2 = zero, zero
    g0inv = gamma0 * inv0

    de = _call(_bwd3_kernel, e_raw, dout,
               [aff0, sh0, aff1, sh1, inv1, m1, g1inv, mr1, mr2,
                inv0, m0, g0inv, mq1, mq2], [w1],
               [jax.ShapeDtypeStruct((b, n, k, c), e_raw.dtype)],
               tile=128)
    dz = jnp.zeros_like(m0)
    return (de, dgamma0, dbeta0, dw1, dgamma1, dbeta1, dz, dz, dz, dz)


fused_edge_tail.defvjp(_vjp_fwd, _vjp_bwd)
