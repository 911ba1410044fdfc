"""Fused single-head attention kernel for point clouds (TPU Pallas).

The reference's SelfAttention (`/root/reference/models/attention.py:10-48`)
is one dense softmax(q k^T / sqrt(d)) v over all N=2048 points.  XLA
materialises the (B, N, N) attention matrix in HBM several times (fwd +
softmax + dropout + bwd ~ 6 passes x 16.8 MB per cloud): measured 41 ms
fwd+bwd for 56 clouds on v5e.  Here each grid step computes a
(TILE_Q, N) attention tile entirely in VMEM — scores, row softmax,
dropout (pltpu PRNG, mask regenerated identically in the backward — both
passes use the same 256-row query tile and per-(batch, tile) seed when
dropout is active), and the PV matmul — so the attention matrix never
touches HBM.

Backward (custom_vjp, standard attention algebra with the dropout mask M,
P = softmax(S), Pd = P*M/keep):
    dV  = Pd^T dY
    dP  = (dY V^T) * M / keep
    dS  = P * (dP - rowsum(dP * P))
    dQ  = dS K / tau ;  dK = dS^T Q / tau
dK/dV accumulate across query tiles into revisited output blocks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Interpret-mode escape hatch for CPU tests (set by tests; the TPU path
# never flips this).
_INTERPRET = False


def _dropout_mask(shape, rate: float):
    """Regenerable in fwd and bwd: caller must seed pltpu PRNG first."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # uniform in [0, 1): logical shift on uint32, then via int32 (mosaic has
    # no uint32->float cast; after >>8 the value fits in 24 bits, so the
    # int32 reinterpretation is value-preserving)
    u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= rate).astype(jnp.float32) / (1.0 - rate)


def _prec(lowp: bool):
    # bf16 operands take the single-pass MXU path; f32 operands pin
    # HIGHEST (x3-decomposition) so parity mode keeps full f32 scores.
    return None if lowp else jax.lax.Precision.HIGHEST


def _attn_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, y_ref, *,
                     tau: float, rate: float, train: bool):
    b, t = pl.program_id(0), pl.program_id(1)
    lowp = q_ref.dtype == jnp.bfloat16
    q = q_ref[0]                              # (TQ, D)
    k = k_ref[0]                              # (N, D)
    v = v_ref[0]                              # (N, D)
    s = jax.lax.dot_general(
        q * jnp.asarray(1.0 / tau, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(lowp))                # (TQ, N) f32
    s = s - jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + b * 65536 + t)
        p = p * _dropout_mask(p.shape, rate)
    y_ref[0] = jax.lax.dot_general(
        p.astype(q.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(lowp))


def _attn_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, dy_ref,
                     dq_ref, dk_ref, dv_ref, *,
                     tau: float, rate: float, train: bool):
    b, t = pl.program_id(0), pl.program_id(1)
    lowp = q_ref.dtype == jnp.bfloat16
    prec = _prec(lowp)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    dy = dy_ref[0].astype(q.dtype)            # (TQ, D)

    s = jax.lax.dot_general(
        q * jnp.asarray(1.0 / tau, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec)
    s = s - jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=1, keepdims=True)      # (TQ, N) f32

    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + b * 65536 + t)
        m = _dropout_mask(p.shape, rate)
    else:
        m = None
    pd = p * m if m is not None else p

    dv = jax.lax.dot_general(                      # Pd^T dY: (N, D)
        pd.astype(q.dtype), dy, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec)
    dp = jax.lax.dot_general(                      # dY V^T: (TQ, N)
        dy, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec)
    if m is not None:
        dp = dp * m
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))   # (TQ, N) f32
    ds_l = ds.astype(q.dtype)
    dq_ref[0] = (jax.lax.dot_general(
        ds_l, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec) * (1.0 / tau)).astype(dq_ref.dtype)
    dk = jax.lax.dot_general(                      # dS^T Q / tau: (N, D)
        ds_l, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec) * (1.0 / tau)

    @pl.when(t == 0)
    def _():
        dk_ref[0] = dk
        dv_ref[0] = dv

    @pl.when(t != 0)
    def _():
        dk_ref[0] = dk_ref[0] + dk
        dv_ref[0] = dv_ref[0] + dv


def _tile_q(n: int, want: int) -> int:
    """Query-tile size: the (TQ, N) score/prob/mask intermediates must fit
    VMEM alongside K/V — fwd keeps ~2 live, bwd ~4."""
    t = min(want, n)
    while n % t:
        t //= 2
    return max(t, 8)


def _dropout_tile(n: int) -> int:
    """The ONE query-tile size used by both fwd and bwd when dropout is
    active: the per-(batch, tile) PRNG seed makes the mask a function of the
    tiling, so the two passes must tile identically."""
    return _tile_q(n, 256)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_attention(q: Array, k: Array, v: Array, seed: Array,
                    tau: float, rate: float, train: bool) -> Array:
    """softmax(q k^T / tau) [dropout] v; q,k,v: (B, N, D); seed: () int32."""
    return _fwd_impl(q, k, v, seed, tau, rate, train)


def _fwd_impl(q, k, v, seed, tau, rate, train):
    b, n, d = q.shape
    # The dropout mask is seeded per (batch, query-tile), so when dropout is
    # active the forward MUST use the same query-tile size as the backward
    # (256) or the regenerated mask diverges for N > 256.  Without dropout
    # the bigger 512 tile halves K/V reloads.
    tq = _dropout_tile(n) if (train and rate > 0.0) else _tile_q(n, 512)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    grid = (b, n // tq)
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel, tau=tau, rate=rate, train=train),
        out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tq, d), lambda b_, t_, s_: (b_, t_, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, d), lambda b_, t_, s_: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, d), lambda b_, t_, s_: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tq, d), lambda b_, t_, s_: (b_, t_, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=_INTERPRET,
    )(seed_arr, q, k, v)


def _bwd_impl(q, k, v, seed, tau, rate, train, dy):
    b, n, d = q.shape
    # must match the forward's tiling whenever dropout was applied there
    tq = _dropout_tile(n) if (train and rate > 0.0) else _tile_q(n, 256)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    grid = (b, n // tq)
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, tau=tau, rate=rate, train=train),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),   # dq
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),   # dk
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),   # dv
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tq, d), lambda b_, t_, s_: (b_, t_, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, d), lambda b_, t_, s_: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, d), lambda b_, t_, s_: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq, d), lambda b_, t_, s_: (b_, t_, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, tq, d), lambda b_, t_, s_: (b_, t_, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, d), lambda b_, t_, s_: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, d), lambda b_, t_, s_: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        interpret=_INTERPRET,
    )(seed_arr, q, k, v, dy)


def _vjp_fwd(q, k, v, seed, tau, rate, train):
    return _fwd_impl(q, k, v, seed, tau, rate, train), (q, k, v, seed)


def _vjp_bwd(tau, rate, train, res, dy):
    q, k, v, seed = res
    dq, dk, dv = _bwd_impl(q, k, v, seed, tau, rate, train, dy)
    # accumulation runs in f32 out-blocks; cotangents must match primal dtype
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)
