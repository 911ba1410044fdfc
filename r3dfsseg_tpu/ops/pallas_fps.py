"""One-pass Pallas farthest-point-sampling kernel for TPU.

The XLA path (`ops/fps.py:masked_fps`) is a k-trip `fori_loop` whose body
is one VPU distance sweep over the (N, C) feature matrix plus an argmax;
XLA keeps the matrix VMEM-resident but pays per-iteration while-loop
bookkeeping and (N, 1)-shaped reductions that use 1 of every 128 lanes.
This kernel runs ALL k selection rounds inside one `pallas_call` with two
VMEM-resident copies of the features:

  * feat   (N, C) — row extraction of the newest seed (sublane-dynamic
    slice, cheap);
  * feat_t (C, N) — the per-round distance sweep in lane-major (1, N)
    layout: inner products go to the MXU as one (1, C) x (C, N) dot and
    every elementwise/reduction op runs 128 lanes wide.

Distances use the same |x|^2 - 2 x.c + |c|^2 Gram decomposition as
`ops/knn.pairwise_sqdist` (f32 accumulation); the XLA loop computes
sum((x - c)^2) directly, so near-exact distance ties may resolve
differently — selection-grade equivalence, like the rest of the graph
pipeline (reference: `torch_cluster.fps(random_start=False)`,
`/root/reference/models/mpti.py:613`).

Masking semantics are identical to `masked_fps`:
  * start seed = first valid point (+inf initial distances, argmax ties to
    the lowest index);
  * invalid points carry distance -1 and are never selected while any
    valid candidate remains;
  * once every valid point is chosen the remaining slots repeat the
    lowest-indexed valid point — callers mask those with ``seed_valid``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BIG = 3.4e38
_NEG = -1.0


def _fps_kernel(feat_ref, featt_ref, valid_ref, seeds_ref, mind_s, *,
                k: int):
    n = feat_ref.shape[0]
    valid = valid_ref[:] > 0.5                               # (1, N)
    mind_s[:] = jnp.where(valid, jnp.float32(_BIG), jnp.float32(_NEG))
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    sq = jnp.sum(featt_ref[:] * featt_ref[:], axis=0, keepdims=True)  # (1,N)

    def body(i, _):
        d = mind_s[:]                                        # (1, N)
        m = jnp.max(d)
        # argmax with first-occurrence tie-breaking (matches jnp.argmax)
        pick = jnp.min(jnp.where(d == m, lane_idx, jnp.int32(n)))
        seeds_ref[pl.ds(i, 1), :] = jnp.full((1, 1), pick, jnp.int32)
        c = feat_ref[pl.ds(pick, 1), :]                      # (1, C)
        inner = jnp.dot(c, featt_ref[:],
                        preferred_element_type=jnp.float32)  # (1, N)
        csq = jnp.sum(c * c)
        dn = jnp.maximum(sq - 2.0 * inner + csq, 0.0)
        dn = jnp.where(valid, dn, jnp.float32(_NEG))
        mind_s[:] = jnp.minimum(d, dn)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def masked_fps_pallas(feat: Array, valid: Array, k: int,
                      interpret: bool = False) -> Array:
    """feat (N, C), valid (N,) bool -> (k,) int32 seed indices."""
    # indices carry no tangents; without this the outer value_and_grad
    # tries to JVP through the pallas_call (unsupported) even though the
    # int32 output has no derivative.
    feat = jax.lax.stop_gradient(feat).astype(jnp.float32)
    valid = jax.lax.stop_gradient(valid)
    n, _ = feat.shape
    seeds = pl.pallas_call(
        functools.partial(_fps_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((k, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(feat, feat.T, valid.astype(jnp.float32)[None, :])
    return seeds[:, 0]
