"""Sequence-parallel (node-sharded) graph label propagation.

New TPU-native capability with no reference counterpart: the reference
builds its whole affinity graph densely on one GPU (faiss kNN + a
~4.4k x 4.4k inverse, `/root/reference/models/mpti.py:717-776`), which
caps the node count at one device's memory.  Here every O(M^2) object —
the distance matrix, the affinity and the propagation matrix — is sharded
ROW-BLOCK-wise over a `jax.sharding.Mesh`, so the graph size is bounded by
the mesh's aggregate HBM instead.  Whole-scene transductive inference
(tens of thousands of query points joined in ONE graph rather than the
reference's independent 2048-point blocks) becomes a `shard_map` program
whose collectives ride ICI:

  * one `pmax` to share the k-th-distance bisection's upper bound,
  * two tiny `all_gather`s (per-row k-th radii, inverse-sqrt degrees),
  * one (M, n_classes) `all_gather` per Chebyshev matvec.

Each graph row lives whole on its owner device and is computed with the
same term grouping and matmul precision as the unsharded path, so the
sharded result matches `ops.lp.local_constrained_affinity(impl=
'threshold')` + `ops.lp.label_propagate(solver='cheby')` exactly
(tests/test_parallel.py pins agreement on an 8-device mesh, including the
auto-bandwidth sigma<=0 branch and padded node counts).

Inference/eval oriented: the solve is a plain Chebyshev iteration, not a
`custom_linear_solve`, so gradients do not flow through it.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from r3dfsseg_tpu.ops.lp import _BIG, _chebyshev, _kth_smallest_per_row

Array = jax.Array


def sp_label_propagate(
    node_feat: Array,
    y: Array,
    *,
    mesh: Mesh,
    k: int,
    sigma: float = 1.0,
    alpha: float = 0.99,
    valid: Array | None = None,
    method: str = "gaussian",
    iters: int = 50,
) -> Array:
    """Label propagation Z = (I - alpha*S)^-1 Y with the graph sharded
    over ``mesh`` (first/only axis).

    Args:
      node_feat: (M, C) node features (prototypes ++ query points),
        replicated — tiny next to the M^2 graph.
      y: (M, n_classes) label matrix (one-hot prototype rows, zero query
        rows), replicated.
      mesh: 1-D device mesh; M is padded up to a multiple of its size
        with invalid slots.
      k / sigma / alpha / method: graph hyper-parameters, same semantics
        as `local_constrained_affinity` (threshold selection; sigma <= 0
        = auto bandwidth) and `label_propagate`.
      valid: optional (M,) bool mask of real nodes.
      iters: Chebyshev iteration count (= lp_cg_iters).
    Returns:
      (M, n_classes) propagated scores, replicated.
    """
    if mesh.devices.ndim != 1:
        raise ValueError(
            f"sp_label_propagate needs a 1-D mesh, got shape "
            f"{mesh.devices.shape} with axes {mesh.axis_names}")
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    m = node_feat.shape[0]
    if valid is None:
        valid = jnp.ones((m,), bool)
    mp = ((m + n_dev - 1) // n_dev) * n_dev
    pad = mp - m
    feat = jnp.pad(node_feat.astype(jnp.float32), ((0, pad), (0, 0)))
    yp = jnp.pad(y.astype(jnp.float32), ((0, pad), (0, 0)))
    vp = jnp.pad(valid, (0, pad))
    # pad slots must also be excluded from the bisection-bound pmax
    # (original invalid nodes DO contribute there, like unsharded rows do)
    is_pad = jnp.arange(mp) >= m

    fn = shard_map(
        partial(_sp_lp_block, axis=axis, n_dev=n_dev, k=k, sigma=sigma,
                alpha=alpha, method=method, iters=iters),
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(feat, yp, vp, is_pad)[:m]


def _sp_lp_block(feat, y, valid, is_pad, *, axis, n_dev, k, sigma, alpha,
                 method, iters):
    """Per-device body: owns rows [dev*blk, (dev+1)*blk) of every graph
    matrix; everything (M,)-or-smaller is exchanged over ICI."""
    mp = feat.shape[0]
    blk = mp // n_dev
    dev = jax.lax.axis_index(axis)
    i0 = dev * blk
    fb = jax.lax.dynamic_slice_in_dim(feat, i0, blk, 0)        # (blk, C)
    vb = jax.lax.dynamic_slice_in_dim(valid, i0, blk, 0)       # (blk,)
    pb = jax.lax.dynamic_slice_in_dim(is_pad, i0, blk, 0)

    # ---- row-block squared distances, unsharded grouping/precision ----
    xx = jnp.sum(fb * fb, axis=-1, keepdims=True)              # (blk, 1)
    yy = jnp.sum(feat * feat, axis=-1, keepdims=True)          # (mp, 1)
    inner = jnp.einsum("nc,mc->nm", fb, feat,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    d = jnp.maximum((xx + yy.T) - 2.0 * inner, 0.0)            # (blk, mp)

    rows = i0 + jnp.arange(blk)
    eye_blk = rows[:, None] == jnp.arange(mp)[None, :]
    big = jnp.asarray(_BIG, d.dtype)
    dmask = jnp.where(eye_blk, big, d)
    dmask = jnp.where(valid[None, :], dmask, big)
    # pad rows (not original-invalid rows) are fully masked so the shared
    # bisection bound equals the unsharded matrix's max
    dmask = jnp.where(pb[:, None], big, dmask)

    finite = jnp.where(dmask >= 0.5 * _BIG, -jnp.inf, dmask)
    local_hi = jnp.max(jnp.where(jnp.isfinite(finite), finite, 0.0))
    hi = jnp.maximum(jax.lax.pmax(local_hi, axis), 1e-6)

    radius = _kth_smallest_per_row(dmask, k, iters=32, hi=hi)  # (blk, 1)
    r_all = jax.lax.all_gather(radius.reshape(-1), axis,
                               tiled=True)                     # (mp,)

    if method == "gaussian":
        if sigma <= 0:
            # auto bandwidth over valid rows (ops/lp.py sigma<=0 branch)
            srt = jnp.sort(jnp.where(valid, r_all, jnp.inf))
            nv = jnp.sum(valid.astype(jnp.int32))
            med = srt[jnp.clip((nv - 1) // 2, 0, mp - 1)]
            sigma2 = jax.lax.stop_gradient(jnp.maximum(med / 4.0, 1e-12))
        else:
            sigma2 = sigma * sigma
        sim = jnp.exp(-0.5 * d / sigma2)
    elif method == "cosine":
        nb = fb / (jnp.linalg.norm(fb, axis=-1, keepdims=True) + 1e-12)
        na = feat / (jnp.linalg.norm(feat, axis=-1, keepdims=True) + 1e-12)
        sim = jnp.einsum("nc,mc->nm", nb, na,
                         preferred_element_type=jnp.float32)
    else:
        raise NotImplementedError(f"unknown affinity method {method!r}")

    # transpose-free symmetrised threshold affinity (ops/lp.py)
    cnt = ((dmask <= radius).astype(jnp.float32)
           + (dmask <= r_all[None, :]).astype(jnp.float32))
    a = sim * cnt
    a = jnp.where(eye_blk, 0.0, a)
    a = a * vb.astype(jnp.float32)[:, None] * valid.astype(jnp.float32)[None, :]

    # ---- S = D^-1/2 A D^-1/2: degrees are exact (full row local) ----
    eps = jnp.asarray(jnp.finfo(jnp.float64).eps, jnp.float32)
    deg = jnp.sum(a, axis=1)
    rinv = jnp.sqrt(1.0 / (deg + eps))                         # (blk,)
    rinv_all = jax.lax.all_gather(rinv, axis, tiled=True)      # (mp,)
    s_blk = a * rinv[:, None] * rinv_all[None, :]

    def matvec(z):
        sz = jnp.einsum("nm,mc->nc", s_blk, z,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        sz = jax.lax.all_gather(sz, axis, axis=0, tiled=True)  # (mp, C)
        return z - alpha * sz

    return _chebyshev(matvec, y, 1.0 - alpha, 1.0 + alpha,
                      iters=max(iters, 1))
