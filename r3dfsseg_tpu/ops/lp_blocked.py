"""Matrix-free label propagation for scene-scale graphs on ONE chip.

The dense path (`ops/lp.py`) materialises the (M, M) affinity — at the
episode size (M=4396) that is the right call (S stays VMEM-resident), but
whole-scene serving reaches M = 300 + P nodes and the M^2 buffers cap a
single chip at ~16-24k points (BASELINE.md note 4).  This module runs the
SAME threshold-affinity + Chebyshev semantics without ever materialising
the graph: every matvec streams row tiles of the affinity, rebuilt on the
fly from the features (a (R, M) tile is the largest live buffer).

Cost model: the build is one gram + one bisection sweep + one affinity
pass; when the (M_pad, M_pad) matrix at the compute dtype fits in ~8.5 GB
it is stored once and the 50 Chebyshev matvecs just stream it from HBM
(bf16 @ 64k nodes: 8.7 GB, ~0.6 s of reads); past that, every matvec
rematerialises its tiles (exp-bound fallback).  The multi-chip
`parallel/sp.py` path remains the scale-out option; this is the
single-chip fallback the round-2 review asked for.

Semantics mirrored from `ops/lp.py` (reference `mpti.py:717-776`):
  * per-row k-th-distance radius r_i via the SAME value-space bisection
    as the dense threshold impl (`_kth_smallest_per_row`);
  * A_ij = exp(-0.5 d_ij / sigma^2) * ([d_ij <= r_i] + [d_ij <= r_j]),
    zero diagonal, invalid rows/cols zeroed (the transpose-free
    symmetrised form, lp.py:183-196);
  * auto bandwidth sigma^2 = median(valid r_i) / 4 when sigma <= 0;
  * S = D^-1/2 A D^-1/2 with the same eps, solved by the same Chebyshev
    recurrence on eig bounds [1-alpha, 1+alpha].

Forward-only (serving): selection, bandwidth and the solve are all under
stop_gradient semantics by construction (no custom VJPs needed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from r3dfsseg_tpu.ops.lp import _BIG, _chebyshev, _kth_smallest_per_row

Array = jax.Array


def _tile_sqdist(fi: Array, f_all: Array, ni: Array, n_all: Array) -> Array:
    """(R, M) squared distances from one row tile; f32 norms + (optionally
    half-width) gram, the centered-input recipe of lp.py:80-99."""
    g = jnp.einsum("rc,mc->rm", fi, f_all,
                   preferred_element_type=jnp.float32)
    return jnp.maximum(ni[:, None] + n_all[None, :] - 2.0 * g, 0.0)


def _graph_build(node_feat, valid, *, k, sigma, row_tile, compute_dtype,
                 compare_dtype=None):
    """Shared build preamble for both scene-LP variants: pad + center the
    features, define the masked-distance row tiles, compute the per-row
    k-th-distance radii (value-space bisection over ONE GLOBAL interval,
    so the radii are independent of the tiling — mirroring the sharded
    path's global-hi contract, lp.py:259-262) and the bandwidth.

    compare_dtype (defaults to compute_dtype) sets the dtype of the
    NEIGHBOUR-SELECTION compares only — the bisection reads and the
    radius/membership tests.  The split-store f32 path passes bf16 here:
    the 32-pass f32 bisection re-reads every (row_tile, M) f32 tile from
    HBM and dominates the f32 build (~0.7 s at 64k); a half-width compare
    copy at 16 steps (which resolve past bf16's own resolution,
    lp.py:126-134) cuts that traffic 4x while distances, exp and the
    solve stay f32.

    Returns (m_pad, n_tiles, vpad, radii, sigma2, masked_tile,
    affinity_tile)."""
    m, d = node_feat.shape
    r_t = int(row_tile)
    m_pad = ((m + r_t - 1) // r_t) * r_t
    n_tiles = m_pad // r_t

    f32 = node_feat.astype(jnp.float32)
    vpad = jnp.zeros((m_pad,), bool).at[:m].set(valid)
    # centered features: bf16 gram rounding lands relative, not absolute
    # (lp.py:80-89); exact no-op for the f32 path
    xc = f32 - jnp.mean(jnp.where(valid[:, None], f32, 0.0), axis=0,
                        keepdims=True)
    norms = jnp.sum(xc * xc, axis=-1)
    cmp_dt = compute_dtype or jnp.float32
    fpad = jnp.zeros((m_pad, d), cmp_dt).at[:m].set(xc.astype(cmp_dt))
    npad = jnp.zeros((m_pad,), jnp.float32).at[:m].set(norms)

    big = jnp.asarray(_BIG, jnp.float32)
    iota = jnp.arange(m_pad)

    def masked_tile(t):
        """(R, M_pad) distances for row tile t with self/invalid pushed out."""
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, t * r_t, r_t)  # noqa: E731
        dist = _tile_sqdist(sl(fpad), fpad, sl(npad), npad)
        rows = jax.lax.dynamic_slice_in_dim(iota, t * r_t, r_t)
        dead = ((rows[:, None] == iota[None, :])
                | ~vpad[None, :] | ~sl(vpad)[:, None])
        return jnp.where(dead, big, dist), dead

    # global bisection bound: d_ij = |xi - xj|^2 <= 4 * max|x|^2 bounds
    # every real pairwise distance, is tiling-independent, and needs no
    # extra distance pass
    hi_global = 4.0 * jnp.maximum(
        jnp.max(jnp.where(vpad[:m_pad], npad, 0.0)), 1e-6)

    cmp_dtype = compare_dtype if compare_dtype is not None else compute_dtype

    def radius_tile(t):
        # bisection, not top_k: lax.top_k at k=200 over 33k-wide rows is
        # O(M*k) VPU work (seconds per build); the value-space bisection
        # is bandwidth-bound passes over the tile — the same radius
        # semantics as the dense threshold path (lp.py:251-279).  With a
        # half-width compare copy, 16 steps resolve past bf16's own
        # resolution (lp.py:126-134): half the traffic of half the passes.
        dist, _ = masked_tile(t)
        if cmp_dtype is not None:
            cmp = dist.astype(cmp_dtype)
            n_iters = 16
        else:
            cmp, n_iters = dist, 32
        return _kth_smallest_per_row(cmp, k, iters=n_iters,
                                     hi=hi_global).reshape(-1)

    radii = jax.lax.map(radius_tile, jnp.arange(n_tiles)).reshape(m_pad)
    radii = jnp.where(vpad, radii, big)

    if sigma <= 0:
        rv = jnp.sort(jnp.where(vpad, radii, jnp.inf))
        nv = jnp.sum(vpad.astype(jnp.int32))
        med = rv[jnp.clip((nv - 1) // 2, 0, m_pad - 1)]
        sigma2 = jnp.maximum(med / 4.0, 1e-12)
    else:
        sigma2 = jnp.asarray(sigma * sigma, jnp.float32)

    def affinity_tile(t):
        """(R, M_pad) symmetrised affinity rows (lp.py:183-196).  The
        neighbour-membership compares run on the SAME (optionally
        half-width) copy the bisection resolved the radii on, so tie
        handling matches the dense relaxed path; similarity values stay
        f32 until the caller's storage cast."""
        dist, dead = masked_tile(t)
        cmp = dist.astype(cmp_dtype) if cmp_dtype is not None else dist
        r_rows = jax.lax.dynamic_slice_in_dim(radii, t * r_t, r_t)
        cnt = ((cmp <= r_rows[:, None].astype(cmp.dtype)).astype(jnp.float32)
               + (cmp <= radii[None, :].astype(cmp.dtype)).astype(jnp.float32))
        sim = jnp.exp(-0.5 * dist / sigma2)
        return jnp.where(dead, 0.0, sim * cnt)

    return m_pad, n_tiles, vpad, radii, sigma2, masked_tile, affinity_tile


def blocked_label_propagate(
    node_feat: Array,
    y: Array,
    *,
    k: int,
    sigma: float,
    alpha: float,
    valid: Array,
    iters: int = 50,
    row_tile: int = 512,
    compute_dtype=None,
    store_graph: bool | None = None,
    split_store: bool | None = None,
) -> Array:
    """Z = (I - alpha*S)^-1 Y with the affinity built in row tiles.

    Two execution modes, same numbers:
      * store_graph=True (auto when the (M_pad, M_pad) matrix at the
        compute dtype fits in ~8.5 GB of HBM): the affinity is built ONCE
        tile by tile — never more than one (row_tile, M) f32 intermediate
        alive, unlike the dense path whose fused build needs several M^2
        f32 buffers — and the Chebyshev matvecs then stream the stored
        matrix (bf16 at 64k nodes: 8.7 GB, ~0.6 s of HBM reads for 50
        iterations).
      * store_graph=False: nothing is ever materialised; every matvec
        recomputes its affinity tiles from the features (exp-bound:
        M^2 transcendentals per iteration — the capacity fallback).

    Args:
      node_feat: (M, d) f32 node features (prototypes ++ scene points).
      y: (M, C) label matrix.
      k: neighbours per node (k_connect).
      sigma: gaussian bandwidth; <= 0 selects the auto bandwidth.
      alpha: propagation coefficient.
      valid: (M,) bool; invalid nodes leave the graph entirely.
      iters: Chebyshev iterations.
      row_tile: rows per built tile (peak transient = row_tile x M f32).
      compute_dtype: optional bf16 for the gram/mask passes AND the stored
        graph (halves traffic; exp/accumulation stay f32).
    """
    m = node_feat.shape[0]
    m_pad = ((m + int(row_tile) - 1) // int(row_tile)) * int(row_tile)

    store_dt = compute_dtype or jnp.float32
    split_z = bool(split_store)
    if split_z:                       # forced (tests / explicit callers)
        assert compute_dtype is None, \
            "split_store implies an f32-built graph stored bf16"
        store_graph, store_dt = True, jnp.bfloat16
    if store_graph is None:
        # 9.2 GB leaves ~6 GB for weights/features/tile transients on a
        # 16 GB v5e — admits the bf16 64k-point graph (8.72 GB)
        budget = 9.2e9
        store_graph = m_pad * m_pad * jnp.dtype(store_dt).itemsize <= budget
        if not store_graph and compute_dtype is None and split_store is None \
                and m_pad * m_pad * 2 <= budget:
            # f32-accuracy mode past the f32 storage budget (the "f32
            # cliff", BASELINE.md note 5): build the graph with f32
            # distances and f32 exp, resolve neighbour selection on a
            # half-width compare copy (16-step bisection — the f32
            # 32-pass bisection re-reading f32 tiles is ~0.7 s of HBM
            # traffic at 64k on its own), and store the similarities ONCE
            # in bf16 — relaxations the half-width graph-chain A/B
            # validated in-band.  The Chebyshev direction vector is kept
            # EXACT through the recurrence by a split-bf16 hi/lo pair
            # (the pallas_cheby trick: rounding z to bf16 each step
            # compounds over 50 iterations and was measured harmful,
            # while the split fully recovers it).  Both halves ride ONE
            # pass over the stored matrix (concatenated into one
            # 2C-column RHS, C = n_way+1 is tiny), so this runs at the
            # bf16 stored-graph speed, not the 2.2 s rematerialising f32
            # fallback.
            store_graph, split_z = True, True
            store_dt = jnp.bfloat16

    (m_pad, n_tiles, _vpad, _radii, _sigma2,
     _masked_tile, affinity_tile) = _graph_build(
        node_feat, valid, k=k, sigma=sigma, row_tile=row_tile,
        compute_dtype=compute_dtype,
        compare_dtype=(jnp.bfloat16 if split_z else None))

    eps = jnp.asarray(jnp.finfo(jnp.float64).eps, jnp.float32)
    ypad = jnp.zeros((m_pad, y.shape[1]), jnp.float32).at[:m].set(
        y.astype(jnp.float32))

    if store_graph:
        # ---- build once (one tile of f32 transients at a time) ----
        a_full = jax.lax.map(
            lambda t: affinity_tile(t).astype(store_dt),
            jnp.arange(n_tiles)).reshape(m_pad, m_pad)
        deg = jnp.sum(a_full, axis=1, dtype=jnp.float32)
        rinv = jnp.sqrt(1.0 / (deg + eps))           # lp.py:335-338

        if split_z:
            def matvec(z):
                zt = z * rinv[:, None]
                hi = zt.astype(jnp.bfloat16)
                lo = (zt - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                both = jnp.concatenate([hi, lo], axis=1)   # (M, 2C)
                sz2 = jnp.einsum("nm,mc->nc", a_full, both,
                                 preferred_element_type=jnp.float32)
                ncol = z.shape[1]
                sz = sz2[:, :ncol] + sz2[:, ncol:]
                return z - alpha * sz * rinv[:, None]
        else:
            def matvec(z):
                zt = z * rinv[:, None]
                sz = jnp.einsum("nm,mc->nc", a_full, zt,
                                preferred_element_type=jnp.float32)
                return z - alpha * sz * rinv[:, None]
    else:
        # ---- degree pass, then rematerialising matvecs ----
        deg = jax.lax.map(lambda t: jnp.sum(affinity_tile(t), axis=1),
                          jnp.arange(n_tiles)).reshape(m_pad)
        rinv = jnp.sqrt(1.0 / (deg + eps))

        def matvec(z):
            zt = z * rinv[:, None]

            def tile(t):
                a = affinity_tile(t)
                return jnp.einsum("rm,mc->rc", a, zt,
                                  preferred_element_type=jnp.float32)

            sz = jax.lax.map(tile, jnp.arange(n_tiles)).reshape(m_pad, -1)
            return z - alpha * sz * rinv[:, None]

    z = _chebyshev(matvec, ypad, 1.0 - alpha, 1.0 + alpha,
                   iters=max(iters, 1))
    return z[:m]


def sparse_label_propagate(
    node_feat: Array,
    y: Array,
    *,
    k: int,
    sigma: float,
    alpha: float,
    valid: Array,
    iters: int = 50,
    row_tile: int = 512,
    width: int | None = None,
    compute_dtype=None,
) -> Array:
    """Like `blocked_label_propagate` but SPARSIFY-ONCE: one streaming
    build pass keeps each row's `width` largest affinity entries (index +
    value), then every Chebyshev matvec is a gather — no per-iteration
    gram/exp recomputation.

    The streamed variant recomputes the (row_tile, M) affinity for every
    matvec and is exp-bound (M^2 transcendentals x iters: ~8.7 s for a
    64k-point scene).  Truncation here drops only reverse-neighbour
    entries beyond the per-row capacity `width` (default 2k + 112): the
    row criterion contributes exactly k entries, the column criterion
    ~k on average, so the dropped mass is the far tail of the smallest
    weights.  Degrees use the KEPT mass, preserving the near-stochastic
    row scaling Chebyshev's spectral bound relies on.
    `tests/test_lp_blocked.py` pins >99% label agreement with the dense
    graph — but MEASURED ON v5e this loses to the dense-streaming modes
    (5.7 s vs 0.4-0.6 s at 32k points: the (M, width) gather matvec is a
    TPU anti-pattern).  Kept as an env-selectable experiment
    (`R3D_SCENE_LP=sparse`) with that result on record; use
    `blocked_label_propagate` in production.
    """
    m = node_feat.shape[0]
    (m_pad, n_tiles, _vpad, _radii, _sigma2,
     _masked_tile, affinity_tile) = _graph_build(
        node_feat, valid, k=k, sigma=sigma, row_tile=row_tile,
        compute_dtype=compute_dtype)
    w = int(width) if width is not None else min(2 * k + 112, m_pad)

    def build_tile(t):
        val, idx = jax.lax.top_k(affinity_tile(t), w)  # largest weights
        return val, idx.astype(jnp.int32)

    vals, idxs = jax.lax.map(build_tile, jnp.arange(n_tiles))
    vals = vals.reshape(m_pad, w)
    idxs = idxs.reshape(m_pad, w)

    deg = jnp.sum(vals, axis=1)                   # kept mass as degree
    eps = jnp.asarray(jnp.finfo(jnp.float64).eps, jnp.float32)
    rinv = jnp.sqrt(1.0 / (deg + eps))

    ypad = jnp.zeros((m_pad, y.shape[1]), jnp.float32).at[:m].set(
        y.astype(jnp.float32))
    flat_idx = idxs.reshape(-1)

    def matvec(z):
        zt = z * rinv[:, None]
        g = jnp.take(zt, flat_idx, axis=0).reshape(m_pad, w, -1)
        sz = jnp.sum(g * vals[..., None], axis=1) * rinv[:, None]
        return z - alpha * sz

    z = _chebyshev(matvec, ypad, 1.0 - alpha, 1.0 + alpha,
                   iters=max(iters, 1))
    return z[:m]
