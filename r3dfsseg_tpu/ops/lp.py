"""Affinity-graph construction and transductive label propagation.

TPU-native replacement for the reference's
`calculateLocalConstrainedAffinity` (faiss CPU kNN round-trip,
`/root/reference/models/mpti.py:717-756`) and `label_propagate` (dense
~4.4k x 4.4k matrix inverse, `mpti.py:758-776`).

Here the kNN search is one on-device Gram matmul + `top_k`, and the
closed-form solve (I - alpha*S)^-1 Y is either a dense `linalg.solve`
(parity mode) or conjugate gradients (default: the system is symmetric
positive-definite with eigenvalues >= 1-alpha, and Y has only n_way+1
columns, so CG is a handful of MXU matvecs instead of an O(n^3) inverse).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from r3dfsseg_tpu.ops.knn import pairwise_sqdist

Array = jax.Array

# self/invalid exclusion sentinel — see the comment at its use site in
# local_constrained_affinity for why this must NOT be near f32/bf16 max
_BIG = 1e30


def local_constrained_affinity(
    node_feat: Array,
    k: int,
    sigma: float = 1.0,
    *,
    valid: Array | None = None,
    method: str = "gaussian",
    impl: str = "threshold",
    compare_dtype=None,
) -> Array:
    """Symmetric kNN affinity with zero diagonal (mpti.py:717-756).

    Args:
      node_feat: (N, C) node features (prototypes ++ query points).
      k: neighbours per node (`k_connect`).
      sigma: gaussian bandwidth (sim = exp(-0.5 * d^2 / sigma^2), mpti.py:746).
        sigma <= 0 selects AUTO bandwidth: sigma^2 = median over valid rows
        of the k-th-neighbour squared distance, divided by 4 (so the k-th
        neighbour keeps weight exp(-2) at any feature scale).  The
        reference's fixed sigma=1 has an absorbing failure mode — when
        training grows the feature scale, every exp(-d^2/2) underflows,
        the prototype->query coupling dies, query logits pin at 0 and the
        LP gradient vanishes (see DESIGN.md "ln(3) state").  Auto
        bandwidth makes the graph scale-invariant; the bandwidth is
        stop-gradient (a pure rescale, not a learnable temperature).
      valid: optional (N,) bool; invalid (padding) nodes get zero rows/cols
        and are never selected as neighbours.
      method: 'gaussian' | 'cosine' (mpti.py:742-746).
      impl: neighbour selection —
        'threshold': per-row k-th-distance via vectorised binary search,
          then an elementwise mask builds A directly.  No sort, no scatter:
          ~3x faster than top_k at k=200 on TPU.  Exact-distance ties at
          the k-th radius admit every tied neighbour (measure-zero for
          continuous features).
        'topk': exact top-k selection (reference tie-break parity) —
          implemented since round 5 as exact-bit bisection + tie cumsum
          (`_exact_topk_select`), selection-identical to lax.top_k but
          without its row sort + scatter (68 -> ~5 ms at 4396^2, k=200).
      compare_dtype: optional low-precision dtype (bf16) for the threshold
        path's neighbour *selection* only — the bisection + membership
        passes read a half-width copy of the distance matrix (2x less HBM
        traffic); similarity values stay f32.  Selection differs from f32
        only on ties at bf16 resolution.
    Returns:
      (N, N) affinity matrix A = A_knn + A_knn^T with zero diagonal.
    """
    n = node_feat.shape[0]
    f32 = node_feat.astype(jnp.float32)

    # ONE distance matrix: gradients flow through the similarity values
    # while neighbour *selection* sees a detached copy — the reference
    # behaves the same way via its CPU faiss round-trip (mpti.py:731).
    # Relaxed mode computes the Gram inner product from MEAN-CENTERED bf16
    # inputs with f32 norms: distances are translation-invariant, and
    # centering shrinks |x|^2 to the spread scale, so the bf16 rounding
    # lands as ~relative (not absolute) error on d.  Measured on
    # realistic activations (top-200 neighbours): median 0.11% / p99 1.2%
    # similarity error — same class as the bf16 matvec storage.  A RAW
    # bf16 gram was rejected (p99 ~11%: the large cancelling |x|^2 terms
    # turn 0.4% input rounding into ~0.3 absolute d error, which
    # exp(-d/2) amplifies).  Fwd+bwd run single-pass on the MXU: ~2.6 ms
    # faster per step than HIGHEST.
    if compare_dtype is not None:
        xc = f32 - jnp.mean(f32, axis=0, keepdims=True)
        xb = xc.astype(compare_dtype)
        xx = jnp.sum(xc * xc, axis=-1, keepdims=True)       # f32 norms
        # sqd itself stays f32: rounding d to bf16 costs (d/2sigma^2) x
        # 0.4% relative similarity error — unbounded at fixed sigma
        # (measured median 3% at sigma=1 on unit-normal features).  The
        # half-width graph starts AFTER the exp, where the store rounding
        # is a flat ~0.4% relative on the similarity at any sigma.
        sqd = _centered_sqdist(xb, xx)
    else:
        sqd = pairwise_sqdist(f32)
    # Exclusion sentinel for self/invalid entries.  MUST be exactly
    # representable and far inside range in BOTH f32 and the optional bf16
    # compare dtype: the old 3.4e38 sat at the very edge of bf16 (max
    # finite 3.3895e38), and XLA's constant-folded f32->bf16 convert
    # rounded it to max-finite while the eager runtime convert rounded it
    # to inf — under jit the `d >= sentinel` masks then never fired, the
    # k-th-distance bisection started from hi~3.4e38 and returned garbage
    # radii, auto-bandwidth blew up to sigma2=inf, and the affinity
    # saturated to the uniform complete graph (lp_loss pinned at ln(3)
    # from step 1 of every bf16-graph training run).  1e30 dwarfs any real
    # squared feature distance (~1e4) and converts safely.
    eye = jnp.eye(n, dtype=bool)

    def _masked(d):
        """Detached copy with self/invalid entries pushed past any real
        distance (drop self: mpti.py:736)."""
        big_d = jnp.asarray(_BIG, d.dtype)
        d = jnp.where(eye, big_d, d)
        if valid is not None:
            d = jnp.where(valid[None, :], d, big_d)
        return d

    # ---- neighbour selection (detached) + per-row k-th distance ----
    if impl == "threshold":
        if compare_dtype is not None:
            # 16 value-space steps resolve the radius to ~1.5e-5 of the
            # range — below bf16's own resolution, so extra steps only
            # re-split ties the bf16 compare cannot distinguish anyway.
            # The convert fuses into the masked store: the detached
            # compare copy never exists in f32.
            sel_cmp = _masked(
                jax.lax.stop_gradient(sqd).astype(compare_dtype))
            n_iters = 16
        else:
            sel_cmp = _masked(jax.lax.stop_gradient(sqd))
            n_iters = 32
        if jax.default_backend() == "tpu":
            # one tiled VMEM pass instead of n_iters HBM passes
            from r3dfsseg_tpu.ops.pallas_kth import kth_smallest_per_row_pallas
            radius = kth_smallest_per_row_pallas(sel_cmp, k, iters=n_iters)
        else:
            radius = _kth_smallest_per_row(sel_cmp, k, iters=n_iters)
        kth = radius.astype(jnp.float32)
        idx = None
    elif impl == "topk":
        sel = _masked(jax.lax.stop_gradient(sqd).astype(jnp.float32))
        topk_mask, kth = _exact_topk_select(sel, k)
    else:
        raise NotImplementedError(f"unknown affinity impl {impl!r}")

    # Graph storage dtype: the relaxed threshold path keeps the similarity
    # matrix (and everything until the solver's bf16 matvec copy) at
    # compare_dtype; parity paths stay f32.
    out_dtype = (compare_dtype
                 if compare_dtype is not None and impl == "threshold"
                 else jnp.float32)

    if method == "gaussian":
        if sigma <= 0:
            # auto bandwidth: sigma^2 = (median valid-row k-th sqdist) / 4
            # (k-th neighbour weight exp(-2) at any feature scale).
            r = kth.reshape(-1)
            ok = valid if valid is not None else jnp.ones((n,), bool)
            srt = jnp.sort(jnp.where(ok, r, jnp.inf))
            nv = jnp.sum(ok.astype(jnp.int32))
            med = srt[jnp.clip((nv - 1) // 2, 0, n - 1)]
            sigma2 = jax.lax.stop_gradient(jnp.maximum(med / 4.0, 1e-12))
        else:
            sigma2 = sigma * sigma
        # exp runs in f32 (one fused upconvert), the store rounds once
        sim_full = jnp.exp(
            -0.5 * sqd.astype(jnp.float32) / sigma2).astype(out_dtype)
    elif method == "cosine":
        norm = f32 / (jnp.linalg.norm(f32, axis=-1, keepdims=True) + 1e-12)
        sim_full = jnp.einsum("nc,mc->nm", norm, norm,
                              preferred_element_type=jnp.float32
                              ).astype(out_dtype)
    else:
        raise NotImplementedError(f"unknown affinity method {method!r}")

    if impl == "threshold":
        # Symmetrise WITHOUT a transpose: sqd is numerically symmetric
        # (one gram, uniform accumulation order), so sim_ji == sim_ij and
        # (A_knn + A_knn^T)_ij = sim_ij * ((d_ij <= r_i) + (d_ij <= r_j)).
        # The elementwise form replaces `a + a.T` — whose (4396^2) operand
        # needed a physical layout-transpose copy in BOTH fwd and bwd
        # (~125 us each at bf16 on v5e) — with one fused pass over the
        # local tile.  Invalid rows disagree with their mirrored columns
        # under _masked, but the v_i*v_j factor below zeroes exactly those
        # entries, so the result matches the transpose form bit-for-bit
        # (tests/test_ops.py::test_threshold_affinity_no_transpose_form).
        cnt = ((sel_cmp <= radius).astype(out_dtype)
               + (sel_cmp <= radius.reshape(1, -1)).astype(out_dtype))
        a = sim_full * cnt
    else:
        a_knn = sim_full * topk_mask.astype(jnp.float32)
        a = a_knn + a_knn.T                          # symmetrise (mpti.py:752)
    a = jnp.where(eye, jnp.zeros((), a.dtype), a)    # zero diagonal (mpti.py:754-755)
    if valid is not None:
        v = valid.astype(a.dtype)
        a = a * v[:, None] * v[None, :]
    return a


def _exact_topk_select(sel: Array, k: int) -> tuple:
    """Selection-equivalent replacement for `lax.top_k` on a non-negative
    f32 distance matrix: returns (mask, kth) where `mask` (N, N) bool has
    EXACTLY k True per row — the k smallest entries, with exact-value ties
    at the k-th distance admitted lowest-index-first, lax.top_k's stable
    tie rule — and `kth` (N, 1) is the exact per-row k-th smallest value.

    Why not top_k: at the LP graph shape (4396 rows x 4396, k=200) the
    sort-based `lax.top_k` + (N, k) scatter measured 68 ms/step on v5e —
    the single largest cost of parity-mode training.  The bit pattern of
    a non-negative f32 is order-monotonic as int32, so 31 integer
    bisection steps on bitcast values converge to the EXACT k-th value
    (not a bracket like the threshold path's 16/32 value-space steps),
    and the tie budget t = k - |{d < kth}| is spent on the lowest tied
    indices via one row cumsum.  31 compare+count passes + 1 cumsum +
    1 compare ~ 5 ms.  The selected SET equals lax.top_k's output
    exactly, so the dense affinity built from it is bit-identical to the
    gather/scatter form it replaces (pinned by
    tests/test_ops.py::test_exact_topk_select_matches_lax_top_k).
    """
    bits = jax.lax.bitcast_convert_type(sel, jnp.int32)  # monotonic: sel >= 0
    n = sel.shape[0]

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // 2
        cnt = jnp.sum((bits <= mid).astype(jnp.int32), axis=1, keepdims=True)
        ge = cnt >= k
        return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

    # invariant: count(<= lo) < k <= count(<= hi); bits >= 0 so lo=-1 works
    lo0 = jnp.full((n, 1), -1, jnp.int32)
    hi0 = jnp.max(bits, axis=1, keepdims=True)
    _, kth_bits = jax.lax.fori_loop(0, 31, body, (lo0, hi0))
    less = bits < kth_bits
    tie = bits == kth_bits
    t = k - jnp.sum(less.astype(jnp.int32), axis=1, keepdims=True)
    tie_rank = jnp.cumsum(tie.astype(jnp.int32), axis=1)
    mask = less | (tie & (tie_rank <= t))
    kth = jax.lax.bitcast_convert_type(kth_bits, jnp.float32)
    return mask, kth


@jax.custom_vjp
def _centered_sqdist(xb: Array, xx: Array) -> Array:
    """f32 squared distances from the centered low-precision gram:
    max(xx - 2 xb@xb^T + xx^T, 0) with the gram's f32 MXU accumulation.

    Custom VJP (active only on this relaxed path): the (N, N) cotangent
    feeds the backward dots at the graph's compare dtype instead of f32 —
    a gradient-side-only quantisation in the same class as the bf16
    scatter backward — which halves the three full-matrix backward passes
    (cotangent store + two dot reads + the xx reduce) at N=4396."""
    inner = jnp.einsum("nc,mc->nm", xb, xb,
                       preferred_element_type=jnp.float32)
    # (xx + xx^T) - 2*inner: exactly symmetric (see ops/knn.py) — the
    # no-transpose symmetrise in local_constrained_affinity relies on it.
    return jnp.maximum((xx + xx.T) - 2.0 * inner, 0.0)


def _cs_fwd(xb, xx):
    out = _centered_sqdist(xb, xx)
    return out, (xb, out)


def _cs_bwd(res, g):
    xb, out = res
    # clip mask from the saved output: out == 0 iff raw <= 0 (the raw == 0
    # boundary is measure-zero and its subgradient choice is arbitrary)
    gb = jnp.where(out > 0.0, g, 0.0).astype(xb.dtype)
    # inner = xb @ xb^T  =>  d_xb = -2 (gb + gb^T) @ xb; the transpose is
    # free inside the dot dimension numbers
    d_xb = -2.0 * (
        jnp.einsum("nm,mc->nc", gb, xb, preferred_element_type=jnp.float32)
        + jnp.einsum("mn,mc->nc", gb, xb,
                     preferred_element_type=jnp.float32))
    rs = jnp.sum(gb, axis=1, dtype=jnp.float32)
    cs = jnp.sum(gb, axis=0, dtype=jnp.float32)
    d_xx = (rs + cs)[:, None]
    return d_xb.astype(xb.dtype), d_xx


_centered_sqdist.defvjp(_cs_fwd, _cs_bwd)


def _kth_smallest_per_row(d: Array, k: int, iters: int = 32,
                          hi: Array | None = None) -> Array:
    """Per-row k-th smallest value via vectorised bisection on the value
    range.  Each iteration is one elementwise pass + row-sum over the
    matrix — bandwidth-bound, no sort.  Returns (N, 1), the smallest
    per-row radius t with |{j : d_ij <= t}| >= k (up to f32 bisection
    resolution, biased upward so at least k neighbours survive).

    ``hi`` optionally fixes the bisection's upper bound (default: max
    finite entry of d).  The node-sharded path passes the pmax over all
    row blocks so every device bisects the same interval and the sharded
    radii match the unsharded ones bit-for-bit."""
    if hi is None:
        finite = jnp.where(d >= 0.5 * _BIG, -jnp.inf, d)
        hi = jnp.maximum(
            jnp.max(jnp.where(jnp.isfinite(finite), finite, 0.0)), 1e-6)
    lo = jnp.zeros((d.shape[0], 1), jnp.float32)
    hi = jnp.full((d.shape[0], 1), 1.0, jnp.float32) * hi

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((d <= mid).astype(jnp.float32), axis=1, keepdims=True)
        ge = cnt >= k
        return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return hi


def _normalized_propagation_matrix(a: Array) -> Array:
    """S = D^-1/2 A D^-1/2 (mpti.py:769-772); zero-degree rows stay zero."""
    eps = jnp.asarray(jnp.finfo(jnp.float64).eps, jnp.float32)  # np.finfo(float).eps
    d = jnp.sum(a, axis=1)
    d_inv_sqrt = jnp.sqrt(1.0 / (d + eps))
    return a * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]


@partial(jax.jit, static_argnames=("alpha", "solver", "cg_iters",
                                   "matvec_dtype", "adjoint_iters"))
def label_propagate(
    a: Array,
    y: Array,
    alpha: float = 0.99,
    *,
    solver: str = "cg",
    cg_iters: int = 50,
    matvec_dtype=None,
    adjoint_iters: int | None = None,
) -> Array:
    """Closed-form label propagation Z = (I - alpha*S + eps)^-1 Y.

    Matches `label_propagate` (mpti.py:758-776) including the reference's
    broadcast `+ eps` on the *whole* matrix (not just the diagonal).

    solver='solve' is the dense-parity path; solver='cg' exploits symmetry
    and the tiny number of label columns — each iteration is one
    (N,N)x(N,n_classes) MXU matmul.

    matvec_dtype=bf16 stores S half-width for the CG/Chebyshev matvecs
    (accumulation stays f32): the solve is bandwidth-bound on re-reading S
    every iteration, so this halves its wall-clock.  It solves a 0.4%%-
    perturbed system (equivalent to quantising the affinity weights) —
    accuracy-validated by the A/B convergence run in BASELINE.md; f32
    (default) is the parity path.

    adjoint_iters (training-only relaxation): iteration count for the
    *adjoint* solve the backward pass runs through custom_linear_solve.
    The adjoint only shapes the gradient of the episode loss — its
    truncation error (cheby-30 ~ 1.6e-2 relative) lands on top of SGD
    noise, the same error class the round-1 CG-30 *forward* ran with —
    while the forward solve keeps full accuracy for the argmax
    predictions.  None (default) = same as cg_iters (parity behaviour).
    """
    eps = jnp.asarray(jnp.finfo(jnp.float64).eps, jnp.float32)
    if (matvec_dtype is not None and a.dtype == matvec_dtype
            and solver in ("cheby", "cg")):
        # Half-width affinity from the relaxed graph chain: normalise it
        # by ITS OWN degrees (f32 accumulation), round the scaled product
        # once.  The scale factors r_i stay f32 so the row sums of the
        # rounded S stay within quantisation (~0.4%) of 1 — Chebyshev's
        # eig(S) in [-1, 1] assumption holds to the same tolerance as the
        # existing s.astype(bf16) quantisation.  One bf16 read + one bf16
        # write instead of three f32 + one bf16 pass.
        d = jnp.sum(a, axis=1, dtype=jnp.float32)
        r = jnp.sqrt(1.0 / (d + eps))
        s_mv = (a.astype(jnp.float32)
                * r[:, None] * r[None, :]).astype(matvec_dtype)
        s = s_mv
    else:
        s = _normalized_propagation_matrix(a.astype(jnp.float32))
        s_mv = s.astype(matvec_dtype) if matvec_dtype is not None else s
    y = y.astype(jnp.float32)

    if solver == "solve":
        n = s.shape[0]
        m = jnp.eye(n, dtype=jnp.float32) - alpha * s + eps
        return jax.scipy.linalg.solve(m, y)

    if solver == "cheby":
        # Chebyshev semi-iteration on known spectral bounds: eig(S) in
        # [-1, 1] => eig(I - alpha*S) in [1-alpha, 1+alpha].  One matvec per
        # iteration and ZERO inner products — CG spends most of its TPU
        # wall-clock in 3 scalar reductions per step, Chebyshev spends none
        # (the eps*J rank-one term, ~2e-16, is dropped: invisible in f32).
        def matvec(z):
            sz = jnp.einsum("nm,mc->nc", s_mv, z,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            return z - alpha * sz

        # With symmetric=True custom_linear_solve already hands the adjoint
        # the *forward* matvec jaxpr (no transposed-orientation penalty);
        # the explicit tsolve exists only to truncate the adjoint iteration
        # count.  Verified end-to-end on v5e: train step scales ~39 us per
        # adjoint iteration (31.0 ms at 50 -> 29.4 ms at 2).
        t_iters = cg_iters if adjoint_iters is None else adjoint_iters

        # the kernel keeps S VMEM-resident: fine at the episode graph size
        # (4396^2 bf16 = 38 MB) but impossible for scene-scale graphs
        # (predict_scene can reach 20k+ nodes) — those take the XLA loop
        s_bytes = s_mv.shape[0] * s_mv.shape[1] * s_mv.dtype.itemsize
        use_kernel = (matvec_dtype is not None
                      and jax.default_backend() == "tpu"
                      and s_bytes <= 64 * 1024 * 1024
                      and os.environ.get("R3D_CHEBY_IMPL", "auto") != "xla")
        if use_kernel:
            # bf16 graph on TPU: run ALL iterations inside one pallas_call
            # with S VMEM-resident instead of re-streaming it from HBM per
            # matvec (ops/pallas_cheby.py; 3.85 vs 5.06 ms per 50-iter
            # solve on v5e).  f32 S (80 MB padded) exceeds the VMEM budget,
            # so the f32/CPU paths keep the XLA loop below.
            from r3dfsseg_tpu.ops.pallas_cheby import cheby_solve_pallas

            def solve_fn(_mv, b):
                return cheby_solve_pallas(s_mv, b, alpha,
                                          iters=max(cg_iters, 1))

            def tsolve(_mv, b):
                return cheby_solve_pallas(s_mv, b, alpha,
                                          iters=max(t_iters, 1))
        else:
            def solve_fn(mv, b):
                return _chebyshev(mv, b, 1.0 - alpha, 1.0 + alpha,
                                  iters=max(cg_iters, 1))

            def tsolve(_mv, b):
                return _chebyshev(matvec, b, 1.0 - alpha, 1.0 + alpha,
                                  iters=max(t_iters, 1))
        return jax.lax.custom_linear_solve(
            matvec, y, solve_fn, transpose_solve=tsolve, symmetric=True)

    if solver == "cg":
        def matvec(z):
            # (I - alpha*S + eps*J) z  without materialising eps*J.
            # HIGHEST precision: CG stalls at ~1e-2 residuals if the TPU
            # applies an f32 S with single-pass bf16 rounding.  (With
            # matvec_dtype=bf16 the *stored* S is quantised instead — a
            # perturbed system CG then solves accurately.)
            sz = jnp.einsum("nm,mc->nc", s_mv, z,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            return z - alpha * sz + eps * jnp.sum(z, axis=0)[None, :]

        def solve_fn(mv, b):
            return _block_cg(mv, b, iters=cg_iters)

        # As in the cheby branch: symmetric=True already reuses the forward
        # matvec for the adjoint; tsolve only truncates the iteration count.
        t_iters = cg_iters if adjoint_iters is None else adjoint_iters

        def tsolve(_mv, b):
            return _block_cg(matvec, b, iters=max(t_iters, 1))
        return jax.lax.custom_linear_solve(
            matvec, y, solve_fn, transpose_solve=tsolve, symmetric=True)

    raise NotImplementedError(f"unknown LP solver {solver!r}")


def _chebyshev(matvec, b: Array, lmin: float, lmax: float, iters: int) -> Array:
    """Chebyshev iteration for SPD systems with known eigenvalue bounds
    (Saad, 'Iterative Methods for Sparse Linear Systems', alg. 12.1).

    Differentiable: wrapped in custom_linear_solve by the caller via the
    same symmetric matvec.
    """
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta

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


def _block_cg(matvec, b: Array, iters: int, refresh: int = 25) -> Array:
    """Conjugate gradients on a block right-hand side, f32-robust.

    Plain f32 CG stalls (or NaNs) on the LP system (cond ~ 1/(1-alpha)):
    the recurred residual drifts from the true one.  Recomputing the true
    residual r = b - M z every ``refresh`` iterations restores convergence
    to ~1e-6 residuals while keeping every step an MXU matmul.
    """
    tiny = jnp.asarray(1e-30, jnp.float32)

    def body(i, carry):
        z, r, p, rs = carry
        mp = matvec(p)
        denom = jnp.sum(p * mp)
        alpha = rs / jnp.maximum(denom, tiny)
        z = z + alpha * p
        # every `refresh` steps replace the recurred residual with the true
        # one (the search direction p is kept — a full restart loses the
        # Krylov momentum and stalls at this conditioning).
        r = jax.lax.cond(
            (i + 1) % refresh == 0,
            lambda: b - matvec(z),
            lambda: r - alpha * mp,
        )
        rs_new = jnp.sum(r * r)
        beta = rs_new / jnp.maximum(rs, tiny)
        p = r + beta * p
        return z, r, p, rs_new

    z0 = jnp.zeros_like(b)
    z, _, _, _ = jax.lax.fori_loop(0, iters, body, (z0, b, b, jnp.sum(b * b)))
    return z
