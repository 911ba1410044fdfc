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

from functools import partial

import jax
import jax.numpy as jnp

from r3dfsseg_tpu.ops.knn import pairwise_sqdist

Array = jax.Array


def local_constrained_affinity(
    node_feat: Array,
    k: int,
    sigma: float = 1.0,
    *,
    valid: Array | None = None,
    method: str = "gaussian",
) -> Array:
    """Symmetric kNN affinity with zero diagonal (mpti.py:717-756).

    Args:
      node_feat: (N, C) node features (prototypes ++ query points).
      k: neighbours per node (`k_connect`).
      sigma: gaussian bandwidth (sim = exp(-0.5 * d^2 / sigma^2), mpti.py:746).
      valid: optional (N,) bool; invalid (padding) nodes get zero rows/cols
        and are never selected as neighbours.
      method: 'gaussian' | 'cosine' (mpti.py:742-746).
    Returns:
      (N, N) affinity matrix A = A_knn + A_knn^T with zero diagonal.
    """
    n = node_feat.shape[0]
    f32 = node_feat.astype(jnp.float32)
    # The reference detaches features for the faiss index build
    # (mpti.py:731) — neighbour *selection* carries no gradient, while the
    # similarity values do.
    sel = jax.lax.stop_gradient(f32)

    sqd_sel = pairwise_sqdist(sel)
    big = jnp.asarray(3.4e38, jnp.float32)
    eye = jnp.eye(n, dtype=bool)
    sqd_sel = jnp.where(eye, big, sqd_sel)          # drop self (I[:, 1:], mpti.py:736)
    if valid is not None:
        sqd_sel = jnp.where(valid[None, :], sqd_sel, big)
    _, idx = jax.lax.top_k(-sqd_sel, k)             # (N, k)

    if method == "gaussian":
        # differentiable similarity on the selected edges
        sqd = pairwise_sqdist(f32)
        edge_sqd = jnp.take_along_axis(sqd, idx, axis=1)       # (N, k)
        sim = jnp.exp(-0.5 * edge_sqd / (sigma * sigma))
    elif method == "cosine":
        norm = f32 / (jnp.linalg.norm(f32, axis=-1, keepdims=True) + 1e-12)
        cos = jnp.einsum("nc,mc->nm", norm, norm,
                         preferred_element_type=jnp.float32)
        sim = jnp.take_along_axis(cos, idx, axis=1)
    else:
        raise NotImplementedError(f"unknown affinity method {method!r}")

    a = jnp.zeros((n, n), jnp.float32).at[jnp.arange(n)[:, None], idx].set(sim)
    a = a + a.T                                      # symmetrise (mpti.py:752)
    a = jnp.where(eye, 0.0, a)                       # zero diagonal (mpti.py:754-755)
    if valid is not None:
        v = valid.astype(jnp.float32)
        a = a * v[:, None] * v[None, :]
    return a


def _normalized_propagation_matrix(a: Array) -> Array:
    """S = D^-1/2 A D^-1/2 (mpti.py:769-772); zero-degree rows stay zero."""
    eps = jnp.asarray(jnp.finfo(jnp.float64).eps, jnp.float32)  # np.finfo(float).eps
    d = jnp.sum(a, axis=1)
    d_inv_sqrt = jnp.sqrt(1.0 / (d + eps))
    return a * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]


@partial(jax.jit, static_argnames=("solver", "cg_iters"))
def label_propagate(
    a: Array,
    y: Array,
    alpha: float = 0.99,
    *,
    solver: str = "cg",
    cg_iters: int = 50,
) -> Array:
    """Closed-form label propagation Z = (I - alpha*S + eps)^-1 Y.

    Matches `label_propagate` (mpti.py:758-776) including the reference's
    broadcast `+ eps` on the *whole* matrix (not just the diagonal).

    solver='solve' is the dense-parity path; solver='cg' exploits symmetry
    and the tiny number of label columns — each iteration is one
    (N,N)x(N,n_classes) MXU matmul.
    """
    eps = jnp.asarray(jnp.finfo(jnp.float64).eps, jnp.float32)
    s = _normalized_propagation_matrix(a.astype(jnp.float32))
    y = y.astype(jnp.float32)

    if solver == "solve":
        n = s.shape[0]
        m = jnp.eye(n, dtype=jnp.float32) - alpha * s + eps
        return jax.scipy.linalg.solve(m, y)

    if solver == "cg":
        def matvec(z):
            # (I - alpha*S + eps*J) z  without materialising eps*J.
            # HIGHEST precision: CG stalls at ~1e-2 residuals if the TPU
            # applies S with single-pass bf16 rounding.
            sz = jnp.einsum("nm,mc->nc", s, z,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            return z - alpha * sz + eps * jnp.sum(z, axis=0)[None, :]

        def solve_fn(mv, b):
            return _block_cg(mv, b, iters=cg_iters)

        # custom_linear_solve(symmetric=True) reuses the same CG for the
        # adjoint, making Z differentiable w.r.t. A and Y.
        return jax.lax.custom_linear_solve(matvec, y, solve_fn, symmetric=True)

    raise NotImplementedError(f"unknown LP solver {solver!r}")


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
