"""VMEM-resident multi-iteration Chebyshev LP solve kernel for TPU.

The XLA Chebyshev path (`ops/lp.py:_chebyshev`) re-streams the ~38 MB
normalized propagation matrix S from HBM once per iteration — at 50
forward + 30 adjoint iterations per train step that is ~3 GB of HBM
traffic for a matrix that fits in VMEM.  This kernel loads S into VMEM
once and runs ALL iterations on the resident copy; the per-iteration
matvec is a single (M, M) x (M, ncols) MXU dot against f32 scratch
iterates.  Measured on v5e at the production shape (m=4396, 50 iters,
bf16 S): 2.68 ms/solve vs 5.06 ms for the XLA loop.

Semantics: identical Chebyshev recurrence as `_chebyshev` (Saad alg.
12.1) on the system (I - alpha*S) x = b with spectral bounds
[1-alpha, 1+alpha].  With a bf16 S the direction vector goes through
the MXU as a SPLIT-bf16 pair (hi = bf16(d), lo = bf16(d - hi)),
giving ~16 effective mantissa bits — measured end-to-end rel err
~6e-4, i.e. limited by S's own bf16 storage exactly like the XLA
mixed-precision matvec it replaces.  A plain single-dot bf16 rounding
of d was measured to degrade meta-training (BASELINE.md seed table)
via compounding recurrence noise in the adjoint solve.  Because the
live RHS columns (n_way+1 = 3) fit in half the 128-lane-padded width,
hi and lo pack into ONE cp-wide operand: full split precision at
single-dot MXU cost, and the recurrence's VPU updates run half-width
— 2.68 ms/solve vs 3.85 for the original full-width single-dot.

Used by `label_propagate` (reference: the dense ~4.4k^2 inverse at
`/root/reference/models/mpti.py:775`) when the graph runs in bf16 on
TPU; the f32 XLA loop remains the fallback everywhere else.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _cheby_kernel(s_ref, b_ref, out_ref, x_s, r_s, d_s, *,
                  alpha: float, iters: int, ncols: int):
    lmin, lmax = 1.0 - alpha, 1.0 + alpha
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta

    r_s[:] = b_ref[:]
    d_s[:] = r_s[:] * (1.0 / theta)
    x_s[:] = d_s[:]

    cp = d_s.shape[1]
    h = cp // 2
    # Split-bf16 matvec (see module docstring).  When the live columns fit
    # in half the lane-padded width (always true for the LP use: 3 of 128),
    # hi and lo PACK into one cp-wide operand — full split precision at
    # single-dot MXU cost.  Recurrence updates then touch only [:, :h];
    # columns >= h of the scratches carry garbage that nothing reads.
    packed = s_ref.dtype != jnp.float32 and ncols <= h

    def body_packed(i, rho):
        d = d_s[:, :h]
        hi = d.astype(s_ref.dtype)
        lo = (d - hi.astype(jnp.float32)).astype(s_ref.dtype)
        sd2 = jnp.dot(s_ref[:], jnp.concatenate([hi, lo], axis=1),
                      preferred_element_type=jnp.float32)
        sd = sd2[:, :h] + sd2[:, h:]
        md = d - alpha * sd                      # (I - alpha*S) d
        r_s[:, :h] = r_s[:, :h] - md
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        d_s[:, :h] = (rho_new * rho) * d + (2.0 * rho_new / delta) * r_s[:, :h]
        x_s[:, :h] = x_s[:, :h] + d_s[:, :h]
        return rho_new

    def body(i, rho):
        d = d_s[:]
        hi = d.astype(s_ref.dtype)
        sd = jnp.dot(s_ref[:], hi, preferred_element_type=jnp.float32)
        if s_ref.dtype != jnp.float32:  # wide-RHS split: pay the lo dot
            lo = (d - hi.astype(jnp.float32)).astype(s_ref.dtype)
            sd = sd + jnp.dot(s_ref[:], lo, preferred_element_type=jnp.float32)
        md = d - alpha * sd                      # (I - alpha*S) d
        r_s[:] = r_s[:] - md
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        d_s[:] = (rho_new * rho) * d + (2.0 * rho_new / delta) * r_s[:]
        x_s[:] = x_s[:] + d_s[:]
        return rho_new

    jax.lax.fori_loop(0, iters - 1, body_packed if packed else body,
                      1.0 / sigma1)
    out_ref[:] = x_s[:]


@functools.partial(jax.jit,
                   static_argnames=("alpha", "iters", "interpret"))
def cheby_solve_pallas(s: Array, b: Array, alpha: float, iters: int,
                       interpret: bool = False) -> Array:
    """Solve (I - alpha*S) x = b by `iters` Chebyshev iterations.

    Args:
      s: (M, M) symmetric normalized propagation matrix (bf16 or f32);
        padding rows/cols, if any, must be zero.
      b: (M, ncols) f32 right-hand side.
      alpha: propagation strength (static; spectral bounds follow).
      iters: total iteration count (static), matching `_chebyshev`.
    Returns:
      (M, ncols) f32 solution.
    """
    # The solve is only ever *evaluated* (custom_linear_solve supplies the
    # gradient via the transpose solve) — cut any incoming tangents so the
    # pallas_call never gets JVP-traced.
    s = jax.lax.stop_gradient(s)
    b = jax.lax.stop_gradient(b).astype(jnp.float32)
    m, ncols = b.shape
    mp = ((m + 127) // 128) * 128
    cp = ((ncols + 127) // 128) * 128
    sp = s if mp == m else (
        jnp.zeros((mp, mp), s.dtype).at[:m, :m].set(s))
    bp = b if (mp == m and cp == ncols) else (
        jnp.zeros((mp, cp), jnp.float32).at[:m, :ncols].set(b))
    out = pl.pallas_call(
        functools.partial(_cheby_kernel, alpha=alpha, iters=iters,
                          ncols=ncols),
        out_shape=jax.ShapeDtypeStruct((mp, cp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((mp, cp), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(sp, bp)
    return out[:m, :ncols]
