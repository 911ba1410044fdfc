"""VMEM-resident multi-iteration Chebyshev LP solve kernel for TPU.

The XLA Chebyshev path (`ops/lp.py:_chebyshev`) re-streams the ~38 MB
normalized propagation matrix S from HBM once per iteration — at 50
forward + 30 adjoint iterations per train step that is ~3 GB of HBM
traffic for a matrix that fits in VMEM.  This kernel loads S into VMEM
once and runs ALL iterations on the resident copy; the per-iteration
matvec is a single (M, M) x (M, ncols) MXU dot against f32 scratch
iterates.  Measured on v5e at the production shape (m=4396, 50 iters,
bf16 S): 3.85 ms/solve vs 5.06 ms for the XLA loop (42 vs 72 us/matvec).

Semantics: identical Chebyshev recurrence as `_chebyshev` (Saad alg.
12.1) on the system (I - alpha*S) x = b with spectral bounds
[1-alpha, 1+alpha]; the only numerical delta vs the XLA bf16-matvec
path is that the direction vector d is rounded to S's dtype before the
MXU dot (single-pass bf16 x bf16) instead of a mixed bf16 x f32
HIGHEST-precision product — measured end-to-end rel err ~1e-3, the same
error class as the bf16 matvec storage already validated in BASELINE.md.

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
                  alpha: float, iters: int):
    lmin, lmax = 1.0 - alpha, 1.0 + alpha
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta

    r_s[:] = b_ref[:]
    d_s[:] = r_s[:] * (1.0 / theta)
    x_s[:] = d_s[:]

    def body(i, rho):
        sd = jnp.dot(s_ref[:], d_s[:].astype(s_ref.dtype),
                     preferred_element_type=jnp.float32)
        md = d_s[:] - alpha * sd                 # (I - alpha*S) d
        r_s[:] = r_s[:] - md
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        d_s[:] = (rho_new * rho) * d_s[:] + (2.0 * rho_new / delta) * r_s[:]
        x_s[:] = x_s[:] + d_s[:]
        return rho_new

    jax.lax.fori_loop(0, iters - 1, body, 1.0 / sigma1)
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
        functools.partial(_cheby_kernel, alpha=alpha, iters=iters),
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
