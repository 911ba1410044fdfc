#!/usr/bin/env python
"""On-TPU consistency check for the fused-attention dropout mask.

For a fixed seed the kernel output y(v) is LINEAR in v with Jacobian
J = Pd (the dropped-out attention matrix from the forward), so
    <dy, y(v + dv) - y(v)>  ==  <vjp(dy), dv>
holds EXACTLY iff the backward regenerates the same dropout mask the
forward applied.  N > 256 exercises the multi-tile PRNG seeding (the
round-1 bug: fwd tile 512 vs bwd tile 256 produced different masks).

Run on the real chip: `python scripts/check_attn_dropout.py`.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from r3dfsseg_tpu.ops.pallas_attention import fused_attention


def main():
    if jax.default_backend() != "tpu":
        print("SKIP: needs a TPU backend")
        return 0
    rng = np.random.default_rng(0)
    ok = True
    for dtype, tol in ((jnp.float32, 1e-3), (jnp.bfloat16, 3e-2)):
        for n in (256, 512, 2048):
            b, d = 2, 64
            q, k, v, dv, dy = (
                jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
                .astype(dtype) for _ in range(5))
            f = lambda v_: fused_attention(   # noqa: E731
                q, k, v_, jnp.int32(1234), float(np.sqrt(d)), 0.5, True)
            y0, y1 = f(v), f(v + dv)
            dy32 = dy.astype(jnp.float32)
            lhs = float(jnp.sum(dy32 * (y1 - y0)))    # linear in v: exact
            _, vjp = jax.vjp(f, v)
            (dv_grad,) = vjp(dy32)
            rhs = float(jnp.sum(dv_grad.astype(jnp.float32)
                                * dv.astype(jnp.float32)))
            rel = abs(lhs - rhs) / max(abs(lhs), 1e-9)
            print(f"{jnp.dtype(dtype).name} N={n}: <dy, J dv>={lhs:.6f}  "
                  f"<J^T dy, dv>={rhs:.6f} rel={rel:.2e}")
            # bf16 tolerance: the identity is exact only up to the bf16
            # rounding of the P.V and dv accumulation paths
            ok &= rel < tol
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
