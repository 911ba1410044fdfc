"""VMEM-resident Chebyshev LP solve kernel vs the XLA loop (interpret)."""
import numpy as np
import jax.numpy as jnp

from r3dfsseg_tpu.ops.lp import _chebyshev
from r3dfsseg_tpu.ops.pallas_cheby import cheby_solve_pallas


def _lp_system(rng, m):
    a = rng.random((m, m)).astype(np.float32)
    a = (a + a.T) * 0.5
    np.fill_diagonal(a, 0.0)
    deg = a.sum(1)
    s = a / np.sqrt(np.outer(deg, deg))
    b = np.zeros((m, 3), np.float32)
    b[rng.choice(m, size=m // 4, replace=False), 0] = 1.0
    b[rng.choice(m, size=m // 4, replace=False), 1] = 1.0
    return jnp.asarray(s), jnp.asarray(b)


def _xla_solve(s, b, alpha, iters):
    def matvec(z):
        return z - alpha * (s @ z)
    return _chebyshev(matvec, b, 1.0 - alpha, 1.0 + alpha, iters=iters)


def test_cheby_pallas_matches_xla_f32(rng):
    # m = 96: not a multiple of 128, so the padding path is exercised;
    # f32 S + interpret mode -> the recurrences are bit-comparable.
    s, b = _lp_system(rng, 96)
    alpha = 0.99
    want = np.asarray(_xla_solve(s, b, alpha, 40))
    got = np.asarray(cheby_solve_pallas(s, b, alpha, 40, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_cheby_pallas_bf16_graph(rng):
    # bf16 S (the production gating): the direction vector goes through
    # the MXU as a split-bf16 hi/lo pair, so the kernel must match the
    # XLA mixed-precision matvec (bf16 S x f32 d) to much better than
    # single-dot bf16 rounding (~2e-2); the residual error is S's own
    # bf16 storage.
    s, b = _lp_system(rng, 128)
    alpha = 0.99
    sb = s.astype(jnp.bfloat16)
    want = np.asarray(_xla_solve(sb, b, alpha, 60))
    got = np.asarray(cheby_solve_pallas(sb, b, alpha, 60, interpret=True))
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-30)
    assert err < 2e-3, err
    # And against the true f32 solution: bf16-storage-class error only.
    want_f32 = np.asarray(_xla_solve(s, b, alpha, 60))
    err = np.max(np.abs(got - want_f32)) / (np.max(np.abs(want_f32)) + 1e-30)
    assert err < 2e-2, err


def test_cheby_pallas_converges_to_direct_solve(rng):
    s, b = _lp_system(rng, 64)
    alpha = 0.9
    m = np.eye(64, dtype=np.float32) - alpha * np.asarray(s)
    want = np.linalg.solve(m, np.asarray(b))
    got = np.asarray(cheby_solve_pallas(s, b, alpha, 200, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
