"""Fused attention kernel vs the XLA reference path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp


def _interp_attention(q, k, v, seed, tau, rate, train, tq=16):
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from r3dfsseg_tpu.ops import pallas_attention as pa

    b, n, d = q.shape
    return pl.pallas_call(
        functools.partial(pa._attn_fwd_kernel, tau=tau, rate=rate, train=train),
        out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n // tq),
            in_specs=[
                pl.BlockSpec((1, tq, d), lambda b_, t_, s_: (b_, t_, 0)),
                pl.BlockSpec((1, n, d), lambda b_, t_, s_: (b_, 0, 0)),
                pl.BlockSpec((1, n, d), lambda b_, t_, s_: (b_, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, tq, d), lambda b_, t_, s_: (b_, t_, 0)),
        ),
        interpret=True,
    )(jnp.asarray([seed], jnp.int32), q, k, v)


def test_fused_attention_matches_xla(rng):
    b, n, d = 2, 32, 8
    q = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    tau = float(np.sqrt(d))
    got = np.asarray(_interp_attention(q, k, v, 0, tau, 0.1, False))
    attn = jax.nn.softmax(jnp.einsum("bnd,bmd->bnm", q / tau, k), -1)
    want = np.asarray(jnp.einsum("bnm,bmd->bnd", attn, v))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_selfattention_module_eval_uses_same_math(rng):
    """The flax module's xla path == kernel math (module-level check on CPU,
    where attn_impl='auto' resolves to 'xla')."""
    from r3dfsseg_tpu.nn import SelfAttention
    x = jnp.asarray(rng.normal(size=(2, 32, 16)).astype(np.float32))
    m = SelfAttention(8, attn_dropout=0.1)
    var = m.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)}, x, train=False)
    y = m.apply(var, x, train=False)
    q = x @ var["params"]["q_map"]["kernel"]
    k = x @ var["params"]["k_map"]["kernel"]
    v = x @ var["params"]["v_map"]["kernel"]
    attn = jax.nn.softmax(jnp.einsum("bnd,bmd->bnm", q / np.sqrt(8), k), -1)
    want = jnp.einsum("bnm,bmd->bnd", attn, v)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
