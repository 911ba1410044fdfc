"""One-pass Pallas FPS kernel vs the XLA fori_loop path (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from r3dfsseg_tpu.ops.fps import masked_fps
from r3dfsseg_tpu.ops.pallas_fps import masked_fps_pallas


def _case(rng, n, c, n_valid, k):
    # well-separated points: no distance ties, so both paths must agree
    # on the exact index sequence.
    feat = rng.normal(size=(n, c)).astype(np.float32) * 10.0
    valid = np.zeros((n,), bool)
    valid[rng.choice(n, size=n_valid, replace=False)] = True
    got = np.asarray(masked_fps_pallas(jnp.asarray(feat),
                                       jnp.asarray(valid), k,
                                       interpret=True))
    want_idx, want_valid = masked_fps(jnp.asarray(feat), jnp.asarray(valid), k)
    want_idx = np.asarray(want_idx)
    nv = min(k, n_valid)
    np.testing.assert_array_equal(got[:nv], want_idx[:nv])
    assert np.asarray(want_valid).sum() == nv
    # selected seeds are valid and unique
    assert valid[got[:nv]].all()
    assert len(set(got[:nv].tolist())) == nv


def test_pallas_fps_matches_xla(rng):
    _case(rng, 128, 16, 100, 8)


def test_pallas_fps_fewer_valid_than_k(rng):
    # n_valid < k: trailing slots repeat already-chosen valid points
    feat = rng.normal(size=(64, 8)).astype(np.float32) * 10.0
    valid = np.zeros((64,), bool)
    valid[[3, 17, 40]] = True
    got = np.asarray(masked_fps_pallas(jnp.asarray(feat),
                                       jnp.asarray(valid), 6,
                                       interpret=True))
    want_idx, _ = masked_fps(jnp.asarray(feat), jnp.asarray(valid), 6)
    np.testing.assert_array_equal(got[:3], np.asarray(want_idx)[:3])
    assert valid[got].all()     # padding slots still point at valid points


def test_pallas_fps_under_vmap(rng):
    feat = rng.normal(size=(3, 96, 8)).astype(np.float32) * 10.0
    valid = np.ones((3, 96), bool)
    valid[1, 50:] = False
    got = np.asarray(jax.vmap(
        lambda f, v: masked_fps_pallas(f, v, 5, interpret=True))(
            jnp.asarray(feat), jnp.asarray(valid)))
    for b in range(3):
        want_idx, _ = masked_fps(jnp.asarray(feat[b]), jnp.asarray(valid[b]), 5)
        np.testing.assert_array_equal(got[b], np.asarray(want_idx))
