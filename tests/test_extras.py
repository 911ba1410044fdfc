"""Tests for the auxiliary components: non-local block, seg heads v1/v2,
background pcd sampling, pretrain CLI pipeline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from r3dfsseg_tpu.nn import DGCNNSegAttention, NonLocalBlock


@pytest.mark.parametrize("mode", ["gaussian", "embedded", "dot", "concatenate"])
def test_nonlocal_block_modes(rng, mode):
    x = jnp.asarray(rng.normal(size=(2, 16, 12)).astype(np.float32))
    m = NonLocalBlock(12, 6, mode=mode)
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    z, att = m.apply(v, x)
    assert z.shape == x.shape
    assert np.isfinite(np.asarray(z)).all()


def test_nonlocal_block_identity_at_init(rng):
    # zero-initialised BN scale => residual block starts as identity
    # (attention.py:99-101)
    x = jnp.asarray(rng.normal(size=(2, 16, 12)).astype(np.float32))
    m = NonLocalBlock(12, 6, mode="embedded")
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    z, _ = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("v2", [False, True])
def test_seg_head_variants(rng, v2):
    m = DGCNNSegAttention(
        num_classes=5, edgeconv_widths=((8, 8), (8, 8), (8, 8)),
        dgcnn_mlp_widths=(16, 16), dgcnn_k=4, atten_dim=8, v2=v2)
    x = jnp.asarray(rng.normal(size=(2, 32, 9)).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x)
    logits = m.apply(v, x)
    assert logits.shape == (2, 32, 5)
    logits2, feat = m.apply(v, x, return_feat=True)
    assert feat.shape[-1] == 8 + 8  # level1 + attention


def test_bg_pcd_sampling(tmp_path):
    from r3dfsseg_tpu.data import NoisyEpisodeSampler
    from r3dfsseg_tpu.data.synthetic import make_synthetic_dataset
    ds = make_synthetic_dataset(str(tmp_path / "blocks"), n_scans=40,
                                pts_per_scan=512, seed=5)
    s = NoisyEpisodeSampler(ds, "s3dis", cvfold=0, n_way=2, k_shot=2,
                            n_queries=1, mode="train", num_point=64,
                            noise_ratio=[0.0], seed=3)
    ep = s.sample()
    pcds, masks = s.sample_bg_pcds(ep.sampled_classes.tolist(), [])
    assert pcds.shape == (4, 64, 9)      # 4 bg classes x 1 pcd (loader.py:856-857)
    assert masks.shape == (4, 64)
    assert (masks.sum(-1) > 0).all()     # every bg pcd has its own class fg
