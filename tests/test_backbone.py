"""Backbone parity: flax FeatureExtractor vs the PyTorch reference modules
driven with identical (converted) weights.

The reference's dgcnn.py/attention.py import only torch, so we can load
them directly from /root/reference for an apples-to-apples check.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

# scope the reference-path insertion to the import: a lingering
# /root/reference entry makes a later `import eval_noise` resolve to the
# REFERENCE's same-named file (order-dependent failure, VERDICT r3 weak #6)
sys.path.insert(0, "/root/reference")
try:
    from models.dgcnn import DGCNN as TorchDGCNN  # noqa: E402
    from models.attention import SelfAttention as TorchSelfAttention  # noqa: E402
finally:
    sys.path.remove("/root/reference")

from r3dfsseg_tpu.nn import FeatureExtractor  # noqa: E402
from r3dfsseg_tpu.utils.torch_convert import convert_feature_extractor  # noqa: E402

EC = ((16, 16), (16, 16), (16, 16))
MLP = (32, 24)
BASE = (16, 8)
OUT = 8
K = 8
NPTS = 32
CIN = 9


class TorchBaseLearner(torch.nn.Module):
    """Equivalent of the reference BaseLearner (mpti.py:18-40), rebuilt here
    because mpti.py needs faiss/torch_cluster which this image lacks."""

    def __init__(self, in_channels, params):
        super().__init__()
        self.convs = torch.nn.ModuleList()
        for i, w in enumerate(params):
            in_dim = in_channels if i == 0 else params[i - 1]
            self.convs.append(torch.nn.Sequential(
                torch.nn.Conv1d(in_dim, w, 1), torch.nn.BatchNorm1d(w)))

    def forward(self, x):
        for i, conv in enumerate(self.convs):
            x = conv(x)
            if i != len(self.convs) - 1:
                x = torch.nn.functional.relu(x)
        return x


class TorchFeatureNet(torch.nn.Module):
    """getFeatures with attention (mpti.py:579-589)."""

    def __init__(self):
        super().__init__()
        self.encoder = TorchDGCNN([list(w) for w in EC], list(MLP), CIN, k=K)
        self.base_learner = TorchBaseLearner(MLP[-1], list(BASE))
        self.att_learner = TorchSelfAttention(MLP[-1], OUT)

    def forward(self, x):
        f1, f2 = self.encoder(x)
        f3 = self.base_learner(f2)
        att = self.att_learner(f2)
        return torch.cat((f1, att, f3), dim=1)


def _randomize_bn_stats(module, gen):
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.copy_(torch.from_numpy(
                gen.normal(size=m.running_mean.shape).astype(np.float32)) * 0.2)
            m.running_var.copy_(torch.from_numpy(
                gen.uniform(0.5, 2.0, size=m.running_var.shape).astype(np.float32)))


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    gen = np.random.default_rng(1)
    tnet = TorchFeatureNet()
    with torch.no_grad():
        _randomize_bn_stats(tnet, gen)
    tnet.eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, stats = convert_feature_extractor(
        sd, edgeconv_widths=EC, dgcnn_mlp_widths=MLP, base_widths=BASE,
        use_attention=True)
    fnet = FeatureExtractor(EC, MLP, BASE, OUT, dgcnn_k=K, use_attention=True)
    return tnet, fnet, {"params": params, "batch_stats": stats}


def test_feature_extractor_parity_eval(pair, rng):
    tnet, fnet, variables = pair
    x = rng.normal(size=(2, NPTS, CIN)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    got = np.asarray(fnet.apply(variables, jnp.asarray(x), train=False))
    assert got.shape == want.shape == (2, NPTS, EC[0][-1] + OUT + BASE[-1])
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=5e-3)


def test_feature_extractor_train_mode_runs(pair, rng):
    _, fnet, variables = pair
    x = jnp.asarray(rng.normal(size=(2, NPTS, CIN)).astype(np.float32))
    out, mut = fnet.apply(
        variables, x, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
    assert np.isfinite(np.asarray(out)).all()
    # running stats moved
    old = variables["batch_stats"]["encoder"]["mlp0"]["bn"]["mean"]
    new = mut["batch_stats"]["encoder"]["mlp0"]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_train_mode_batchnorm_matches_torch(pair, rng):
    """BN in train mode normalises over the cloud batch exactly like torch
    (dgcnn.py:53-55) — critical for meta-training parity."""
    tnet, fnet, variables = pair
    tnet.train()
    x = rng.normal(size=(4, NPTS, CIN)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    tnet.eval()
    # dropout in attention: torch train-mode applies dropout; compare with a
    # dropout-free flax pass against a dropout-disabled torch net instead.
    tnet.att_learner.dropout.p = 0.0
    tnet.train()
    with torch.no_grad():
        want = tnet(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    tnet.eval()
    fnet_nodrop = FeatureExtractor(EC, MLP, BASE, OUT, dgcnn_k=K,
                                   use_attention=True, attn_dropout=0.0)
    got, _ = fnet_nodrop.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)})
    got = np.asarray(got)
    # Batch-stat normalisation divides by per-channel batch std; channels
    # whose edge features are nearly constant amplify f32 matmul-order
    # noise by 1/std and the amplification compounds across the 6 BN
    # layers, so elementwise equality is unattainable even between two
    # torch builds.  Assert relative agreement of the signal instead.
    err = got - want
    rel_rmse = np.sqrt((err ** 2).mean()) / np.sqrt((want ** 2).mean())
    assert rel_rmse < 5e-2, rel_rmse
    assert np.median(np.abs(err)) < 1e-2


def test_train_mode_bn_running_stats_match_torch(pair, rng):
    """The BN *statistics* path has no 1/std amplification: after one train
    step the updated running mean/var must match torch (momentum 0.1,
    unbiased running var)."""
    tnet, fnet, variables = pair
    x = rng.normal(size=(4, NPTS, CIN)).astype(np.float32)
    import copy
    tnet2 = copy.deepcopy(tnet)
    tnet2.train()
    with torch.no_grad():
        tnet2(torch.from_numpy(x.transpose(0, 2, 1)))
    tnet2.eval()
    _, mut = fnet.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)})
    # first edgeconv's first BN layer: identical input -> identical stats
    want_m = tnet2.encoder.edge_convs[0].layer[1].running_mean.numpy()
    want_v = tnet2.encoder.edge_convs[0].layer[1].running_var.numpy()
    got_m = np.asarray(
        mut["batch_stats"]["encoder"]["edgeconv0"]["layer0"]["bn"]["mean"])
    got_v = np.asarray(
        mut["batch_stats"]["encoder"]["edgeconv0"]["layer0"]["bn"]["var"])
    np.testing.assert_allclose(got_m, want_m, rtol=1e-3, atol=1e-5)
    # torch keeps the *unbiased* variance in running stats while flax keeps
    # the biased one; with B*N*K samples the correction is ~1/(B*N*K).
    n = 4 * NPTS * K
    np.testing.assert_allclose(got_v * n / (n - 1), want_v, rtol=2e-3, atol=1e-5)


def test_bn_mode_precision_contract():
    """bn_mode pins the BatchNorm precision independently of the encoder
    compute dtype.  The default is 'fastvar' (f32 single-pass stats + f32
    outputs — convergence A/B in-band, BASELINE.md round-2, and identical
    to 'exact' without a bf16 compute dtype, pinned by
    test_bn_mode_hybrid_is_exact_in_f32); the bf16-output modes cost ~0.1
    mean-IoU (BASELINE.md A/B) and stay opt-in."""
    import jax
    import jax.numpy as jnp
    from r3dfsseg_tpu.config import R3DConfig
    from r3dfsseg_tpu.nn.dgcnn import ConvBN

    assert R3DConfig().bn_mode == "fastvar"

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 16, 8)).astype(np.float32))
    outs = {}
    for mode in ("exact", "fastvar", "stats", "relaxed"):
        m = ConvBN(4, dtype=jnp.bfloat16, bn_mode=mode)
        v = m.init(jax.random.PRNGKey(0), x, train=True)
        y = m.apply(v, x, train=True, mutable=["batch_stats"])[0]
        outs[mode] = np.asarray(y, np.float32)
        # exact/fastvar emit f32 activations; the relaxed modes emit bf16
        assert y.dtype == (jnp.float32 if mode in ("exact", "fastvar")
                           else jnp.bfloat16)
    # f32 single-pass variance agrees with two-pass to f32 rounding here
    np.testing.assert_allclose(outs["exact"], outs["fastvar"],
                               rtol=1e-4, atol=1e-4)
    # identical parameters: outputs agree up to bf16 rounding, and the
    # bf16 modes are exactly representable in bf16
    np.testing.assert_allclose(outs["exact"], outs["stats"],
                               rtol=2e-2, atol=2e-2)
    b16 = outs["stats"].astype(np.float32)
    assert (b16 == np.asarray(jnp.asarray(b16, jnp.bfloat16),
                              np.float32)).all()


@pytest.mark.slow
def test_bn_mode_hybrid_is_exact_in_f32():
    """'hybrid' relaxes BNs only under a bf16 compute dtype; without one it
    must be bit-identical to 'exact' (the parity stack never changes)."""
    import jax
    import jax.numpy as jnp
    from r3dfsseg_tpu.nn.dgcnn import FeatureExtractor

    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 64, 9)).astype(np.float32))
    ys = {}
    for mode in ("exact", "hybrid", "fastvar"):
        m = FeatureExtractor(dtype=None, bn_mode=mode,
                             knn_impl="xla", attn_impl="xla")
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x, train=True)
        y, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                       rngs={"dropout": jax.random.PRNGKey(2)})
        ys[mode] = np.asarray(y)
    np.testing.assert_array_equal(ys["hybrid"], ys["exact"])
    np.testing.assert_array_equal(ys["fastvar"], ys["exact"])

    # under bf16, hybrid keeps the embedding f32-typed (level-1 slice comes
    # from an 'exact' BN; base slice from a 'fastvar' one) and stays close
    # to the exact stack away from kNN-tie flips
    m = FeatureExtractor(dtype=jnp.bfloat16, bn_mode="hybrid",
                         knn_impl="xla", attn_impl="xla")
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, train=True)
    y, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                   rngs={"dropout": jax.random.PRNGKey(2)})
    assert y.dtype == jnp.float32
    lvl1 = np.asarray(y)[..., :64]
    b16 = lvl1 == np.asarray(jnp.asarray(lvl1, jnp.bfloat16), np.float32)
    assert not b16.all(), "level-1 features were bf16-quantised in hybrid"


def test_grouped_batchnorm_matches_flax_per_group(rng):
    """GroupedBatchNorm == flax BatchNorm applied per group, for both
    two-pass and fast-variance statistics, and its running-stat update is
    the mean of the per-group flax updates."""
    import flax.linen as fnn

    from r3dfsseg_tpu.nn import GroupedBatchNorm

    x = rng.normal(size=(6, 10, 5)).astype(np.float32) * 3.0 + 1.5
    for fast in (False, True):
        gbn = GroupedBatchNorm(use_fast_variance=fast)
        v = gbn.init(jax.random.PRNGKey(0), jnp.asarray(x), 1)
        yg, mut = gbn.apply(v, jnp.asarray(x), 3, mutable=["batch_stats"])

        bn = fnn.BatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5, use_fast_variance=fast)
        vb = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
        outs, stats = [], []
        for g in range(3):
            y1, m1 = bn.apply(vb, jnp.asarray(x[2 * g:2 * g + 2]),
                              mutable=["batch_stats"])
            outs.append(np.asarray(y1))
            stats.append(m1["batch_stats"])
        np.testing.assert_allclose(np.asarray(yg),
                                   np.concatenate(outs), rtol=2e-5,
                                   atol=2e-5, err_msg=f"fast={fast}")
        for key in ("mean", "var"):
            want = np.mean([np.asarray(s[key]) for s in stats], axis=0)
            np.testing.assert_allclose(
                np.asarray(mut["batch_stats"][key]), want,
                rtol=1e-5, atol=1e-6, err_msg=f"{key} fast={fast}")
