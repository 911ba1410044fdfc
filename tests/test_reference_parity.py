"""Golden parity vs the REAL reference model.

`scripts/make_reference_fixture.py` ran `/root/reference/models/mpti.py`
`MPTI_SelfAtten.forward` (CPU torch, exact-semantics stubs for
faiss/torch_cluster/torch_scatter, torch-1.8 `pairwise_distance` dim-1
semantics) on two small fixed episodes and recorded its weights, inputs and
outputs into `tests/fixtures/reference_parity.npz`.

These tests replay the same episodes through the TPU-native `MPTINet` with
the converted weights, in reference-faithful mode (f32, dense LP solve,
exact top-k affinity), and assert:

  * eval-mode 192-d (here 24-d) support features match (getFeatures,
    mpti.py:579-595),
  * MDNS clean flags match (Mean_pl_support_y_multi_scale, mpti.py:178-223),
  * query logits + lp_loss match in all three modes: eval without MDNS,
    eval with MDNS, train (mpti.py:414-577),
  * WayContrast loss matches (per_way_contrast_loss, mpti.py:226-313),
    covering both the clean-episode borrowed-negatives branch and the
    mixed-flag branch with a ratio>=1 tiny-foreground shot.

If any episode-core semantics drift from the reference, these fail.
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from r3dfsseg_tpu.config import R3DConfig
from r3dfsseg_tpu.learners import MPTILearner
from r3dfsseg_tpu.models.episode import Episode
from r3dfsseg_tpu.models.mpti import mdns_keep_mask
from r3dfsseg_tpu.utils.torch_convert import convert_mpti_model

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "reference_parity.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="run scripts/make_reference_fixture.py")


@pytest.fixture(scope="module")
def golden():
    data = np.load(FIXTURE)
    meta = json.loads(bytes(data["meta"]).decode())
    cfg = R3DConfig(
        n_way=meta["n_way"], k_shot=meta["k_shot"], n_queries=1,
        pc_npts=meta["pc_npts"], dgcnn_k=meta["dgcnn_k"],
        edgeconv_widths=tuple(tuple(w) for w in meta["edgeconv_widths"]),
        dgcnn_mlp_widths=tuple(meta["dgcnn_mlp_widths"]),
        base_widths=tuple(meta["base_widths"]), output_dim=meta["output_dim"],
        n_subprototypes=meta["n_subprototypes"], k_connect=meta["k_connect"],
        sigma=meta["sigma"], proj_dim=128, attn_dropout=0.0,
        # reference-faithful numerics: f32, exact top-k kNN, dense solve
        lp_solver="solve", affinity_impl="topk", knn_impl="xla",
        compute_dtype="float32", contrast_fps_k=4,
    )
    sd = {k[len("sd/"):]: data[k] for k in data.files if k.startswith("sd/")}
    params, stats = convert_mpti_model(
        sd, edgeconv_widths=cfg.edgeconv_widths,
        dgcnn_mlp_widths=cfg.dgcnn_mlp_widths, base_widths=cfg.base_widths,
        use_attention=True)
    learner = MPTILearner(cfg)
    episodes = {}
    for name in meta["fixtures"]:
        g = lambda f: data[f"{name}/ep/{f}"]  # noqa: E731
        episodes[name] = Episode(
            support_x=jnp.asarray(g("support_x").transpose(0, 1, 3, 2)),
            support_y=jnp.asarray(g("support_y").astype(np.int32)),
            query_x=jnp.asarray(g("query_x").transpose(0, 2, 1)),
            query_y=jnp.asarray(g("query_y").astype(np.int32)),
            gt_support_y=jnp.asarray(g("gt_support_y").astype(np.int32)),
            gt_query_y=jnp.asarray(g("gt_query_y").astype(np.int32)),
            support_flag=jnp.asarray(g("support_flag").astype(np.int32)),
        )
    learner.init(episodes[meta["fixtures"][0]])
    learner.load_params(params, stats)
    return data, meta, cfg, learner, episodes


def _vars(learner):
    return {"params": learner.state.params,
            "batch_stats": learner.state.batch_stats}


def _ref_logits(data, name, mode):
    return data[f"{name}/{mode}/logits"].transpose(0, 2, 1)  # (q, N, cls)


@pytest.mark.parametrize("name", ["f0", "f1"])
def test_eval_features_match(golden, name):
    data, meta, cfg, learner, eps = golden
    ep = eps[name]
    sf, _ = learner.model.apply(
        _vars(learner), ep.with_batch_dim(), False,
        method=lambda m, e, t: m.extract_features(e, t))
    got = np.asarray(sf[0])                              # (w, k, N, d)
    want = data[f"{name}/support_feat_eval"].transpose(0, 1, 3, 2)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("name", ["f0", "f1"])
def test_mdns_clean_flags_match(golden, name):
    data, meta, cfg, learner, eps = golden
    ep = eps[name]
    sf, _ = learner.model.apply(
        _vars(learner), ep.with_batch_dim(), False,
        method=lambda m, e, t: m.extract_features(e, t))
    _, flags = mdns_keep_mask(sf[0], ep.support_y > 0,
                              ep.support_x[..., :3], cfg.mdns_scales)
    np.testing.assert_array_equal(
        np.asarray(flags), data[f"{name}/eval_mdns/clean_flag"])


@pytest.mark.parametrize("name,mode", [
    ("f0", "eval_plain"), ("f0", "eval_mdns"),
    ("f1", "eval_plain"), ("f1", "eval_mdns"),
])
@pytest.mark.slow
def test_eval_logits_and_loss_match(golden, name, mode):
    data, meta, cfg, learner, eps = golden
    out = learner.model.apply(_vars(learner), eps[name], train=False,
                              eval_mdns=(mode == "eval_mdns"))
    got = np.asarray(out.query_logits[0])                # (q, N, cls)
    want = _ref_logits(data, name, mode)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(float(out.lp_loss),
                               float(data[f"{name}/{mode}/lp_loss"]),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("name,mode", [
    ("f0", "eval_plain"), ("f0", "eval_mdns"),
    ("f1", "eval_plain"), ("f1", "eval_mdns"),
])
@pytest.mark.slow
def test_eval_logits_match_cheby_parity_solver(golden, name, mode):
    """The fast-parity LP solver (f32 Chebyshev-150, HIGHEST-precision
    matvecs) matches the reference's dense inverse (mpti.py:775) within the
    SAME golden tolerance as the dense `solve` path: at alpha=0.99 the
    system's condition is ~199, so 150 Chebyshev iterations converge to
    ~5e-10 relative — far below f32 cross-framework noise.  This is the
    evidence behind bench.py's parity mode using cheby-150 instead of the
    O(n^3) dense solve (selection semantics unchanged: exact top-k
    affinity, XLA kNN/FPS, f32 everywhere)."""
    data, meta, cfg, learner, eps = golden
    ccfg = cfg.replace(lp_solver="cheby", lp_cg_iters=150,
                       lp_adjoint_iters=0)
    clearner = MPTILearner(ccfg)
    clearner.init(eps[meta["fixtures"][0]])
    clearner.load_params(learner.state.params, learner.state.batch_stats)
    out = clearner.model.apply(_vars(clearner), eps[name], train=False,
                               eval_mdns=(mode == "eval_mdns"))
    got = np.asarray(out.query_logits[0])
    want = _ref_logits(data, name, mode)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(float(out.lp_loss),
                               float(data[f"{name}/{mode}/lp_loss"]),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("dist", ["cosine", "euclidean"])
@pytest.mark.parametrize("mode", ["eval", "train"])
def test_protonet_matches_reference(golden, dist, mode):
    """Plain ProtoNet baseline vs reference forward (protonet.py:245-275),
    same feature-extractor weights, cosine and euclidean similarity."""
    from r3dfsseg_tpu.models.protonet import ProtoNet

    data, meta, cfg, learner, eps = golden
    pcfg = cfg.replace(dist_method=dist)
    model = ProtoNet(pcfg, with_contrast=False)
    variables = {
        "params": {"features": learner.state.params["features"]},
        "batch_stats": {"features": learner.state.batch_stats["features"]},
    }
    kw = {}
    if mode == "train":
        kw = dict(mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
    out = model.apply(variables, eps["f0"], train=(mode == "train"), **kw)
    if mode == "train":
        out = out[0]
    got = np.asarray(out.query_logits[0])                 # (q, N, cls)
    want = data[f"proto/{dist}/{mode}/logits"].transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(float(out.loss),
                               float(data[f"proto/{dist}/{mode}/loss"]),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("name", ["f0", "f1"])
def test_train_logits_losses_match(golden, name):
    data, meta, cfg, learner, eps = golden
    out, _ = learner.model.apply(
        _vars(learner), eps[name], train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
    got = np.asarray(out.query_logits[0])
    want = _ref_logits(data, name, "train")
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(float(out.lp_loss),
                               float(data[f"{name}/train/lp_loss"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(out.contrast_loss),
                               float(data[f"{name}/train/contrast_loss"]),
                               atol=5e-4, rtol=5e-4)
