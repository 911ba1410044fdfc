"""Golden parity vs the REAL reference model — second architecture preset.

`scripts/make_reference_fixture.py cfg2` runs the reference
`MPTI_SelfAtten` at 3-way 2-shot with `use_attention=False` (the
`linear_mapper` Conv1d branch, `/root/reference/models/mpti.py:64-66,
593-595`) and records weights, episodes, outputs and train-loss gradients
into `tests/fixtures/reference_parity_cfg2.npz`.

This covers episode-core semantics the default (2-way 3-shot, attention)
fixture cannot: a 4-class label-propagation label matrix, WayContrast
negative-borrowing across 3 ways, the 2-shot MDNS majority vote, and the
no-attention feature concat (level1 | linear_mapper | base).
"""
import json
import os

import numpy as np
import pytest

import jax

from r3dfsseg_tpu.config import R3DConfig
from r3dfsseg_tpu.learners import MPTILearner
from r3dfsseg_tpu.models.episode import Episode
from r3dfsseg_tpu.models.mpti import mdns_keep_mask
from r3dfsseg_tpu.utils.torch_convert import convert_mpti_model

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "reference_parity_cfg2.npz")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.exists(FIXTURE),
    reason="run scripts/make_reference_fixture.py cfg2")]


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
        use_attention=meta["use_attention"],
        lp_solver="solve", affinity_impl="topk", knn_impl="xla",
        fps_impl="xla", compute_dtype="float32", contrast_fps_k=4,
    )
    sd = {k[len("sd/"):]: data[k] for k in data.files if k.startswith("sd/")}
    params, stats = convert_mpti_model(
        sd, edgeconv_widths=cfg.edgeconv_widths,
        dgcnn_mlp_widths=cfg.dgcnn_mlp_widths, base_widths=cfg.base_widths,
        use_attention=meta["use_attention"])
    learner = MPTILearner(cfg)
    episodes = {}
    for name in meta["fixtures"]:
        g = lambda f: data[f"{name}/ep/{f}"]  # noqa: E731
        episodes[name] = Episode(
            support_x=np.ascontiguousarray(g("support_x").transpose(0, 1, 3, 2)),
            support_y=g("support_y").astype(np.int32),
            query_x=np.ascontiguousarray(g("query_x").transpose(0, 2, 1)),
            query_y=g("query_y").astype(np.int32),
            gt_support_y=g("gt_support_y").astype(np.int32),
            gt_query_y=g("gt_query_y").astype(np.int32),
            support_flag=g("support_flag").astype(np.int32),
        )
    learner.init(episodes[meta["fixtures"][0]])
    learner.load_params(params, stats)
    return data, meta, cfg, learner, episodes


def _vars(learner):
    return {"params": learner.state.params,
            "batch_stats": learner.state.batch_stats}


@pytest.mark.parametrize("name", ["g0", "g1"])
def test_eval_features_match(golden, name):
    data, meta, cfg, learner, eps = golden
    ep = eps[name]
    sf, _ = learner.model.apply(
        _vars(learner), ep.with_batch_dim(), False,
        method=lambda m, e, t: m.extract_features(e, t))
    got = np.asarray(sf[0])
    want = data[f"{name}/support_feat_eval"].transpose(0, 1, 3, 2)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("name", ["g0", "g1"])
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
    ("g0", "eval_plain"), ("g0", "eval_mdns"),
    ("g1", "eval_plain"), ("g1", "eval_mdns"),
])
def test_eval_logits_and_loss_match(golden, name, mode):
    data, meta, cfg, learner, eps = golden
    out = learner.model.apply(_vars(learner), eps[name], train=False,
                              eval_mdns=(mode == "eval_mdns"))
    got = np.asarray(out.query_logits[0])
    want = data[f"{name}/{mode}/logits"].transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(float(out.lp_loss),
                               float(data[f"{name}/{mode}/lp_loss"]),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("name", ["g0", "g1"])
def test_train_logits_losses_match(golden, name):
    data, meta, cfg, learner, eps = golden
    out, _ = learner.model.apply(
        _vars(learner), eps[name], train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
    got = np.asarray(out.query_logits[0])
    want = data[f"{name}/train/logits"].transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(float(out.lp_loss),
                               float(data[f"{name}/train/lp_loss"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(out.contrast_loss),
                               float(data[f"{name}/train/contrast_loss"]),
                               atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("name", ["g0", "g1"])
def test_train_gradients_match_reference(golden, name):
    data, meta, cfg, learner, eps = golden

    def loss_fn(params):
        out, _ = learner.model.apply(
            {"params": params, "batch_stats": learner.state.batch_stats},
            eps[name], train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        return out.lp_loss + 0.1 * out.contrast_loss

    got = jax.grad(loss_fn)(learner.state.params)

    sd = {k[len("sd/"):]: data[k] for k in data.files if k.startswith("sd/")}
    gsd = {k: np.zeros_like(v) for k, v in sd.items()}
    prefix = f"{name}/train_grads/"
    n_found = 0
    for k in data.files:
        if k.startswith(prefix):
            gsd[k[len(prefix):]] = data[k]
            n_found += 1
    assert n_found >= 20, f"only {n_found} reference grads in fixture"
    want, _ = convert_mpti_model(
        gsd, edgeconv_widths=cfg.edgeconv_widths,
        dgcnn_mlp_widths=cfg.dgcnn_mlp_widths, base_widths=cfg.base_widths,
        use_attention=meta["use_attention"])

    got_flat = jax.tree_util.tree_flatten_with_path(got)[0]
    want_flat = jax.tree_util.tree_flatten_with_path(want)[0]
    got_map = {jax.tree_util.keystr(p): np.asarray(v) for p, v in got_flat}
    want_map = {jax.tree_util.keystr(p): np.asarray(v) for p, v in want_flat}
    assert set(got_map) == set(want_map)

    gmax = max(float(np.max(np.abs(v))) for v in want_map.values())
    for key in sorted(want_map):
        w, g = want_map[key], got_map[key]
        scale = max(float(np.max(np.abs(w))), 1e-12)
        atol = max(5e-3 * scale, 1e-5 * gmax)
        np.testing.assert_allclose(
            g, w, rtol=5e-3, atol=atol,
            err_msg=f"gradient mismatch at {key} (ref grad scale {scale:.3g})")
