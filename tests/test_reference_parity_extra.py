"""Golden parity vs the REAL reference for the remaining model families:
ProtoNet_Contrast (protonet.py:357-945), ProtoNet_transformer
(protonet.py:1107-1262) and the DGCNNSeg_attention(/_v2) pretraining heads
(dgcnn.py:185-255).  Fixtures from scripts/make_reference_fixture_extra.py
(real encoder widths — these reference classes hard-code feat_dim=192)."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from r3dfsseg_tpu.config import R3DConfig
from r3dfsseg_tpu.models.episode import Episode

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "reference_parity_extra.npz")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.exists(FIXTURE),
    reason="run scripts/make_reference_fixture_extra.py")]


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
        dg_atten_dim=meta["dg_atten_dim"],
        lp_solver="solve", affinity_impl="topk", knn_impl="xla",
        compute_dtype="float32", contrast_fps_k=4,
    )
    episodes = {}
    for name in ("ep", "ep_clean"):
        g = lambda f: data[f"{name}/{f}"]  # noqa: E731
        episodes[name] = Episode(
            support_x=jnp.asarray(g("support_x").transpose(0, 1, 3, 2)),
            support_y=jnp.asarray(g("support_y").astype(np.int32)),
            query_x=jnp.asarray(g("query_x").transpose(0, 2, 1)),
            query_y=jnp.asarray(g("query_y").astype(np.int32)),
            gt_support_y=jnp.asarray(g("gt_support_y").astype(np.int32)),
            gt_query_y=jnp.asarray(g("gt_query_y").astype(np.int32)),
            support_flag=jnp.asarray(g("support_flag").astype(np.int32)),
        )
    return data, meta, cfg, episodes


def _sd(data, prefix):
    return {k[len(prefix):]: data[k] for k in data.files
            if k.startswith(prefix)}


def _init_with(model, cfg, ep, params, stats):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ep, train=False)
    import flax
    cur_p = flax.core.unfreeze(variables["params"])
    cur_s = flax.core.unfreeze(variables.get("batch_stats", {}))

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                assert k in dst, f"unknown converted key {k}"
                dst[k] = jnp.asarray(v).astype(dst[k].dtype).reshape(
                    dst[k].shape)
    merge(cur_p, params)
    merge(cur_s, stats)
    return {"params": cur_p, "batch_stats": cur_s}


# ---------------------------------------------------------------- contrast
@pytest.fixture(scope="module")
def contrast_setup(golden):
    from r3dfsseg_tpu.models.protonet import ProtoNet
    from r3dfsseg_tpu.utils.torch_convert import convert_mpti_model

    data, meta, cfg, eps = golden
    params, stats = convert_mpti_model(
        _sd(data, "pc_sd/"), edgeconv_widths=cfg.edgeconv_widths,
        dgcnn_mlp_widths=cfg.dgcnn_mlp_widths, base_widths=cfg.base_widths,
        use_attention=True)
    model = ProtoNet(cfg, with_contrast=True)
    variables = _init_with(model, cfg, eps["ep"], params, stats)
    return model, variables


def test_protonet_contrast_eval_mdns(golden, contrast_setup):
    """Eval path: MDNS clean-flag-weighted prototypes (protonet.py:806-845,
    892-915)."""
    data, meta, cfg, eps = golden
    model, variables = contrast_setup
    out = model.apply(variables, eps["ep"], train=False, eval_mdns=True)
    got = np.asarray(out.query_logits[0])
    want = data["pc/eval/logits"].transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(float(out.loss), float(data["pc/eval/loss"]),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("name,fixkey", [("ep", "train"),
                                         ("ep_clean", "train_clean")])
def test_protonet_contrast_train(golden, contrast_setup, name, fixkey):
    """Train path: CE + WayContrast with fps_k=4 (protonet.py:797-803);
    ep_clean exercises the borrowed-negatives branch."""
    data, meta, cfg, eps = golden
    model, variables = contrast_setup
    out, _ = model.apply(variables, eps[name], train=True,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(0)})
    got = np.asarray(out.query_logits[0])
    want = data[f"pc/{fixkey}/logits"].transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(float(out.loss),
                               float(data[f"pc/{fixkey}/loss"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(out.contrast_loss),
                               float(data[f"pc/{fixkey}/contrast_loss"]),
                               atol=5e-4, rtol=5e-4)


# -------------------------------------------------------------- transformer
@pytest.fixture(scope="module")
def transformer_setup(golden):
    from r3dfsseg_tpu.models.transformer import ProtoNetTransformer
    from r3dfsseg_tpu.utils.torch_convert import convert_transformer_model

    data, meta, cfg, eps = golden
    params, stats = convert_transformer_model(
        _sd(data, "pt_sd/"), d_model=128, n_head=8, n_layers=3,
        edgeconv_widths=cfg.edgeconv_widths,
        dgcnn_mlp_widths=cfg.dgcnn_mlp_widths, base_widths=cfg.base_widths,
        use_attention=True)
    model = ProtoNetTransformer(cfg, d_model=128, n_head=8, n_layers=3,
                                d_feed=128, dropout=0.0)
    variables = _init_with(model, cfg, eps["ep"], params, stats)
    return model, variables


def test_transformer_eval(golden, transformer_setup):
    data, meta, cfg, eps = golden
    model, variables = transformer_setup
    out = model.apply(variables, eps["ep"], train=False)
    got = np.asarray(out.query_logits[0])
    want = data["pt/eval/logits"].transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(float(out.loss), float(data["pt/eval/loss"]),
                               atol=1e-4, rtol=1e-4)


def test_transformer_train_losses(golden, transformer_setup):
    data, meta, cfg, eps = golden
    model, variables = transformer_setup
    out, _ = model.apply(variables, eps["ep"], train=True,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(0)})
    got = np.asarray(out.query_logits[0])
    want = data["pt/train/logits"].transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(float(out.loss), float(data["pt/train/loss"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(out.binary_loss),
                               float(data["pt/train/binary_loss"]),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(float(out.clean_proto_loss),
                               float(data["pt/train/clean_proto_loss"]),
                               atol=5e-3, rtol=5e-3)


# ---------------------------------------------------------------- seg heads
@pytest.mark.parametrize("tag,v2", [("seg_v1", False), ("seg_v2", True)])
@pytest.mark.parametrize("mode", ["eval", "train"])
def test_seg_head_matches_reference(golden, tag, v2, mode):
    from r3dfsseg_tpu.nn import DGCNNSegAttention
    from r3dfsseg_tpu.utils.torch_convert import convert_seg_model

    data, meta, cfg, eps = golden
    params, stats = convert_seg_model(
        _sd(data, f"{tag}_sd/"), edgeconv_widths=cfg.edgeconv_widths,
        dgcnn_mlp_widths=cfg.dgcnn_mlp_widths)
    model = DGCNNSegAttention(
        num_classes=meta["num_classes"],
        edgeconv_widths=cfg.edgeconv_widths,
        dgcnn_mlp_widths=cfg.dgcnn_mlp_widths, dgcnn_k=cfg.dgcnn_k,
        atten_dim=meta["dg_atten_dim"], dropout=0.0, attn_dropout=0.0,
        v2=v2)
    x = jnp.asarray(data["seg/x"].transpose(0, 2, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)
    import flax
    cur_p = flax.core.unfreeze(variables["params"])
    cur_s = flax.core.unfreeze(variables["batch_stats"])

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                assert k in dst, f"unknown converted key {k}"
                dst[k] = jnp.asarray(v).astype(dst[k].dtype).reshape(
                    dst[k].shape)
    merge(cur_p, params)
    merge(cur_s, stats)
    variables = {"params": cur_p, "batch_stats": cur_s}

    if mode == "train":
        logits, _ = model.apply(variables, x, train=True,
                                mutable=["batch_stats"],
                                rngs={"dropout": jax.random.PRNGKey(0)})
    else:
        logits = model.apply(variables, x, train=False)
    got = np.asarray(logits)
    want = data[f"{tag}/{mode}/logits"].transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=3e-3, rtol=3e-3)
