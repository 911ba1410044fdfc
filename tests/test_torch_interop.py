"""Reference-checkpoint interop: a torch .tar saved with the reference's
exact state_dict layout loads through the converter into the MPTI model."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from r3dfsseg_tpu.config import tiny_config  # noqa: E402
from r3dfsseg_tpu.learners import MPTILearner  # noqa: E402
from r3dfsseg_tpu.utils.torch_convert import (  # noqa: E402
    convert_mpti_model, load_torch_checkpoint)
from tests.test_models_smoke import _episode  # noqa: E402


def _reference_style_state_dict(cfg, gen):
    """Tensors named exactly like MPTI_SelfAtten.state_dict() (mpti.py:45-83)."""
    sd = {}

    def conv(name, cin, cout, conv2d=False, bias=False):
        shape = (cout, cin, 1, 1) if conv2d else (cout, cin, 1)
        sd[f"{name}.weight"] = torch.tensor(
            gen.normal(size=shape).astype(np.float32) * 0.1)
        if bias:
            sd[f"{name}.bias"] = torch.tensor(
                gen.normal(size=(cout,)).astype(np.float32) * 0.1)

    def bn(name, c):
        sd[f"{name}.weight"] = torch.tensor(
            gen.uniform(0.5, 1.5, size=(c,)).astype(np.float32))
        sd[f"{name}.bias"] = torch.tensor(
            gen.normal(size=(c,)).astype(np.float32) * 0.1)
        sd[f"{name}.running_mean"] = torch.tensor(
            gen.normal(size=(c,)).astype(np.float32) * 0.1)
        sd[f"{name}.running_var"] = torch.tensor(
            gen.uniform(0.5, 1.5, size=(c,)).astype(np.float32))
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0)

    cin = cfg.pc_in_dim
    for i, widths in enumerate(cfg.edgeconv_widths):
        win = cin * 2 if i == 0 else cfg.edgeconv_widths[i - 1][-1] * 2
        for j, w in enumerate(widths):
            conv(f"encoder.edge_convs.{i}.layer.{3*j}", win, w, conv2d=True)
            bn(f"encoder.edge_convs.{i}.layer.{3*j+1}", w)
            win = w
    win = sum(w[-1] for w in cfg.edgeconv_widths)
    for j, w in enumerate(cfg.dgcnn_mlp_widths):
        conv(f"encoder.conv.layer.{3*j}", win, w)
        bn(f"encoder.conv.layer.{3*j+1}", w)
        win = w
    win = cfg.dgcnn_mlp_widths[-1]
    for i, w in enumerate(cfg.base_widths):
        conv(f"base_learner.convs.{i}.0", win, w, bias=True)
        bn(f"base_learner.convs.{i}.1", w)
        win = w
    for m in ("q_map", "k_map", "v_map"):
        conv(f"att_learner.{m}", cfg.dgcnn_mlp_widths[-1], cfg.output_dim)
    sd["proj.weight"] = torch.tensor(
        gen.normal(size=(cfg.proj_dim, cfg.feat_dim)).astype(np.float32) * 0.1)
    sd["proj.bias"] = torch.tensor(
        gen.normal(size=(cfg.proj_dim,)).astype(np.float32) * 0.1)
    return sd


@pytest.mark.slow
def test_reference_tar_roundtrip(tmp_path, rng):
    cfg = tiny_config()
    sd = _reference_style_state_dict(cfg, rng)
    tar = str(tmp_path / "checkpoint.tar")
    torch.save({"iteration": 7, "model_state_dict": sd,
                "optimizer_state_dict": {}, "loss": 0.5, "IoU": 0.42}, tar)

    flat = load_torch_checkpoint(tar)
    params, stats = convert_mpti_model(
        flat, edgeconv_widths=cfg.edgeconv_widths,
        dgcnn_mlp_widths=cfg.dgcnn_mlp_widths, base_widths=cfg.base_widths,
        use_attention=True)

    learner = MPTILearner(cfg)
    ep = _episode(cfg, rng)
    learner.init(ep)
    learner.load_params({"features": {k: v for k, v in params["features"].items()},
                         "proj": params["proj"]},
                        {"features": stats["features"]})
    # converted weights actually landed (not the random init)
    got = np.asarray(
        learner.state.params["features"]["encoder"]["mlp0"]["conv"]["kernel"])
    want = flat["encoder.conv.layer.0.weight"].squeeze(-1).T
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # and the model runs with them
    pred, loss, acc = learner.test(ep)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_flax_to_torch_roundtrip(tmp_path, rng):
    """flax -> torch export inverts the torch -> flax converter exactly:
    an initialised MPTINet exported with save_reference_checkpoint and
    re-imported through load_torch_checkpoint/convert_mpti_model gives the
    identical pytrees."""
    from r3dfsseg_tpu.utils.torch_convert import save_reference_checkpoint

    cfg = tiny_config()
    learner = MPTILearner(cfg)
    learner.init(_episode(cfg, rng))
    params = jax.tree.map(np.asarray, learner.state.params)
    stats = jax.tree.map(np.asarray, learner.state.batch_stats)

    tar = str(tmp_path / "exported.tar")
    save_reference_checkpoint(tar, params, stats, iteration=3, iou=0.5)

    blob = torch.load(tar, map_location="cpu", weights_only=False)
    assert blob["iteration"] == 3 and blob["IoU"] == 0.5
    flat = load_torch_checkpoint(tar)
    re_params, re_stats = convert_mpti_model(
        flat, edgeconv_widths=cfg.edgeconv_widths,
        dgcnn_mlp_widths=cfg.dgcnn_mlp_widths, base_widths=cfg.base_widths,
        use_attention=True)
    flat_a = jax.tree.leaves(
        {"p": {"features": re_params["features"], "proj": re_params["proj"]},
         "s": {"features": re_stats["features"]}})
    flat_b = jax.tree.leaves({"p": params, "s": stats})
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=1e-6)


@pytest.mark.slow
def test_export_strict_loads_into_reference_model(tmp_path, rng):
    """The exported state_dict loads into the REAL reference MPTI_SelfAtten
    with strict=True — every key and shape matches the reference module
    layout (mpti.py:45-83) at the flagship config."""
    import dataclasses
    import sys

    # scoped insertions (see test_backbone.py) — never leak /root/reference
    sys.path.insert(0, "/root/repo/scripts")
    sys.path.insert(0, "/root/reference")
    try:
        from make_reference_fixture import install_stubs
        install_stubs()
        from models.mpti import MPTI_SelfAtten  # the reference's own module
    finally:
        sys.path.remove("/root/reference")
        sys.path.remove("/root/repo/scripts")

    from r3dfsseg_tpu.config import R3DConfig
    from r3dfsseg_tpu.utils.torch_convert import save_reference_checkpoint

    cfg = R3DConfig(pc_npts=64, n_subprototypes=4, k_connect=8)
    learner = MPTILearner(cfg)
    learner.init(_episode(cfg, rng))
    tar = str(tmp_path / "exported.tar")
    save_reference_checkpoint(
        tar, jax.tree.map(np.asarray, learner.state.params),
        jax.tree.map(np.asarray, learner.state.batch_stats))

    args = dataclasses.replace(cfg)  # attribute access matches argparse args
    ref = MPTI_SelfAtten(args)
    blob = torch.load(tar, map_location="cpu", weights_only=False)
    missing, unexpected = ref.load_state_dict(
        blob["model_state_dict"], strict=True), None
    del missing, unexpected  # strict=True raises on any mismatch


def _transformer_extra_state(cfg, gen, d_model, n_head, n_layers, d_feed):
    """Head tensors named like the reference ProtoNet_transformer
    (protonet.py:1107-1155: proj_trans_in/out Parameters, torch
    TransformerEncoder layers, binary_outlier_detector.fc)."""
    t = lambda *shape: torch.tensor(  # noqa: E731
        gen.normal(size=shape).astype(np.float32) * 0.1)
    sd = {
        "proj_trans_in": t(cfg.feat_dim, d_model),
        "proj_trans_out": t(cfg.feat_dim, d_model),
        "transformer.cls_embeddings.weight": t(cfg.n_way, d_model),
        "transformer.pos_embeddings.weight": t(cfg.n_way, d_model),
        "binary_outlier_detector.fc.weight": t(1, cfg.feat_dim),
        "binary_outlier_detector.fc.bias": t(1),
    }
    for i in range(n_layers):
        g = f"transformer.encoder.layers.{i}."
        sd[g + "self_attn.in_proj_weight"] = t(3 * d_model, d_model)
        sd[g + "self_attn.in_proj_bias"] = t(3 * d_model)
        sd[g + "self_attn.out_proj.weight"] = t(d_model, d_model)
        sd[g + "self_attn.out_proj.bias"] = t(d_model)
        sd[g + "linear1.weight"] = t(d_feed, d_model)
        sd[g + "linear1.bias"] = t(d_feed)
        sd[g + "linear2.weight"] = t(d_model, d_feed)
        sd[g + "linear2.bias"] = t(d_model)
        for n in ("norm1", "norm2"):
            sd[g + n + ".weight"] = t(d_model)
            sd[g + n + ".bias"] = t(d_model)
    return sd


def test_convert_for_phase_dispatch(rng):
    """convert_for_phase routes transformer phases to the full-head
    converter at the config's --d_model/--n_head/--n_layers, and every
    other phase to the MPTI converter."""
    import dataclasses

    from r3dfsseg_tpu.utils.torch_convert import convert_for_phase

    cfg = tiny_config()
    sd = _reference_style_state_dict(cfg, rng)
    sd.update(_transformer_extra_state(cfg, rng, d_model=16, n_head=2,
                                       n_layers=2, d_feed=32))
    flat = {k: np.asarray(v) for k, v in sd.items()}

    cfg_t = dataclasses.replace(cfg, phase="transformereval",
                                d_model=16, n_head=2, n_layers=2, d_feed=32)
    params, stats = convert_for_phase(flat, cfg_t)
    assert "transformer" in params and "binary_outlier_detector" in params
    assert "layer1" in params["transformer"]
    # qkv heads split at the config's d_model/n_head, not the defaults
    q = params["transformer"]["layer0"]["self_attn"]["query"]["kernel"]
    assert q.shape == (16, 2, 8)
    assert "features" in params and "features" in stats

    cfg_m = dataclasses.replace(cfg, phase="mptinoise_eval")
    params_m, _ = convert_for_phase(flat, cfg_m)
    assert "transformer" not in params_m
    assert set(params_m) == {"features", "proj"}


def test_pretrain_tar_encoder_prefix(tmp_path, rng):
    """Pretrain checkpoints store encoder keys without the 'encoder.' prefix
    (checkpoint_util.py:46-50); the loader re-adds it (…:16)."""
    cfg = tiny_config()
    sd = _reference_style_state_dict(cfg, rng)
    enc_only = {k[len("encoder."):]: v for k, v in sd.items()
                if k.startswith("encoder.")}
    tar = str(tmp_path / "pretrain.tar")
    torch.save({"params": enc_only}, tar)
    flat = load_torch_checkpoint(tar)
    assert any(k.startswith("encoder.") for k in flat)
    from r3dfsseg_tpu.utils.torch_convert import convert_feature_extractor
    params, stats = convert_feature_extractor(
        flat, edgeconv_widths=cfg.edgeconv_widths,
        dgcnn_mlp_widths=cfg.dgcnn_mlp_widths, base_widths=cfg.base_widths,
        use_attention=False)
    assert "encoder" in params and "edgeconv0" in params["encoder"]
