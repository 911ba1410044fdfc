"""PyTorch <-> flax parameter conversion — BOTH directions.

torch -> flax: lets users of the reference load their trained `.tar`
checkpoints (`/root/reference/utils/checkpoint_util.py:9-50`, schema at
`mpti_train_noise.py:138-144`) straight into the TPU framework, and lets
the parity test suite drive both implementations with identical weights.

flax -> torch: `export_mpti_state`/`save_reference_checkpoint` emit a
state_dict with the reference's exact key names and tensor layouts
(Conv2d (out,in,1,1) / Conv1d (out,in,1) / Linear (out,in), BN running
stats + num_batches_tracked), so a TPU-trained model loads into the
reference's `MPTI_SelfAtten` with `strict=True` — see
`scripts/export_torch_checkpoint.py` and `tests/test_torch_interop.py`.

Layout conventions:
  torch Conv1d/Conv2d (1x1) weight (out, in, 1[, 1]) -> dense kernel (in, out)
  torch Linear weight (out, in)                      -> dense kernel (in, out)
  torch BatchNorm weight/bias                        -> bn scale/bias (params)
  torch BatchNorm running_mean/var                   -> bn mean/var (batch_stats)
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """(out, in, 1[,1]) or (out, in) -> (in, out)."""
    w = np.asarray(w)
    while w.ndim > 2:
        w = w.squeeze(-1)
    return np.ascontiguousarray(w.T)


def _convbn(dst_params, dst_stats, src: Dict[str, np.ndarray], prefix_conv, prefix_bn):
    """Fill one ConvBN block from torch conv+bn tensors."""
    blk_p = {"conv": {"kernel": _conv_kernel(src[prefix_conv + ".weight"])}}
    if prefix_conv + ".bias" in src:
        blk_p["conv"]["bias"] = np.asarray(src[prefix_conv + ".bias"])
    blk_p["bn"] = {
        "scale": np.asarray(src[prefix_bn + ".weight"]),
        "bias": np.asarray(src[prefix_bn + ".bias"]),
    }
    blk_s = {"bn": {
        "mean": np.asarray(src[prefix_bn + ".running_mean"]),
        "var": np.asarray(src[prefix_bn + ".running_var"]),
    }}
    dst_params.update(blk_p)
    dst_stats.update(blk_s)


def convert_feature_extractor(
    torch_state: Dict[str, np.ndarray],
    *,
    edgeconv_widths=((64, 64), (64, 64), (64, 64)),
    dgcnn_mlp_widths=(512, 256),
    base_widths=(128, 64),
    use_attention=True,
    prefix: str = "",
) -> Tuple[dict, dict]:
    """Convert reference `MPTI_SelfAtten`/`ProtoNet` tensors under ``prefix``
    (e.g. '' for a full model state_dict, or for a pretrain encoder dict that
    was saved without the 'encoder.' prefix, pass prefix='' after remapping —
    mirroring checkpoint_util.py:16's 'encoder.'+k remap).

    Returns (params, batch_stats) pytrees matching
    `r3dfsseg_tpu.nn.FeatureExtractor`.
    """
    g = lambda k: prefix + k  # noqa: E731
    src = torch_state
    params: dict = {"encoder": {}, "base_learner": {}}
    stats: dict = {"encoder": {}, "base_learner": {}}

    # DGCNN edgeconvs: edge_convs.{i}.layer.{3j}=Conv, {3j+1}=BN (dgcnn.py:45-58)
    for i, widths in enumerate(edgeconv_widths):
        blk_p, blk_s = {}, {}
        for j in range(len(widths)):
            lp, ls = {}, {}
            _convbn(lp, ls, src,
                    g(f"encoder.edge_convs.{i}.layer.{3*j}"),
                    g(f"encoder.edge_convs.{i}.layer.{3*j+1}"))
            blk_p[f"layer{j}"] = lp
            blk_s[f"layer{j}"] = ls
        params["encoder"][f"edgeconv{i}"] = blk_p
        stats["encoder"][f"edgeconv{i}"] = blk_s

    # DGCNN mlp: conv.layer.{3j}/{3j+1} (dgcnn.py:64-80,111)
    for j in range(len(dgcnn_mlp_widths)):
        lp, ls = {}, {}
        _convbn(lp, ls, src, g(f"encoder.conv.layer.{3*j}"),
                g(f"encoder.conv.layer.{3*j+1}"))
        params["encoder"][f"mlp{j}"] = lp
        stats["encoder"][f"mlp{j}"] = ls

    # BaseLearner: convs.{i}.0=Conv1d(bias), .1=BN (mpti.py:18-40).
    # Pretrain checkpoints hold only the encoder (checkpoint_util.py:46-50):
    # the reference merges them partially (strict=False); mirror that by
    # skipping absent modules.
    for i in range(len(base_widths)):
        if g(f"base_learner.convs.{i}.0.weight") not in src:
            continue
        lp, ls = {}, {}
        _convbn(lp, ls, src, g(f"base_learner.convs.{i}.0"),
                g(f"base_learner.convs.{i}.1"))
        params["base_learner"][f"conv{i}"] = lp
        stats["base_learner"][f"conv{i}"] = ls
    if not params["base_learner"]:
        del params["base_learner"], stats["base_learner"]

    if use_attention and g("att_learner.q_map.weight") in src:
        params["att_learner"] = {
            m: {"kernel": _conv_kernel(src[g(f"att_learner.{m}.weight")])}
            for m in ("q_map", "k_map", "v_map")
        }
    if not use_attention and g("linear_mapper.weight") in src:
        params["linear_mapper"] = {
            "kernel": _conv_kernel(src[g("linear_mapper.weight")])}
    return params, stats


def convert_mpti_model(torch_state: Dict[str, np.ndarray], **kw) -> Tuple[dict, dict]:
    """Full MPTI_SelfAtten state_dict -> (params, batch_stats) for MPTINet.

    Adds the WayContrast projection head (mpti.py:83) on top of the
    feature extractor tree.
    """
    fe_params, fe_stats = convert_feature_extractor(torch_state, **kw)
    params = {"features": fe_params}
    stats = {"features": fe_stats}
    if "proj.weight" in torch_state:
        params["proj"] = {
            "kernel": _conv_kernel(torch_state["proj.weight"]),
            "bias": np.asarray(torch_state["proj.bias"]),
        }
    return params, stats


def convert_for_phase(torch_state: Dict[str, np.ndarray], cfg
                      ) -> Tuple[dict, dict]:
    """Dispatch a reference ``checkpoint.tar`` state_dict to the converter
    that matches the session's phase, returning (params, batch_stats)
    subtrees ready for ``learner.load_params``.

    The reference loads every phase's checkpoint with ``strict=False``
    (`checkpoint_util.py:34`), which would silently drop the transformer
    head if the architectures disagreed; here the transformer phases get
    the full head conversion (proj_trans_in/out, encoder layers, binary
    outlier detector) at the config's --d_model/--n_head/--n_layers.
    """
    fe_kw = dict(edgeconv_widths=cfg.edgeconv_widths,
                 dgcnn_mlp_widths=cfg.dgcnn_mlp_widths,
                 base_widths=cfg.base_widths,
                 use_attention=cfg.use_attention)
    if cfg.phase in ("transformereval", "transformertrain"):
        return convert_transformer_model(
            torch_state, d_model=cfg.d_model, n_head=cfg.n_head,
            n_layers=cfg.n_layers, **fe_kw)
    return convert_mpti_model(torch_state, **fe_kw)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference checkpoint .tar into a flat numpy dict.

    Handles both the full-model schema {'model_state_dict': ...}
    (mpti_train_noise.py:138-144) and the pretrain schema {'params': ...}
    (checkpoint_util.py:46-50, keys without the 'encoder.' prefix which
    load_pretrain_checkpoint re-adds at checkpoint_util.py:16).
    """
    import torch  # local import: torch is only needed for interop

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if "model_state_dict" in blob:
        sd = blob["model_state_dict"]
    elif "params" in blob:
        sd = {"encoder." + k: v for k, v in blob["params"].items()}
    else:
        sd = blob
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def convert_transformer_model(
    torch_state: Dict[str, np.ndarray],
    *,
    d_model: int = 128,
    n_head: int = 8,
    n_layers: int = 3,
    **fe_kw,
) -> Tuple[dict, dict]:
    """Reference `ProtoNet_transformer` state_dict -> (params, batch_stats)
    for `ProtoNetTransformer` (protonet.py:1107-1155 module layout:
    encoder/base_learner/att_learner + proj_trans_in/out + transformer
    [torch TransformerEncoder] + binary_outlier_detector)."""
    fe_params, fe_stats = convert_feature_extractor(torch_state, **fe_kw)
    params: dict = {"features": fe_params}
    stats: dict = {"features": fe_stats}
    src = torch_state

    params["proj_trans_in"] = np.asarray(src["proj_trans_in"])
    params["proj_trans_out"] = np.asarray(src["proj_trans_out"])

    hd = d_model // n_head
    tr: dict = {
        "cls_embeddings": {
            "embedding": np.asarray(src["transformer.cls_embeddings.weight"])},
        "pos_embeddings": {
            "embedding": np.asarray(src["transformer.pos_embeddings.weight"])},
    }
    for i in range(n_layers):
        g = f"transformer.encoder.layers.{i}."
        w = np.asarray(src[g + "self_attn.in_proj_weight"])   # (3d, d)
        b = np.asarray(src[g + "self_attn.in_proj_bias"])     # (3d,)
        qkv = {}
        for j, name in enumerate(("query", "key", "value")):
            wj = w[j * d_model:(j + 1) * d_model]             # (d, d) out,in
            qkv[name] = {
                "kernel": np.ascontiguousarray(
                    wj.T.reshape(d_model, n_head, hd)),
                "bias": b[j * d_model:(j + 1) * d_model].reshape(n_head, hd),
            }
        ow = np.asarray(src[g + "self_attn.out_proj.weight"])  # (d, d) out,in
        qkv["out"] = {
            "kernel": np.ascontiguousarray(
                ow.T.reshape(n_head, hd, d_model)),
            "bias": np.asarray(src[g + "self_attn.out_proj.bias"]),
        }
        tr[f"layer{i}"] = {
            "self_attn": qkv,
            "linear1": {"kernel": _conv_kernel(src[g + "linear1.weight"]),
                        "bias": np.asarray(src[g + "linear1.bias"])},
            "linear2": {"kernel": _conv_kernel(src[g + "linear2.weight"]),
                        "bias": np.asarray(src[g + "linear2.bias"])},
            "norm1": {"scale": np.asarray(src[g + "norm1.weight"]),
                      "bias": np.asarray(src[g + "norm1.bias"])},
            "norm2": {"scale": np.asarray(src[g + "norm2.weight"]),
                      "bias": np.asarray(src[g + "norm2.bias"])},
        }
    params["transformer"] = tr
    params["binary_outlier_detector"] = {
        "kernel": _conv_kernel(src["binary_outlier_detector.fc.weight"]),
        "bias": np.asarray(src["binary_outlier_detector.fc.bias"]),
    }
    return params, stats


def _t_conv(kernel: np.ndarray, conv_nd: int) -> np.ndarray:
    """dense kernel (in, out) -> torch ConvNd weight (out, in, 1[, 1])."""
    w = np.ascontiguousarray(np.asarray(kernel).T)
    for _ in range(conv_nd):
        w = w[..., None]
    return w


def _t_convbn(out: dict, params: dict, stats: dict,
              prefix_conv: str, prefix_bn: str, conv_nd: int) -> None:
    """Inverse of `_convbn`: one ConvBN block -> torch conv+bn tensors."""
    out[prefix_conv + ".weight"] = _t_conv(params["conv"]["kernel"], conv_nd)
    if "bias" in params["conv"]:
        out[prefix_conv + ".bias"] = np.asarray(params["conv"]["bias"])
    out[prefix_bn + ".weight"] = np.asarray(params["bn"]["scale"])
    out[prefix_bn + ".bias"] = np.asarray(params["bn"]["bias"])
    out[prefix_bn + ".running_mean"] = np.asarray(stats["bn"]["mean"])
    out[prefix_bn + ".running_var"] = np.asarray(stats["bn"]["var"])
    # torch BatchNorm carries this buffer; strict load_state_dict needs it
    out[prefix_bn + ".num_batches_tracked"] = np.asarray(0, np.int64)


def export_feature_extractor(
    params: dict, stats: dict, *, prefix: str = ""
) -> Dict[str, np.ndarray]:
    """Inverse of `convert_feature_extractor`: FeatureExtractor pytrees ->
    flat numpy dict with the reference's key names (module layout
    `/root/reference/models/mpti.py:60-66`, conv blocks `dgcnn.py:45-80`,
    BaseLearner `mpti.py:18-40`, attention `attention.py:24-29`).

    Widths are inferred from the pytrees, so any --edgeconv_widths /
    --dgcnn_mlp_widths / --base_widths config round-trips.
    """
    g = lambda k: prefix + k  # noqa: E731
    out: Dict[str, np.ndarray] = {}
    enc_p, enc_s = params["encoder"], stats["encoder"]
    i = 0
    while f"edgeconv{i}" in enc_p:
        blk_p, blk_s = enc_p[f"edgeconv{i}"], enc_s[f"edgeconv{i}"]
        j = 0
        while f"layer{j}" in blk_p:
            _t_convbn(out, blk_p[f"layer{j}"], blk_s[f"layer{j}"],
                      g(f"encoder.edge_convs.{i}.layer.{3*j}"),
                      g(f"encoder.edge_convs.{i}.layer.{3*j+1}"), conv_nd=2)
            j += 1
        i += 1
    j = 0
    while f"mlp{j}" in enc_p:
        _t_convbn(out, enc_p[f"mlp{j}"], enc_s[f"mlp{j}"],
                  g(f"encoder.conv.layer.{3*j}"),
                  g(f"encoder.conv.layer.{3*j+1}"), conv_nd=1)
        j += 1
    if "base_learner" in params:
        i = 0
        while f"conv{i}" in params["base_learner"]:
            _t_convbn(out, params["base_learner"][f"conv{i}"],
                      stats["base_learner"][f"conv{i}"],
                      g(f"base_learner.convs.{i}.0"),
                      g(f"base_learner.convs.{i}.1"), conv_nd=1)
            i += 1
    if "att_learner" in params:
        for m in ("q_map", "k_map", "v_map"):
            out[g(f"att_learner.{m}.weight")] = _t_conv(
                params["att_learner"][m]["kernel"], conv_nd=1)
    if "linear_mapper" in params:
        out[g("linear_mapper.weight")] = _t_conv(
            params["linear_mapper"]["kernel"], conv_nd=1)
    return out


def export_mpti_state(params: dict, stats: dict) -> Dict[str, np.ndarray]:
    """Inverse of `convert_mpti_model`: MPTINet (params, batch_stats) ->
    reference `MPTI_SelfAtten` state_dict (numpy values)."""
    out = export_feature_extractor(params["features"], stats["features"])
    if "proj" in params:  # WayContrast head, nn.Linear (mpti.py:83)
        out["proj.weight"] = np.ascontiguousarray(
            np.asarray(params["proj"]["kernel"]).T)
        out["proj.bias"] = np.asarray(params["proj"]["bias"])
    return out


def save_reference_checkpoint(path: str, params: dict, stats: dict, *,
                              iteration: int = 0, loss: float = 0.0,
                              iou: float = 0.0) -> None:
    """Write a reference-loadable `checkpoint.tar` (schema exactly as the
    reference saves it, `mpti_train_noise.py:138-144`; its test-mode loader
    reads only `model_state_dict`, `checkpoint_util.py:31-34`)."""
    import torch  # local import: torch is only needed for interop

    sd = {k: torch.from_numpy(np.ascontiguousarray(
              np.asarray(v, dtype=np.float32)))
          if np.asarray(v).dtype != np.int64 else torch.from_numpy(np.asarray(v))
          for k, v in export_mpti_state(params, stats).items()}
    torch.save({"iteration": iteration, "model_state_dict": sd,
                "optimizer_state_dict": None, "loss": loss, "IoU": iou}, path)


def convert_seg_model(
    torch_state: Dict[str, np.ndarray],
    *,
    edgeconv_widths=((64, 64), (64, 64), (64, 64)),
    dgcnn_mlp_widths=(512, 256),
) -> Tuple[dict, dict]:
    """Reference `DGCNNSeg_attention(_v2)` state_dict -> (params,
    batch_stats) for `DGCNNSegAttention` (dgcnn.py:185-255 layout:
    encoder [DGCNN_Atten incl. att_learner] + segmenter Sequential
    0=Conv,1=BN,3=Conv,4=BN,7=Conv)."""
    src = torch_state
    fe_params, fe_stats = convert_feature_extractor(
        torch_state, edgeconv_widths=edgeconv_widths,
        dgcnn_mlp_widths=dgcnn_mlp_widths, base_widths=(), use_attention=False)
    params: dict = {"encoder": fe_params["encoder"]}
    stats: dict = {"encoder": fe_stats["encoder"]}
    params["att_learner"] = {
        m: {"kernel": _conv_kernel(src[f"encoder.att_learner.{m}.weight"])}
        for m in ("q_map", "k_map", "v_map")
    }
    for dst, conv_i, bn_i in (("seg0", 0, 1), ("seg1", 3, 4)):
        lp, ls = {}, {}
        _convbn(lp, ls, src, f"segmenter.{conv_i}", f"segmenter.{bn_i}")
        params[dst] = lp
        stats[dst] = ls
    params["seg_out"] = {
        "kernel": _conv_kernel(src["segmenter.7.weight"]),
        "bias": np.asarray(src["segmenter.7.bias"]),
    }
    return params, stats
