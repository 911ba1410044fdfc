"""PyTorch <-> flax parameter conversion.

Lets users of the reference load their trained `.tar` checkpoints
(`/root/reference/utils/checkpoint_util.py:9-50`, schema at
`mpti_train_noise.py:138-144`) straight into the TPU framework, and lets
the parity test suite drive both implementations with identical weights.

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
