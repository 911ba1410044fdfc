"""Golden fixtures for the remaining reference model families:

  * `ProtoNet_Contrast` (protonet.py:357-945) — ProtoNet + WayContrast
    (train) + MDNS clean-flag-weighted prototypes (eval),
  * `ProtoNet_transformer` (protonet.py:1107-1262) — transformer-refined
    prototypes + binary-outlier BCE + clean-proto MSE,
  * `DGCNNSeg_attention` / `_v2` (dgcnn.py:185-255) — pretraining heads.

These classes hard-code `feat_dim = 192` (protonet.py:1131), so unlike the
tiny-width MPTI fixture they must run at the real encoder widths; pc_npts
stays small (64) to keep the CPU forward cheap.

Reuses the native-dep stubs from make_reference_fixture.py.  Dropout is
zeroed everywhere (incl. nn.MultiheadAttention's non-module `dropout`
float) so train-mode outputs are deterministic.

Usage: python scripts/make_reference_fixture_extra.py  (writes
tests/fixtures/reference_parity_extra.npz)
"""
from __future__ import annotations

import json
import os
import sys
from types import SimpleNamespace

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_reference_fixture import (  # noqa: E402
    _Logger, install_stubs, make_episode, zero_dropout)


def zero_all_dropout(model):
    zero_dropout(model)
    for m in model.modules():
        if isinstance(m, torch.nn.MultiheadAttention):
            m.dropout = 0.0
    # the reference hard-codes device='cuda' inside Transformer
    # (protonet.py:1147,1080); run it on CPU
    if hasattr(model, "transformer") and hasattr(model.transformer, "device"):
        model.transformer.device = "cpu"


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    from models.dgcnn import DGCNNSeg_attention, DGCNNSeg_attention_v2  # noqa: E402
    from models.protonet import ProtoNet_Contrast, ProtoNet_transformer  # noqa: E402

    args = SimpleNamespace(
        n_way=2, k_shot=3, pc_in_dim=9, pc_npts=64, use_attention=True,
        n_subprototypes=8, k_connect=8, sigma=1.0,
        edgeconv_widths=[[64, 64], [64, 64], [64, 64]],
        dgcnn_mlp_widths=[512, 256], base_widths=[128, 64], output_dim=64,
        dgcnn_k=4, shot_seed=1, dist_method="cosine")

    gen = np.random.default_rng(777)
    out = {}

    # shared episode: way0 has one noisy shot (gt zeroed), way1 clean —
    # exercises MDNS votes, clean-proto means and the mixed-flag contrast
    ep = make_episode(gen, 2, 3, 64, 9,
                      fg_counts=[[20, 24, 28], [18, 22, 26]],
                      flags=[[3, 5, 3], [7, 7, 7]],
                      noisy_shots=[(0, 1)])
    # and a clean episode for the borrowed-negatives contrast branch
    ep_clean = make_episode(gen, 2, 3, 64, 9,
                            fg_counts=[[20, 24, 28], [18, 22, 26]],
                            flags=[[3, 3, 3], [7, 7, 7]], noisy_shots=[])
    for nm, e in (("ep", ep), ("ep_clean", ep_clean)):
        for f, arr in e.items():
            out[f"{nm}/{f}"] = arr
    t = {k: torch.tensor(v) for k, v in ep.items()}
    tc = {k: torch.tensor(v) for k, v in ep_clean.items()}

    def warm(model):
        model.train()
        g2 = np.random.default_rng(4242)
        with torch.no_grad():
            for _ in range(4):
                x = torch.tensor(g2.standard_normal(
                    (6, args.pc_in_dim, args.pc_npts)).astype(np.float32))
                model.getFeatures(x)

    # ---------------- ProtoNet_Contrast ----------------
    torch.manual_seed(1234)
    pc = ProtoNet_Contrast(args)
    zero_all_dropout(pc)
    warm(pc)
    sd = {k: v.detach().clone() for k, v in pc.state_dict().items()}
    for k, v in sd.items():
        out[f"pc_sd/{k}"] = v.numpy()

    def fresh_pc():
        m = ProtoNet_Contrast(args)
        m.load_state_dict(sd)
        zero_all_dropout(m)
        return m

    m = fresh_pc().eval()
    with torch.no_grad():   # eval: MDNS always on (protonet.py:806-808)
        pred, loss = m.forward(t["support_x"], t["support_y"], t["query_x"],
                               t["query_y"], gt_support_y=t["gt_support_y"],
                               train=False)
    out["pc/eval/logits"] = pred.numpy()
    out["pc/eval/loss"] = np.float32(loss.item())

    for nm, tt in (("train", t), ("train_clean", tc)):
        m = fresh_pc().train()
        with torch.no_grad():
            pred, loss, contrast, *_ = m.forward(
                tt["support_x"], tt["support_y"], tt["query_x"],
                tt["query_y"], gt_support_y=tt["gt_support_y"], train=True,
                logger=_Logger(), support_flag=tt["support_flag"])
        out[f"pc/{nm}/logits"] = pred.numpy()
        out[f"pc/{nm}/loss"] = np.float32(loss.item())
        out[f"pc/{nm}/contrast_loss"] = np.float32(contrast.item())

    # ---------------- ProtoNet_transformer ----------------
    torch.manual_seed(5678)
    pt = ProtoNet_transformer(args)
    zero_all_dropout(pt)
    warm(pt)
    sdt = {k: v.detach().clone() for k, v in pt.state_dict().items()}
    for k, v in sdt.items():
        out[f"pt_sd/{k}"] = v.numpy()

    def fresh_pt():
        m = ProtoNet_transformer(args)
        m.load_state_dict(sdt)
        zero_all_dropout(m)
        return m

    m = fresh_pt().eval()
    with torch.no_grad():
        pred, loss = m.forward(t["support_x"], t["support_y"], t["query_x"],
                               t["query_y"], gt_support_y=t["gt_support_y"],
                               train=False)
    out["pt/eval/logits"] = pred.numpy()
    out["pt/eval/loss"] = np.float32(loss.item())

    m = fresh_pt().train()
    with torch.no_grad():
        pred, loss, binary_loss, clean_proto_loss, *_ = m.forward(
            t["support_x"], t["support_y"], t["query_x"], t["query_y"],
            gt_support_y=t["gt_support_y"], train=True, logger=_Logger(),
            support_flag=t["support_flag"])
    out["pt/train/logits"] = pred.numpy()
    out["pt/train/loss"] = np.float32(loss.item())
    out["pt/train/binary_loss"] = np.float32(binary_loss.item())
    out["pt/train/clean_proto_loss"] = np.float32(clean_proto_loss.item())

    # ---------------- segmentation heads ----------------
    xs = gen.uniform(0.0, 1.0, size=(4, 9, 64)).astype(np.float32)
    out["seg/x"] = xs
    for tag, cls_ in (("seg_v1", DGCNNSeg_attention),
                      ("seg_v2", DGCNNSeg_attention_v2)):
        torch.manual_seed(91 if tag == "seg_v1" else 92)
        sm = cls_(args, num_classes=7, dg_atten_dim=128)
        zero_all_dropout(sm)
        sm.train()
        with torch.no_grad():
            for _ in range(4):
                sm.forward(torch.tensor(
                    gen.standard_normal((4, 9, 64)).astype(np.float32)))
        sds = {k: v.detach().clone() for k, v in sm.state_dict().items()}
        for k, v in sds.items():
            out[f"{tag}_sd/{k}"] = v.numpy()
        sm.eval()
        with torch.no_grad():
            logits = sm.forward(torch.tensor(xs))
        out[f"{tag}/eval/logits"] = logits.numpy()
        sm.train()
        with torch.no_grad():
            logits = sm.forward(torch.tensor(xs))
        out[f"{tag}/train/logits"] = logits.numpy()

    out["meta"] = np.frombuffer(json.dumps({
        "n_way": 2, "k_shot": 3, "pc_npts": 64, "pc_in_dim": 9,
        "n_subprototypes": 8, "k_connect": 8, "sigma": 1.0, "dgcnn_k": 4,
        "edgeconv_widths": [[64, 64], [64, 64], [64, 64]],
        "dgcnn_mlp_widths": [512, 256], "base_widths": [128, 64],
        "output_dim": 64, "num_classes": 7, "dg_atten_dim": 128,
    }).encode(), dtype=np.uint8)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fix = os.path.join(root, "tests", "fixtures")
    os.makedirs(fix, exist_ok=True)
    np.savez_compressed(os.path.join(fix, "reference_parity_extra.npz"), **out)
    print(f"wrote tests/fixtures/reference_parity_extra.npz ({len(out)} arrays)")


if __name__ == "__main__":
    main()
