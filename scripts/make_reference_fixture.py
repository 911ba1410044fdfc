"""Generate golden-parity fixtures from the REAL reference model.

Runs `/root/reference/models/mpti.py` `MPTI_SelfAtten.forward` on CPU with
exact-semantics stubs for its three native deps (faiss, torch_cluster.fps,
torch_scatter), on small fixed episodes, and records:

  * the torch state_dict (reference tensor layout),
  * the episodes (reference channels-first layout),
  * outputs per mode: query logits + lp_loss for eval (plain & MDNS),
    + contrast_loss for train, + MDNS clean flags + eval support features.

`tests/test_reference_parity.py` replays the same episodes through the
TPU-native `MPTINet` with converted weights and asserts agreement — this is
the check that the rebuild matches the *actual* reference episode
algorithm (mpti.py:414-577), not a transliterated oracle.

Stub semantics (documented against upstream sources):
  * torch_cluster.fps(random_start=False): start at index 0, iterate
    argmax-of-min-distance; output count = ceil(float32(n) * float32(ratio))
    (fps_cpu.cpp computes `(deg.float() * ratio).ceil()`).  The fixture
    episodes are chosen so this equals the requested k everywhere the
    ratio<1 branch runs (and asserts so) — the TPU build uses fixed k
    slots, which matches except for float-ceil corner cases.
  * faiss.IndexFlatL2.search: exact squared-L2, ascending, stable ties —
    self is always first (the reference strips column 0, mpti.py:736).
  * torch_scatter.scatter_*: only imported, not reached by forward.

Dropout is zeroed on both sides (the reference's attention dropout is
stochastic; parity is tested at rate 0).

Usage: python scripts/make_reference_fixture.py  (writes
tests/fixtures/reference_parity.npz)
"""
from __future__ import annotations

import json
import math
import sys
import types
from types import SimpleNamespace

import numpy as np
import torch

# ----------------------------------------------------------------------
# Native-dep stubs, installed before importing the reference.
# ----------------------------------------------------------------------
FPS_CALLS: list = []  # (n, ratio, m) per call, for the count-rule assertion


def _fps(src, batch=None, ratio=None, random_start=True):
    assert batch is None and not random_start
    x = src.detach().cpu().numpy().astype(np.float32)
    n = x.shape[0]
    m = int(math.ceil(float(np.float32(n) * np.float32(ratio))))
    m = max(1, min(m, n))
    FPS_CALLS.append((n, float(ratio), m))
    sel = np.zeros(m, np.int64)
    d = ((x - x[0]) ** 2).sum(1)
    for i in range(1, m):
        sel[i] = int(d.argmax())
        d = np.minimum(d, ((x - x[sel[i]]) ** 2).sum(1))
    return torch.from_numpy(sel)


class _IndexFlatL2:
    def __init__(self, d):
        self.d = d
        self._x = None

    def add(self, x):
        self._x = np.asarray(x, np.float32)

    def search(self, q, k):
        q = np.asarray(q, np.float32)
        d2 = ((q[:, None, :] - self._x[None, :, :]) ** 2).sum(-1)
        idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(d2, idx, 1), idx


def _scatter(reduce):
    def f(src, index, dim=-1, out=None, dim_size=None):
        index = index.long()
        size = int(index.max()) + 1 if dim_size is None else dim_size
        shape = list(src.shape)
        shape[dim] = size
        if reduce == "max":
            out = torch.full(shape, -float("inf"), dtype=src.dtype)
            out = out.index_reduce(dim, index, src, "amax", include_self=False)
            return out, None
        out = torch.zeros(shape, dtype=src.dtype)
        out = out.index_add(dim, index, src)
        if reduce == "mean":
            cnt = torch.zeros(size, dtype=src.dtype).index_add(
                0, index, torch.ones(index.shape[0], dtype=src.dtype))
            cnt = torch.clamp(cnt, min=1)
            view = [1] * out.dim()
            view[dim] = size
            out = out / cnt.view(view)
        return out
    return f


def _pairwise_distance_18(x1, x2, p=2.0, eps=1e-6, keepdim=False):
    """torch 1.8 semantics: reduce over dim=1 (the reference environment is
    'PyTorch 1.8', README.md:13-16).  Modern torch reduces over the LAST dim,
    which silently breaks both reference call sites (mpti.py:618,744) —
    (n, d, k)-broadcast inputs must norm over the d axis."""
    return torch.norm(x1 - x2 + eps, p=p, dim=1, keepdim=keepdim)


def install_stubs():
    torch.nn.functional.pairwise_distance = _pairwise_distance_18
    faiss = types.ModuleType("faiss")
    faiss.IndexFlatL2 = _IndexFlatL2
    sys.modules["faiss"] = faiss
    tc = types.ModuleType("torch_cluster")
    tc.fps = _fps
    sys.modules["torch_cluster"] = tc
    ts = types.ModuleType("torch_scatter")
    ts.scatter_mean = _scatter("mean")
    ts.scatter_add = _scatter("add")
    ts.scatter_max = _scatter("max")
    sys.modules["torch_scatter"] = ts
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]


class _Logger:
    def cprint(self, *a, **k):
        pass


def zero_dropout(model):
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0


# ----------------------------------------------------------------------
# Episode construction (reference channels-first layout).
# ----------------------------------------------------------------------
def make_episode(gen, n_way, k_shot, npts, cin, fg_counts, flags, noisy_shots):
    """fg_counts: (n_way, k_shot) ints; flags: (n_way, k_shot) absolute class;
    noisy_shots: set of (way, shot) whose gt mask is zeroed."""
    sx = gen.uniform(0.0, 1.0, size=(n_way, k_shot, cin, npts)).astype(np.float32)
    sy = np.zeros((n_way, k_shot, npts), np.int64)
    for w in range(n_way):
        for k in range(k_shot):
            idx = gen.choice(npts, size=fg_counts[w][k], replace=False)
            sy[w, k, idx] = 1
            # pull each shot's fg points spatially together so MDNS grids
            # see coherent clusters (centres differ per shot)
            c = gen.uniform(0.2, 0.8, size=(3, 1))
            pts = (c + 0.12 * gen.standard_normal((3, fg_counts[w][k]))).T
            sx[w, k, :3, idx] = pts.astype(np.float32)  # target (n_idx, 3)
    gt_sy = sy.copy()
    for (w, k) in noisy_shots:
        gt_sy[w, k] = 0
    qx = gen.uniform(0.0, 1.0, size=(n_way, cin, npts)).astype(np.float32)
    qy = gen.integers(0, n_way + 1, size=(n_way, npts)).astype(np.int64)
    gt_qy = np.where(gen.uniform(size=qy.shape) < 0.8, qy,
                     gen.integers(0, n_way + 1, size=qy.shape)).astype(np.int64)
    flag = np.asarray(flags, np.float32)
    return dict(support_x=sx, support_y=sy, query_x=qx, query_y=qy,
                gt_support_y=gt_sy, gt_query_y=gt_qy, support_flag=flag)


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    from models.mpti import MPTI_SelfAtten  # noqa: E402
    from models.protonet import ProtoNet as RefProtoNet  # noqa: E402

    args = SimpleNamespace(
        n_way=2, k_shot=3, pc_in_dim=9, pc_npts=64, use_attention=True,
        n_subprototypes=8, k_connect=8, sigma=1.0,
        edgeconv_widths=[[8, 8], [8, 8], [8, 8]], dgcnn_mlp_widths=[16, 16],
        base_widths=[8, 8], output_dim=8, dgcnn_k=4, shot_seed=1,
        dist_method="cosine")

    torch.manual_seed(31337)
    model = MPTI_SelfAtten(args)
    zero_dropout(model)

    # warm the BN running stats so eval-mode normalisation is non-trivial
    gen = np.random.default_rng(20260816)
    model.train()
    with torch.no_grad():
        for _ in range(4):
            x = torch.tensor(gen.standard_normal(
                (6, args.pc_in_dim, args.pc_npts)).astype(np.float32))
            model.getFeatures(x)
    sd = {k: v.detach().clone() for k, v in model.state_dict().items()}

    fixtures = {
        # all shots clean & same flag per way -> WayContrast borrows negatives
        "f0": make_episode(gen, 2, 3, 64, 9,
                           fg_counts=[[20, 24, 28], [18, 22, 26]],
                           flags=[[3, 3, 3], [7, 7, 7]], noisy_shots=[]),
        # way0 mixed flags (no borrowing) + one tiny-fg shot (ratio>=1
        # branch in getMutiplePrototypes for WayContrast fps_k=4) + one
        # noisy shot gt for MDNS diagnostics
        "f1": make_episode(gen, 2, 3, 64, 9,
                           fg_counts=[[20, 3, 28], [18, 22, 26]],
                           flags=[[3, 5, 3], [7, 7, 7]],
                           noisy_shots=[(0, 1)]),
    }

    out = {}
    for name, ep in fixtures.items():
        for field, arr in ep.items():
            out[f"{name}/ep/{field}"] = arr
        t = {k: torch.tensor(v) for k, v in ep.items()}

        def fresh():
            m = MPTI_SelfAtten(args)
            m.load_state_dict(sd)
            zero_dropout(m)
            return m

        # --- eval, no MDNS ---
        m = fresh().eval()
        with torch.no_grad():
            sfeat = m.getFeatures(t["support_x"].view(-1, 9, 64)).view(2, 3, -1, 64)
            out[f"{name}/support_feat_eval"] = sfeat.numpy()
            pred, lp = m.forward(t["support_x"], t["support_y"], t["query_x"],
                                 t["query_y"], gt_support_y=t["gt_support_y"],
                                 gt_query_y=t["gt_query_y"], train=False, eval=False)
        out[f"{name}/eval_plain/logits"] = pred.numpy()
        out[f"{name}/eval_plain/lp_loss"] = np.float32(lp.item())

        # --- eval with MDNS ---
        m = fresh().eval()
        with torch.no_grad():
            _, flags = m.Mean_pl_support_y_multi_scale(
                sfeat, t["support_y"], t["gt_support_y"], t["support_x"])
            out[f"{name}/eval_mdns/clean_flag"] = flags.numpy()
            pred, lp = m.forward(t["support_x"], t["support_y"], t["query_x"],
                                 t["query_y"], gt_support_y=t["gt_support_y"],
                                 gt_query_y=t["gt_query_y"], train=False, eval=True)
        out[f"{name}/eval_mdns/logits"] = pred.numpy()
        out[f"{name}/eval_mdns/lp_loss"] = np.float32(lp.item())

        # --- train (BN batch stats; dropout zeroed) ---
        m = fresh().train()
        with torch.no_grad():
            pred, lp, contrast, *_ = m.forward(
                t["support_x"], t["support_y"], t["query_x"], t["query_y"],
                gt_support_y=t["gt_support_y"], gt_query_y=t["gt_query_y"],
                train=True, logger=_Logger(), support_flag=t["support_flag"])
        out[f"{name}/train/logits"] = pred.numpy()
        out[f"{name}/train/lp_loss"] = np.float32(lp.item())
        out[f"{name}/train/contrast_loss"] = np.float32(contrast.item())

        # --- train-step gradients: d(lp + 0.1*contrast)/d(params), the
        # exact loss the reference learner backprops (mpti_learner.py:66).
        # Captured AFTER the no-grad forwards so the RNG streams (and
        # therefore every fixture value above) are unchanged. ---
        m = fresh().train()
        pred, lp, contrast, *_ = m.forward(
            t["support_x"], t["support_y"], t["query_x"], t["query_y"],
            gt_support_y=t["gt_support_y"], gt_query_y=t["gt_query_y"],
            train=True, logger=_Logger(), support_flag=t["support_flag"])
        (lp + 0.1 * contrast).backward()
        for pname, p in m.named_parameters():
            if p.grad is not None:
                out[f"{name}/train_grads/{pname}"] = p.grad.detach().numpy()

    # --- ProtoNet baseline parity (protonet.py:245-275), reusing the same
    # feature-extractor weights and the f0 episode ---
    enc_sd = {k: v for k, v in sd.items() if not k.startswith("proj.")}
    t = {k: torch.tensor(v) for k, v in fixtures["f0"].items()}
    for dist in ("cosine", "euclidean"):
        args.dist_method = dist
        for mode in ("eval", "train"):
            pm = RefProtoNet(args)
            pm.load_state_dict(enc_sd, strict=True)
            zero_dropout(pm)
            pm.train() if mode == "train" else pm.eval()
            with torch.no_grad():
                pred, loss = pm.forward(t["support_x"], t["support_y"],
                                        t["query_x"], t["query_y"])
            out[f"proto/{dist}/{mode}/logits"] = pred.numpy()
            out[f"proto/{dist}/{mode}/loss"] = np.float32(loss.item())

    # the TPU build pads to fixed k slots; assert the reference's float-ceil
    # count rule produced exactly k for every ratio<1 call in these episodes
    bad = [(n, r, m_) for (n, r, m_) in FPS_CALLS if m_ != round(r * n)]
    assert not bad, f"fps float-ceil produced k+1 on {bad}; pick another seed"

    for k, v in sd.items():
        out[f"sd/{k}"] = v.numpy()
    out["meta"] = np.frombuffer(json.dumps({
        "n_way": 2, "k_shot": 3, "pc_npts": 64, "pc_in_dim": 9,
        "n_subprototypes": 8, "k_connect": 8, "sigma": 1.0, "dgcnn_k": 4,
        "edgeconv_widths": [[8, 8], [8, 8], [8, 8]],
        "dgcnn_mlp_widths": [16, 16], "base_widths": [8, 8], "output_dim": 8,
        "fixtures": list(fixtures)}).encode(), dtype=np.uint8)

    import os
    os.makedirs("tests/fixtures", exist_ok=True)
    np.savez_compressed("tests/fixtures/reference_parity.npz", **out)
    print(f"wrote tests/fixtures/reference_parity.npz "
          f"({len(out)} arrays, fps calls: {len(FPS_CALLS)})")


def cfg2():
    """Second architecture preset: 3-way 2-shot, NO attention (the
    reference's `linear_mapper` Conv1d branch, mpti.py:64-66,593-595).
    Exercises episode-core semantics the default fixture can't: a 4-class
    label-propagation label matrix, 3-way WayContrast negative borrowing,
    and the 2-shot MDNS majority vote.  Writes
    tests/fixtures/reference_parity_cfg2.npz (same schema; meta carries
    use_attention so the parity tests configure MPTINet from it)."""
    install_stubs()
    sys.path.insert(0, "/root/reference")
    from models.mpti import MPTI_SelfAtten  # noqa: E402

    args = SimpleNamespace(
        n_way=3, k_shot=2, pc_in_dim=9, pc_npts=64, use_attention=False,
        n_subprototypes=6, k_connect=6, sigma=1.0,
        edgeconv_widths=[[8, 8], [8, 8], [8, 8]], dgcnn_mlp_widths=[16, 16],
        base_widths=[8, 8], output_dim=8, dgcnn_k=4, shot_seed=1,
        dist_method="cosine")

    torch.manual_seed(4242)
    model = MPTI_SelfAtten(args)
    zero_dropout(model)
    gen = np.random.default_rng(20260819)
    model.train()
    with torch.no_grad():
        for _ in range(4):
            x = torch.tensor(gen.standard_normal(
                (6, args.pc_in_dim, args.pc_npts)).astype(np.float32))
            model.getFeatures(x)
    sd = {k: v.detach().clone() for k, v in model.state_dict().items()}

    fixtures = {
        # all-clean 3-way episode -> borrowed negatives from the next way
        "g0": make_episode(gen, 3, 2, 64, 9,
                           fg_counts=[[20, 24], [18, 22], [16, 24]],
                           flags=[[2, 2], [5, 5], [9, 9]], noisy_shots=[]),
        # mixed flags on way 1 + a tiny-fg shot + a noisy shot for MDNS
        "g1": make_episode(gen, 3, 2, 64, 9,
                           fg_counts=[[20, 24], [3, 22], [16, 24]],
                           flags=[[2, 2], [5, 8], [9, 9]],
                           noisy_shots=[(1, 0)]),
    }

    w, k, npts = args.n_way, args.k_shot, args.pc_npts
    out = {}
    for name, ep in fixtures.items():
        for field, arr in ep.items():
            out[f"{name}/ep/{field}"] = arr
        t = {kk: torch.tensor(v) for kk, v in ep.items()}

        def fresh():
            m = MPTI_SelfAtten(args)
            m.load_state_dict(sd)
            zero_dropout(m)
            return m

        m = fresh().eval()
        with torch.no_grad():
            sfeat = m.getFeatures(
                t["support_x"].view(-1, 9, npts)).view(w, k, -1, npts)
            out[f"{name}/support_feat_eval"] = sfeat.numpy()
            pred, lp = m.forward(t["support_x"], t["support_y"],
                                 t["query_x"], t["query_y"],
                                 gt_support_y=t["gt_support_y"],
                                 gt_query_y=t["gt_query_y"],
                                 train=False, eval=False)
        out[f"{name}/eval_plain/logits"] = pred.numpy()
        out[f"{name}/eval_plain/lp_loss"] = np.float32(lp.item())

        m = fresh().eval()
        with torch.no_grad():
            _, flags = m.Mean_pl_support_y_multi_scale(
                sfeat, t["support_y"], t["gt_support_y"], t["support_x"])
            out[f"{name}/eval_mdns/clean_flag"] = flags.numpy()
            pred, lp = m.forward(t["support_x"], t["support_y"],
                                 t["query_x"], t["query_y"],
                                 gt_support_y=t["gt_support_y"],
                                 gt_query_y=t["gt_query_y"],
                                 train=False, eval=True)
        out[f"{name}/eval_mdns/logits"] = pred.numpy()
        out[f"{name}/eval_mdns/lp_loss"] = np.float32(lp.item())

        m = fresh().train()
        with torch.no_grad():
            pred, lp, contrast, *_ = m.forward(
                t["support_x"], t["support_y"], t["query_x"], t["query_y"],
                gt_support_y=t["gt_support_y"], gt_query_y=t["gt_query_y"],
                train=True, logger=_Logger(), support_flag=t["support_flag"])
        out[f"{name}/train/logits"] = pred.numpy()
        out[f"{name}/train/lp_loss"] = np.float32(lp.item())
        out[f"{name}/train/contrast_loss"] = np.float32(contrast.item())

        m = fresh().train()
        pred, lp, contrast, *_ = m.forward(
            t["support_x"], t["support_y"], t["query_x"], t["query_y"],
            gt_support_y=t["gt_support_y"], gt_query_y=t["gt_query_y"],
            train=True, logger=_Logger(), support_flag=t["support_flag"])
        (lp + 0.1 * contrast).backward()
        for pname, p in m.named_parameters():
            if p.grad is not None:
                out[f"{name}/train_grads/{pname}"] = p.grad.detach().numpy()

    bad = [(n, r, m_) for (n, r, m_) in FPS_CALLS if m_ != round(r * n)]
    assert not bad, f"fps float-ceil produced k+1 on {bad}; pick another seed"

    for kk, v in sd.items():
        out[f"sd/{kk}"] = v.numpy()
    out["meta"] = np.frombuffer(json.dumps({
        "n_way": 3, "k_shot": 2, "pc_npts": 64, "pc_in_dim": 9,
        "n_subprototypes": 6, "k_connect": 6, "sigma": 1.0, "dgcnn_k": 4,
        "edgeconv_widths": [[8, 8], [8, 8], [8, 8]],
        "dgcnn_mlp_widths": [16, 16], "base_widths": [8, 8], "output_dim": 8,
        "use_attention": False,
        "fixtures": list(fixtures)}).encode(), dtype=np.uint8)

    import os
    os.makedirs("tests/fixtures", exist_ok=True)
    np.savez_compressed("tests/fixtures/reference_parity_cfg2.npz", **out)
    print(f"wrote tests/fixtures/reference_parity_cfg2.npz "
          f"({len(out)} arrays, fps calls: {len(FPS_CALLS)})")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "cfg2":
        cfg2()
    else:
        main()
