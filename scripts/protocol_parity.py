#!/usr/bin/env python
"""Composed protocol-level parity: the reference's OWN evaluation loop vs
this repo's eval CLI, on the SAME h5-cached episode set with the SAME
(converted) checkpoint (VERDICT r4 next-round #1).

Every parity ingredient exists as a per-module test (features, MDNS flags,
logits, losses, gradients, data contracts, cache interop); this script
closes the one integration none of them exercises — the full composition

    repo pretrain -> meta-train -> msgpack checkpoint -> torch .tar export
      -> reference `MyTestDataset_NoiseInMetaTest` h5 materialisation
        -> reference `test_few_shot`/`evaluate_metric`
           (`/root/reference/eval_noise.py:23-113`, torch CPU)
        -> repo `eval_noise.evaluate` (parity stack, converted-.tar load)
      -> the two mean-IoUs must agree.

Both loops are deterministic given the cached episodes (torch eval mode,
f32, no dropout/augment), so the only divergence source is cross-framework
f32 arithmetic flipping an argmax on a near-tie.  The pretrain stage keeps
predictions decisive (a collapsed ln(3) model makes every argmax a tie
lottery — see train_and_export); with discriminative features the residual
per-point flip rate is ~1e-3 and mean-IoU agrees to ~1e-3.

The reference orders cached episodes by glob() (loader.py:1634,1657) while
the repo enumerates them numerically — mean-IoU is accumulation over ALL
episodes' confusion counts, so the comparison is order-invariant
(scripts/debug_protocol_parity.py verifies content-level episode match).

Run: python scripts/protocol_parity.py [workdir] [--scale small|tiny]
Used by tests/test_protocol_parity.py (slow) at scale=tiny.
"""
from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import types
from types import SimpleNamespace

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)  # for the CLI/learner imports inside functions

NOISE_RATIO = 0.4
NOISE_TYPE = "sym"
CACHE_SEED = 88

# 'small' = flagship network at 256 pts (the recorded BASELINE.md number);
# 'tiny' = suite-runnable budget, same composition end to end.
SCALES = {
    "small": dict(
        pc_npts=256, n_subprototypes=20, k_connect=40,
        edgeconv_widths=((64, 64), (64, 64), (64, 64)),
        dgcnn_mlp_widths=(512, 256), base_widths=(128, 64), output_dim=64,
        dgcnn_k=20, pretrain_iters=400, train_iters=100, n_per_comb=2),
    "tiny": dict(
        pc_npts=128, n_subprototypes=8, k_connect=8,
        edgeconv_widths=((16, 16), (16, 16), (16, 16)),
        dgcnn_mlp_widths=(32, 24), base_widths=(16, 8), output_dim=8,
        dgcnn_k=8, pretrain_iters=150, train_iters=40, n_per_comb=1),
}


def force_cpu():
    """Pin jax to host CPU.  This container pre-imports jax with
    jax_platforms='axon,cpu' (sitecustomize), so the JAX_PLATFORMS env var
    is IGNORED — only a config update before the first jax op works.  CPU
    matters for parity: TPU f32 matmuls default to bf16 passes outside the
    repo's HIGHEST-precision hot spots, and this comparison must run the
    full f32 semantics the torch reference computes."""
    import jax
    jax.config.update("jax_platforms", "cpu")


def _quiet(fn, *a, **k):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out = fn(*a, **k)
    return out, buf.getvalue()


def _repo_cfg(ds, logdir, sc, sigma=1.0, **kw):
    from r3dfsseg_tpu.config import R3DConfig
    return R3DConfig(
        dataset="s3dis", cvfold=0, clean_data_path=ds,
        n_way=2, k_shot=5, n_queries=1, use_attention=True, sigma=sigma,
        pc_npts=sc["pc_npts"], n_subprototypes=sc["n_subprototypes"],
        k_connect=sc["k_connect"], edgeconv_widths=sc["edgeconv_widths"],
        dgcnn_mlp_widths=sc["dgcnn_mlp_widths"],
        base_widths=sc["base_widths"], output_dim=sc["output_dim"],
        dgcnn_k=sc["dgcnn_k"],
        # parity stack: reference-faithful semantics (BASELINE.md)
        compute_dtype="float32", affinity_impl="topk", lp_solver="solve",
        knn_impl="xla", fps_impl="xla", episode_batch=1,
        log_dir=logdir, save_path=os.path.dirname(logdir), **kw)


def train_and_export(ds: str, workdir: str, sc) -> str:
    """Pretrain the encoder, meta-train briefly (parity stack), export the
    best checkpoint as a reference-loadable torch .tar; returns the dir
    holding ONLY the .tar so the repo eval exercises the tar-conversion
    path too.

    The pretrain stage is load-bearing for the COMPARISON, not just
    fidelity to the reference protocol (which never meta-trains from a
    random encoder, README.md step 1): without it the sigma=1 synthetic
    task can collapse to the ln(3) state where logits are near-uniform and
    the argmax prediction is a pure f32-tie lottery — both eval loops then
    legitimately disagree on ~10% of points while agreeing on every loss
    to 1e-4.  Discriminative features make the predictions decisive, so
    cross-framework noise flips only genuine near-ties."""
    from flax import serialization

    from mpti_train_noise import train
    from pretrain import pretrain
    from r3dfsseg_tpu.utils.torch_convert import save_reference_checkpoint

    pre_ckpt = os.path.join(workdir, "pretrain",
                            "pretrain_checkpoint.msgpack")
    if not os.path.exists(pre_ckpt):
        pcfg = _repo_cfg(ds, os.path.join(workdir, "pretrain"), sc,
                         n_iters=sc["pretrain_iters"], seed=321,
                         phase="pretrain")
        pre_ckpt = pretrain(pcfg, batch_size=16)

    logdir = os.path.join(workdir, "train")
    cfg = _repo_cfg(ds, logdir, sc, n_iters=sc["train_iters"],
                    eval_interval=sc["train_iters"], n_episode_test=1,
                    n_workers=2, seed=21,
                    pretrain_checkpoint_path=pre_ckpt,
                    train_noise_ratio=(0.0, 0.2, 0.4), phase="mptitrain")
    train(cfg)
    src = os.path.join(logdir, "checkpoint.msgpack")
    with open(src, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    tar_dir = os.path.join(workdir, "ref_ckpt")
    os.makedirs(tar_dir, exist_ok=True)
    save_reference_checkpoint(
        os.path.join(tar_dir, "checkpoint.tar"), blob["params"],
        blob["batch_stats"], iteration=int(blob.get("iteration", 0)),
        loss=float(blob.get("loss", 0.0)), iou=float(blob.get("IoU", 0.0)),
        cfg=cfg)
    return tar_dir


def _ref_args(tar_dir: str, sc, sigma: float) -> SimpleNamespace:
    return SimpleNamespace(
        phase="mptinoise_eval", dataset="s3dis", cvfold=0,
        n_way=2, k_shot=5, n_queries=1, pc_npts=sc["pc_npts"],
        pc_attribs="xyzrgbXYZ", pc_in_dim=9, dgcnn_k=sc["dgcnn_k"],
        edgeconv_widths=[list(w) for w in sc["edgeconv_widths"]],
        dgcnn_mlp_widths=list(sc["dgcnn_mlp_widths"]),
        base_widths=list(sc["base_widths"]), output_dim=sc["output_dim"],
        use_attention=True, dist_method="gaussian",
        n_subprototypes=sc["n_subprototypes"], k_connect=sc["k_connect"],
        sigma=sigma, shot_seed=1, model_checkpoint_path=tar_dir,
        log_dir=tar_dir)


def _load_repo_learner(ds, tar_dir, sc, sigma=1.0, **cfg_kw):
    from r3dfsseg_tpu.data import StaticTestDataset
    from r3dfsseg_tpu.learners import MPTILearner
    from r3dfsseg_tpu.utils.torch_convert import (convert_for_phase,
                                                  load_torch_checkpoint)
    cfg = _repo_cfg(ds, os.path.join(tar_dir, "repo_eval"), sc, sigma=sigma,
                    phase="mptinoise_eval", n_episode_test=sc["n_per_comb"],
                    noise_ratio=NOISE_RATIO, noise_type=NOISE_TYPE,
                    model_checkpoint_path=tar_dir, seed=CACHE_SEED, **cfg_kw)
    dataset, _ = _quiet(
        StaticTestDataset, ds, "s3dis", cvfold=0,
        num_episode_per_comb=sc["n_per_comb"], n_way=2, k_shot=5,
        n_queries=1, num_point=sc["pc_npts"], pc_attribs="xyzrgbXYZ",
        mode="test", noise_ratio=NOISE_RATIO, noise_type=NOISE_TYPE,
        seed=CACHE_SEED)
    jl = MPTILearner(cfg)
    jl.init(dataset[0])
    sd = load_torch_checkpoint(os.path.join(tar_dir, "checkpoint.tar"))
    params, stats = convert_for_phase(sd, cfg)
    jl.load_params(params, stats)
    return cfg, dataset, jl


def calibrate_sigma(ds: str, tar_dir: str, sc) -> float:
    """Pick the gaussian affinity bandwidth from the trained features.

    sigma is a model hyperparameter in the reference too (`--sigma`,
    mpti.py:751); its default 1.0 is tuned to real S3DIS/ScanNet feature
    scales.  The synthetic task's features live at a different scale — at
    sigma=1 the affinity graph collapses (exp(-d^2/2) ~ 0 for every
    neighbour pair), LP output goes uniform, lp_loss pins at ln(3), and
    every argmax becomes an f32 tie-lottery, which would make the parity
    comparison vacuous.  Calibrate once — median k_connect-th-neighbour
    squared distance over episode-0 support features, sigma =
    sqrt(med/2) so a typical neighbour edge weighs e^-1 — and pass the
    SAME value to BOTH eval loops."""
    import jax.numpy as jnp

    _, dataset, jl = _load_repo_learner(ds, tar_dir, sc)
    ep = dataset[0]
    sf, _ = jl.model.apply(
        {"params": jl.state.params, "batch_stats": jl.state.batch_stats},
        ep.with_batch_dim(), False,
        method=lambda m, e, t: m.extract_features(e, t))
    f = np.asarray(sf[0], np.float32).reshape(-1, sf.shape[-1])
    if len(f) > 2048:
        f = f[np.random.default_rng(0).choice(len(f), 2048, replace=False)]
    d2 = ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1)
    kth = np.sort(d2, axis=1)[:, min(sc["k_connect"], len(f) - 1)]
    sigma = float(np.sqrt(np.median(kth) / 2.0))
    return max(round(sigma, 2), 1e-3)


def _import_reference():
    """Import the reference's eval/loader/learner modules with the native
    deps stubbed (exact-semantics stubs, scripts/make_reference_fixture.py)
    under a module name that can't shadow this repo's eval_noise.py."""
    import importlib.util

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from make_reference_fixture import install_stubs
    finally:
        sys.path.remove(os.path.join(REPO, "scripts"))
    install_stubs()
    if not hasattr(np, "int"):
        np.int = int  # reference loader.py uses np.int at runtime
    for mod in ("open3d", "transforms3d"):
        if mod not in sys.modules:
            try:
                __import__(mod)
            except ImportError:
                sys.modules[mod] = types.ModuleType(mod)
    sys.path.insert(0, "/root/reference")
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_eval_noise", "/root/reference/eval_noise.py")
        ref_eval = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_eval)
    finally:
        sys.path.remove("/root/reference")
    return ref_eval


def _reference_dataset(ds: str, sc):
    """Build (or, when the dir exists, consume) the h5 episode cache with
    the REFERENCE's own materialiser (loader.py:1599-1659)."""
    from dataloaders.loader import MyTestDataset_NoiseInMetaTest

    np.random.seed(CACHE_SEED)  # the materialiser draws from global np.random
    dataset, _ = _quiet(
        MyTestDataset_NoiseInMetaTest, ds, "s3dis", cvfold=0,
        num_episode_per_comb=sc["n_per_comb"], n_way=2, k_shot=5,
        n_queries=1, num_point=sc["pc_npts"], pc_attribs="xyzrgbXYZ",
        mode="test", ReturnCluster=False, noise_ratio=NOISE_RATIO,
        noise_type=NOISE_TYPE)
    return dataset


def reference_eval(ds: str, tar_dir: str, sc, sigma: float):
    """The reference's own loop: MyTestDataset_NoiseInMetaTest,
    MPTILearner_V3 loading checkpoint.tar, test_few_shot ->
    evaluate_metric (eval_noise.py:23-113), torch CPU."""
    from torch.utils.data import DataLoader

    ref_eval = _import_reference()
    from dataloaders.loader import batch_test_task_collate_test
    from models.mpti_learner import MPTILearner_V3

    dataset = _reference_dataset(ds, sc)
    classes = list(dataset.classes)
    loader = DataLoader(dataset, batch_size=1, shuffle=False,
                        collate_fn=batch_test_task_collate_test)
    learner, _ = _quiet(MPTILearner_V3, _ref_args(tar_dir, sc, sigma),
                        "test")

    class _Log:
        lines: list = []

        def cprint(self, s):
            self.lines.append(str(s))

    log = _Log()
    (loss, iou), _ = _quiet(ref_eval.test_few_shot, loader, learner, log,
                            classes, path=None, eval=True)
    return float(loss), float(iou)


def repo_eval(ds: str, tar_dir: str, sc, sigma: float):
    """This repo's eval CLI over the SAME h5 cache (StaticTestDataset finds
    the reference-materialised dir) + the SAME .tar (converted on load),
    parity stack."""
    from eval_noise import evaluate
    cfg = _repo_cfg(ds, os.path.join(tar_dir, "repo_eval"), sc, sigma=sigma,
                    phase="mptinoise_eval", n_episode_test=sc["n_per_comb"],
                    noise_ratio=NOISE_RATIO, noise_type=NOISE_TYPE,
                    model_checkpoint_path=tar_dir, seed=CACHE_SEED)
    iou, _ = _quiet(evaluate, cfg)
    return float(iou)


def run(workdir: str, *, scale: str = "small"):
    from r3dfsseg_tpu.data.synthetic import make_synthetic_dataset

    sc = SCALES[scale]
    ds = os.path.join(workdir, "blocks")
    if not os.path.isdir(os.path.join(ds, "data")):
        make_synthetic_dataset(ds, n_scans=60, pts_per_scan=2048, seed=7)
    tar_dir = os.path.join(workdir, "ref_ckpt")
    if not os.path.exists(os.path.join(tar_dir, "checkpoint.tar")):
        tar_dir = train_and_export(ds, workdir, sc)
    _import_reference()           # stubs + reference modules
    _reference_dataset(ds, sc)    # materialise the cache (reference side)
    sigma = calibrate_sigma(ds, tar_dir, sc)
    ref_loss, ref_iou = reference_eval(ds, tar_dir, sc, sigma)
    ours_iou = repo_eval(ds, tar_dir, sc, sigma)
    out = {"scale": scale, "sigma": sigma, "ref_mean_iou": ref_iou,
           "repo_mean_iou": ours_iou, "delta": ours_iou - ref_iou,
           "ref_loss": ref_loss,
           "n_episodes": sc["n_per_comb"] * 15}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    # both sides run on host CPU: the reference loop is torch CPU, and the
    # repo's parity stack is f32 XLA (platform-independent semantics) — so
    # the script never touches the TPU tunnel
    force_cpu()
    argv = [a for a in sys.argv[1:]]
    scale = "small"
    if "--scale" in argv:
        i = argv.index("--scale")
        scale = argv[i + 1]
        del argv[i:i + 2]
    wd = argv[0] if argv else "/tmp/protocol_parity"
    os.makedirs(wd, exist_ok=True)
    run(wd, scale=scale)
