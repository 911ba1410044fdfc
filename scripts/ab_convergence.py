#!/usr/bin/env python
"""A/B accuracy validation of the optimized design point (VERDICT round-1
item 4): train the SAME synthetic task with

  A (optimized): episode_batch=E, bf16 encoder, threshold affinity, CG-30
  B (parity):    episode_batch=1, f32, topk affinity, dense solve

and compare validation mean-IoU.  The optimized stack changes BN batch
semantics (statistics span E x 10 clouds), neighbour tie handling, solver
and precision — this run is the evidence they do not change learning.

Run on the TPU chip: python scripts/ab_convergence.py [n_iters]
Results are appended to the stdout table; copy into BASELINE.md.
"""
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(tag, ds, tmp, n_iters, **kw):
    from mpti_train_noise import train
    from r3dfsseg_tpu.config import R3DConfig

    cfg = R3DConfig(
        dataset="s3dis", cvfold=0, clean_data_path=ds,
        n_way=2, k_shot=5, n_queries=1, pc_npts=2048, use_attention=True,
        n_iters=n_iters, eval_interval=max(n_iters // 2, 1),
        n_episode_test=2, n_workers=4, seed=kw.pop("seed", 123),
        train_noise_ratio=(0.0, 0.2, 0.4),
        log_dir=os.path.join(tmp, tag), save_path=tmp, **kw)
    train(cfg)
    log = open(os.path.join(cfg.log_dir, "log_mptitrain.txt")).read()
    ious = [float(m) for m in re.findall(r"Mean IoU: ([0-9.]+)", log)]
    losses = [float(m) for m in re.findall(
        r"==\[Train\] Iter: \d+ \| Loss: ([0-9.]+)", log)]
    return ious, losses


def pretrain_encoder(ds, tmp, n_iters=400):
    """Reference-protocol prologue: supervised pretrain of the feature
    extractor on the (synthetic) train split.  The real workflow NEVER
    meta-trains from a random encoder (`/root/reference/README.md` step 1,
    `mpti_train_noise.py:61-64`), and from-scratch meta-training on
    synthetic data sits in a marginal ln(3)-plateau regime where escape is
    seed-luck — pretraining removes that confounder from the A/B."""
    from pretrain import pretrain
    from r3dfsseg_tpu.config import R3DConfig

    cfg = R3DConfig(dataset="s3dis", cvfold=0, clean_data_path=ds,
                    pc_npts=2048, use_attention=True, n_iters=n_iters,
                    seed=321, log_dir=os.path.join(tmp, "pretrain"),
                    save_path=tmp, phase="pretrain")
    return pretrain(cfg, batch_size=16)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_iters = int(args[0]) if args else 2000
    # --sigma0: auto-bandwidth affinity on BOTH legs.  With the reference's
    # fixed sigma=1 the synthetic task is bistable (both legs can fall into
    # the ln(3) graph-collapse state regardless of numerics — DESIGN.md);
    # auto bandwidth removes the collapse mode so the A/B actually compares
    # learning dynamics.
    extra = {"sigma": 0.0} if "--sigma0" in sys.argv else {}
    from r3dfsseg_tpu.data.synthetic import make_synthetic_dataset
    tmp = tempfile.mkdtemp(prefix="ab_")
    ds = make_synthetic_dataset(os.path.join(tmp, "blocks"), n_scans=60,
                                pts_per_scan=4096, seed=7)
    ckpt = pretrain_encoder(ds, tmp)

    # current design point: bf16 everywhere the relaxed contract allows
    # (encoder + attention matmuls, graph gram, neighbour compare, solver
    # matvec storage, einsum scatter backward), cheby-50 forward solve,
    # truncated cheby-30 adjoint solve.
    a_iou, a_loss = run("optimized", ds, tmp, n_iters,
                        pretrain_checkpoint_path=ckpt,
                        episode_batch=1, compute_dtype="bfloat16",
                        affinity_impl="threshold", lp_solver="cheby",
                        lp_cg_iters=50, lp_adjoint_iters=30, **extra)
    b_iou, b_loss = run("parity", ds, tmp, n_iters,
                        pretrain_checkpoint_path=ckpt,
                        episode_batch=1, compute_dtype="float32",
                        affinity_impl="topk", lp_solver="solve",
                        knn_impl="xla", **extra)

    k = min(len(a_loss), len(b_loss), 50)
    print("\n==== A/B convergence (%d iters, synthetic) ====" % n_iters)
    print("optimized: val IoU %s | first/last-50 train loss %.4f -> %.4f"
          % (a_iou, float(np.mean(a_loss[:k])), float(np.mean(a_loss[-k:]))))
    print("parity:    val IoU %s | first/last-50 train loss %.4f -> %.4f"
          % (b_iou, float(np.mean(b_loss[:k])), float(np.mean(b_loss[-k:]))))
    if a_iou and b_iou:
        d = a_iou[-1] - b_iou[-1]
        print("final IoU delta (optimized - parity): %+.4f" % d)
        print("PASS" if abs(d) <= 0.05 else "FAIL (>0.05 apart)")


if __name__ == "__main__":
    main()
