#!/usr/bin/env python
"""E=8 episode-batching convergence A/B (VERDICT r3 next-round #1).

With per-episode BatchNorm (GroupedBatchNorm) the only difference between
episode_batch=1 and episode_batch=8 is gradient averaging over 8 episodes
per optimizer step (the LR staircase is already rescaled to episode
terms, learners/base.py:67-85).  This runs the established ab_convergence
protocol (synthetic task, pretrained encoder, sigma=0, 2000 EPISODES, val
IoU at 1000/2000) at the shipped optimized design point with
episode_batch=8 for 3 seeds; in-band = within the documented parity seed
spread (0.28-0.34, BASELINE.md).

Single chip suffices: the semantics depend on E, not the device count
(device-count invariance is pinned by
tests/test_parallel.py::test_mesh_size_independence_1_2_4_8).

Usage: python scripts/ab_e8.py [workdir]   # resumes an existing workdir
Appends results to <workdir>/ab_e8_results.txt
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from ab_convergence import pretrain_encoder, run  # noqa: E402

DESIGN_POINT = dict(compute_dtype="bfloat16", bn_mode="fastvar",
                    affinity_impl="threshold", lp_solver="cheby",
                    lp_cg_iters=50, lp_adjoint_iters=30, sigma=0.0)


def main():
    if len(sys.argv) > 1:
        tmp = sys.argv[1]
        os.makedirs(tmp, exist_ok=True)
    else:
        tmp = tempfile.mkdtemp(prefix="ab_e8_")
    print(f"workdir: {tmp}", flush=True)

    ds = os.path.join(tmp, "blocks")
    if not os.path.isdir(os.path.join(ds, "data")):
        from r3dfsseg_tpu.data.synthetic import make_synthetic_dataset
        make_synthetic_dataset(ds, n_scans=60, pts_per_scan=4096, seed=7)
    ckpt = os.path.join(tmp, "pretrain", "pretrain_checkpoint.msgpack")
    if not os.path.exists(ckpt):
        print("pretraining encoder (400 iters)...", flush=True)
        pretrain_encoder(ds, tmp)

    results_path = os.path.join(tmp, "ab_e8_results.txt")
    for seed in (123, 124, 125):
        tag = f"e8_seed{seed}"
        if os.path.isdir(os.path.join(tmp, tag)):
            print(f"skip {tag} (exists)", flush=True)
            continue
        ious, losses = run(tag, ds, tmp, 2000, pretrain_checkpoint_path=ckpt,
                           episode_batch=8, seed=seed, **DESIGN_POINT)
        k = min(len(losses), 50)
        line = ("LEG %s val IoU %s | first/last-50 loss %.4f -> %.4f"
                % (tag, ious, float(np.mean(losses[:k])),
                   float(np.mean(losses[-k:]))))
        print(line, flush=True)
        with open(results_path, "a") as f:
            f.write(line + "\n")
    print("done", flush=True)


if __name__ == "__main__":
    main()
