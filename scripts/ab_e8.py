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

Two budgets (round-4 results in BASELINE.md):
  * default: 2000 EPISODES (= 250 steps at E=8) — the equal-episode
    comparison; trails the band as plain mini-batching predicts (0.189
    mean over 3 seeds);
  * --eqstep: 16000 episodes (= 2000 steps) — the equal-STEP comparison;
    5-seed final mean 0.398 +- 0.09 vs parity mean 0.327
    (0.416/0.447/0.230/0.450/0.447; best-validation mean 0.414 — every
    seed in or above band by best-val, see BASELINE.md round-5 table),
    validating the multi-chip design point (N chips advance the same
    step clock through N episodes at a time).

Usage: python scripts/ab_e8.py [workdir] [--eqstep] [--seeds 126,127]
(resumes a workdir; default seeds 123,124,125)
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
    eqstep = "--eqstep" in sys.argv
    seeds = (123, 124, 125)
    argv = list(sys.argv[1:])
    if "--seeds" in argv:
        i = argv.index("--seeds")
        seeds = tuple(int(s) for s in argv[i + 1].split(","))
        del argv[i:i + 2]
    args = [a for a in argv if not a.startswith("--")]
    if args:
        tmp = args[0]
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
    n_iters = 16000 if eqstep else 2000
    for seed in seeds:
        tag = f"e8_{'eqstep_' if eqstep else 'seed'}{seed}"
        if os.path.isdir(os.path.join(tmp, tag)):
            print(f"skip {tag} (exists)", flush=True)
            continue
        ious, losses = run(tag, ds, tmp, n_iters,
                           pretrain_checkpoint_path=ckpt,
                           episode_batch=8, seed=seed, **DESIGN_POINT)
        k = min(len(losses), 50)
        line = ("LEG %s (%d episodes) val IoU %s | first/last-50 loss "
                "%.4f -> %.4f" % (tag, n_iters, ious,
                                  float(np.mean(losses[:k])),
                                  float(np.mean(losses[-k:]))))
        print(line, flush=True)
        with open(results_path, "a") as f:
            f.write(line + "\n")
    print("done", flush=True)


if __name__ == "__main__":
    main()
