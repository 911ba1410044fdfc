#!/usr/bin/env python
"""Turnkey reference-protocol runner (VERDICT r3 missing #2 / next-round #6).

One command that, given a prepared blocks directory (or a raw room dump —
`scripts/prepare_data.py` is invoked automatically when no `data/` subdir
is found), chains the full reference protocol
(`/root/reference/README.md:36-64`):

    pretrain -> noisy meta-train (train_noise_ratio [0,0.2,0.4], pc_augm)
             -> eval {clean, sym 0.4, ood 0.4}

for each requested (dataset, cvfold) cell of the README's config matrix,
and emits the results table that fills BASELINE.md's TBD cells (mean-IoU
per protocol + train/eval episodes/sec) as text and JSON.

Usage:
    python scripts/run_protocol.py --data_root /path/to/blocks_bs1.0_s1.0 \
        --dataset s3dis --cvfolds 0 1 --out protocol_results.json

    # quick synthetic smoke (also exercised by tests/test_run_protocol.py)
    python scripts/run_protocol.py --data_root <synthetic blocks> \
        --dataset s3dis --cvfolds 0 --n_iters 20 --pretrain_iters 10 \
        --eval_episodes 1 --tiny

Flags mirror the reference's canonical run: 2-way 5-shot, 2048 pts,
attention, 40k episodes, eval every 2k, 100 episodes/combination.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ensure_blocks(data_root: str, dataset: str, workdir: str) -> str:
    """Return a blocks dir with a data/ subdir, preparing rooms if needed."""
    if os.path.isdir(os.path.join(data_root, "data")):
        return data_root
    out = os.path.join(workdir, "prepared")
    blocks = os.path.join(out, "blocks_bs1_s1")
    if not os.path.isdir(os.path.join(blocks, "data")):
        print(f"[protocol] no data/ under {data_root} — preparing rooms "
              f"into {blocks}", flush=True)
        from prepare_data import main as prepare_main
        blocks = prepare_main(["--mode", "rooms", "--in_dir", data_root,
                               "--out_dir", out, "--dataset", dataset])
    return blocks


def _throughput(log_path: str) -> float:
    try:
        vals = [float(m) for m in re.findall(
            r"throughput: ([0-9.]+) episodes/s", open(log_path).read())]
        return vals[-1] if vals else float("nan")
    except OSError:
        return float("nan")


def run_cell(dataset: str, cvfold: int, blocks: str, workdir: str,
             *, n_iters: int, pretrain_iters: int, eval_episodes: int,
             eval_interval: int, tiny: bool, seed: int = 123) -> dict:
    """One (dataset, cvfold) cell: pretrain -> metatrain -> 3 evals."""
    from eval_noise import evaluate
    from mpti_train_noise import train
    from pretrain import pretrain
    from r3dfsseg_tpu.config import R3DConfig, tiny_config

    base = tiny_config if tiny else R3DConfig
    tag = f"{dataset}_cv{cvfold}"
    cell_dir = os.path.join(workdir, tag)

    common = dict(dataset=dataset, cvfold=cvfold, clean_data_path=blocks,
                  seed=seed, save_path=cell_dir,
                  n_episode_test=eval_episodes)

    # ---- 1. pretrain the encoder on the clean meta-train split
    #         (reference step 1, README.md:43-44) ----
    pre_cfg = base(**common).replace(
        phase="pretrain", n_iters=pretrain_iters,
        log_dir=os.path.join(cell_dir, "pretrain"))
    print(f"[protocol] {tag}: pretrain {pretrain_iters} iters", flush=True)
    t0 = time.perf_counter()
    pretrain(pre_cfg)
    pre_ckpt = os.path.join(pre_cfg.log_dir, "pretrain_checkpoint.msgpack")
    assert os.path.exists(pre_ckpt), pre_ckpt

    # ---- 2. noisy meta-train (README.md:46-53 flag set) ----
    tr_cfg = base(**common).replace(
        phase="mptitrain", n_iters=n_iters, eval_interval=eval_interval,
        pc_augm=True, pc_augm_scale=1.25, pc_augm_mirror_prob=0.5,
        train_noise_ratio=(0.0, 0.2, 0.4),
        pretrain_checkpoint_path=pre_ckpt,
        log_dir=os.path.join(cell_dir, "metatrain"))
    print(f"[protocol] {tag}: meta-train {n_iters} episodes", flush=True)
    train(tr_cfg)
    ckpt_dir = tr_cfg.log_dir
    assert os.path.exists(os.path.join(ckpt_dir, "checkpoint.msgpack"))
    train_eps_s = _throughput(os.path.join(ckpt_dir, "log_mptitrain.txt"))

    # ---- 3. the three reference eval protocols (README.md:56-64) ----
    results = {}
    for proto, (ratio, ntype) in {
        "clean": (0.0, "sym"),
        "sym_0.4": (0.4, "sym"),
        "ood_0.4": (0.4, "ood"),
    }.items():
        ev_cfg = base(**common).replace(
            phase="mptinoise_eval", noise_ratio=ratio, noise_type=ntype,
            model_checkpoint_path=ckpt_dir,
            log_dir=os.path.join(cell_dir, f"eval_{proto}"))
        print(f"[protocol] {tag}: eval {proto}", flush=True)
        miou = evaluate(ev_cfg)
        results[proto] = {
            "mean_iou": float(miou),
            "eval_eps_per_sec": _throughput(os.path.join(
                ev_cfg.log_dir, "log_mptinoise_eval.txt")),
        }

    return {"dataset": dataset, "cvfold": cvfold,
            "train_eps_per_sec": train_eps_s,
            "wall_seconds": time.perf_counter() - t0,
            "protocols": results}


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True,
                   help="prepared blocks dir (with data/) or a room dump")
    p.add_argument("--dataset", nargs="+", default=["s3dis"],
                   choices=["s3dis", "scannet"])
    p.add_argument("--cvfolds", nargs="+", type=int, default=[0, 1])
    p.add_argument("--workdir", default="./protocol_runs")
    p.add_argument("--out", default="protocol_results.json")
    p.add_argument("--n_iters", type=int, default=40000)
    p.add_argument("--pretrain_iters", type=int, default=20000)
    p.add_argument("--eval_interval", type=int, default=2000)
    p.add_argument("--eval_episodes", type=int, default=100)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--tiny", action="store_true",
                   help="tiny network (synthetic smoke runs)")
    args = p.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    cells = []
    for ds in args.dataset:
        blocks = _ensure_blocks(args.data_root, ds, args.workdir)
        for cv in args.cvfolds:
            cells.append(run_cell(
                ds, cv, blocks, args.workdir, n_iters=args.n_iters,
                pretrain_iters=args.pretrain_iters,
                eval_episodes=args.eval_episodes,
                eval_interval=args.eval_interval, tiny=args.tiny,
                seed=args.seed))

    report = {"config": vars(args), "cells": cells}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)

    # BASELINE.md-shaped table
    print("\n| dataset | cvfold | clean IoU | sym 0.4 IoU | ood 0.4 IoU |"
          " train eps/s | eval eps/s |")
    print("|---|---|---|---|---|---|---|")
    for c in cells:
        pr = c["protocols"]
        print("| %s | %d | %.4f | %.4f | %.4f | %.1f | %.1f |" % (
            c["dataset"], c["cvfold"], pr["clean"]["mean_iou"],
            pr["sym_0.4"]["mean_iou"], pr["ood_0.4"]["mean_iou"],
            c["train_eps_per_sec"], pr["clean"]["eval_eps_per_sec"]))
    print(f"\nwrote {args.out}")
    return report


if __name__ == "__main__":
    main()
