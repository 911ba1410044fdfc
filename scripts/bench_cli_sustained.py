#!/usr/bin/env python
"""Bound the CLI-loop gap with measurements (VERDICT r2 item 3).

Reports, on the current backend (real TPU under axon):
  1. device step rate — chained dispatch, one sync per 30 steps
     (the same methodology as bench.py);
  2. H2D transfer cost per episode batch — f32/int32 wire vs the int8 and
     f16 narrow-wire formats, plus the null round-trip (a 4-byte fetch),
     so the per-step budget is itemised;
  3. sustained CLI rate — the REAL `mpti_train_noise.train` loop on a
     synthetic dataset for N steps (no validation inside the window).

Usage: python scripts/bench_cli_sustained.py [n_cli_steps=2000]
"""
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_device_rate(cfg):
    import jax

    from __graft_entry__ import _example_episode
    from r3dfsseg_tpu.learners import MPTILearner

    learner = MPTILearner(cfg)
    ep = _example_episode(cfg, np.random.default_rng(0))
    learner.init(ep)
    batch = jax.tree.map(jax.numpy.asarray, ep)

    def chain(k=30):
        for _ in range(k):
            m = learner.train(batch)
        float(m["loss"])

    chain()
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        chain()
        rates.append(30 / (time.perf_counter() - t0))
    return sorted(rates)[1]


def measure_transfer(cfg):
    """Per-batch H2D cost by wire format + the null RTT."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_episode
    from r3dfsseg_tpu.models.episode import compress_episode_wire

    ep = _example_episode(cfg, np.random.default_rng(0))
    out = {}

    # null round-trip: dispatch + fetch of one scalar
    x = jax.device_put(jnp.float32(0))
    float(x + 1)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        float(jax.device_put(jnp.float32(1)) + 1)
    out["null_rtt_ms"] = 1e3 * (time.perf_counter() - t0) / reps

    for wire in ("none", "int8", "f16"):
        c = compress_episode_wire(ep, wire)
        nbytes = sum(np.asarray(v).nbytes for v in c if v is not None)
        # consume on device so the transfer is actually awaited
        put = jax.device_put(c)
        float(jnp.sum(put.support_x.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(reps):
            put = jax.device_put(c)
            float(jnp.sum(put.support_x.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / reps
        out[f"wire_{wire}"] = {"bytes": int(nbytes),
                               "ms_per_batch": round(1e3 * dt, 2)}
    return out


def measure_cli(n_steps, wire_format, transfer_batch=1):
    from mpti_train_noise import train
    from r3dfsseg_tpu.config import R3DConfig
    from r3dfsseg_tpu.data.synthetic import make_synthetic_dataset

    tmp = tempfile.mkdtemp(prefix="cli_sustained_")
    try:
        ds = make_synthetic_dataset(f"{tmp}/blocks", n_scans=80,
                                    pts_per_scan=4096, seed=3)
        cfg = R3DConfig(
            dataset="s3dis", cvfold=0, clean_data_path=ds,
            phase="mptitrain", n_iters=n_steps,
            eval_interval=n_steps + 1,     # no validation in the window
            n_episode_test=1, n_workers=6, pc_augm=True,
            train_noise_ratio=(0.0, 0.2, 0.4),
            compute_dtype="bfloat16", bn_mode="fastvar",
            lp_solver="cheby", lp_cg_iters=50, lp_adjoint_iters=30,
            wire_format=wire_format, transfer_batch=transfer_batch,
            log_dir=f"{tmp}/run", save_path=tmp, seed=0)
        t0 = time.perf_counter()
        train(cfg)
        wall = time.perf_counter() - t0
        # parse the logged windowed throughput (excludes compile of step 1)
        lines = open(f"{tmp}/run/log_mptitrain.txt").read().splitlines()
        rates = [float(ln.split("throughput:")[1].split("episodes")[0])
                 for ln in lines if "throughput:" in ln]
        return {"wall_s": round(wall, 1),
                "eps_incl_startup": round(n_steps / wall, 2),
                "windowed_eps": rates[-1] if rates else None,
                "window_series": rates}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    n_cli = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    from r3dfsseg_tpu.config import R3DConfig
    cfg = R3DConfig(compute_dtype="bfloat16", bn_mode="fastvar",
                    lp_solver="cheby", lp_cg_iters=50, lp_adjoint_iters=30)

    result = {"device_eps": round(measure_device_rate(cfg), 2)}
    result["transfer"] = measure_transfer(cfg)
    for wire, tb in (("int8", 8), ("f16", 8), ("int8", 1)):
        print(f"running CLI window ({wire}, T={tb})...", file=sys.stderr)
        result[f"cli_{wire}_T{tb}"] = measure_cli(n_cli, wire, tb)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
