#!/usr/bin/env python
"""Measure the ACTUAL reference model's step time on CPU torch.

Runs `/root/reference/models/mpti.py` `MPTI_SelfAtten` at the flagship
config (2-way 5-shot, 2048 pts, attention, 100 subprototypes,
k_connect=200) through the exact train step the reference backprops
(`mpti_learner.py:50-72`: forward(train=True) -> lp + 0.1*contrast ->
backward -> Adam -> StepLR) and the eval forward (train=False, eval=True,
MDNS on), and writes the measured episodes/sec to REF_BENCH.json.

Native-dep stubs are the exact-semantics ones from
`make_reference_fixture.py`, except faiss: the fixture stub materialises
an (M, M, d) difference tensor — ~15 GB at the flagship's 4396-node
graph — so this script swaps in a gram-form exact search (same results;
|q|^2 + |x|^2 - 2qx^T + argsort).  Real CPU faiss is itself a gram-based
exact search and at least this fast, so the anchor errs toward making the
reference look FASTER, never slower.  No CUDA device exists in this
container; this is a CPU anchor and is labelled as such everywhere it is
reported (bench.py `ref_cpu_eps_per_sec`, BASELINE.md).

Usage: python scripts/bench_reference_cpu.py [n_steps]
"""
import contextlib
import io
import json
import os
import platform
import sys
import time
from types import SimpleNamespace

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_reference_fixture import (  # noqa: E402
    _Logger, install_stubs, make_episode)


class _GramIndexFlatL2:
    """Exact L2 search in gram form (what CPU faiss IndexFlatL2 computes)."""

    def __init__(self, d):
        self.d = d
        self._x = None

    def add(self, x):
        self._x = np.asarray(x, np.float32)

    def search(self, q, k):
        q = np.asarray(q, np.float32)
        d2 = ((q * q).sum(1, keepdims=True) + (self._x * self._x).sum(1)
              - 2.0 * q @ self._x.T)
        idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(d2, idx, 1), idx


FLAGSHIP = dict(
    n_way=2, k_shot=5, pc_in_dim=9, pc_npts=2048, use_attention=True,
    n_subprototypes=100, k_connect=200, sigma=1.0,
    edgeconv_widths=[[64, 64], [64, 64], [64, 64]],
    dgcnn_mlp_widths=[512, 256], base_widths=[128, 64],
    output_dim=64, dgcnn_k=20, shot_seed=1,
    lr=0.001, step_size=5000, gamma=0.5, dist_method="euclidean",
)


def main(n_steps: int = 10) -> None:
    install_stubs()
    sys.modules["faiss"].IndexFlatL2 = _GramIndexFlatL2
    sys.path.insert(0, "/root/reference")
    from models.mpti import MPTI_SelfAtten

    args = SimpleNamespace(**FLAGSHIP)
    model = MPTI_SelfAtten(args)
    # reference optimizer groups + per-iteration StepLR (mpti_learner.py:27-36)
    optimizer = torch.optim.Adam(
        [{"params": model.encoder.parameters(), "lr": 0.0001},
         {"params": model.base_learner.parameters()},
         {"params": model.att_learner.parameters()},
         {"params": model.proj.parameters()}], lr=args.lr)
    scheduler = torch.optim.lr_scheduler.StepLR(
        optimizer, step_size=args.step_size, gamma=args.gamma)

    gen = np.random.default_rng(0)
    fg = [[900 + int(gen.integers(0, 300)) for _ in range(args.k_shot)]
          for _ in range(args.n_way)]
    ep = make_episode(gen, args.n_way, args.k_shot, args.pc_npts,
                      args.pc_in_dim, fg, [[3] * args.k_shot, [7] * args.k_shot],
                      noisy_shots=set())
    t = {k: torch.from_numpy(v) for k, v in ep.items()}
    logger = _Logger()

    def train_step():
        model.train()
        out = model(t["support_x"], t["support_y"],
                    torch.from_numpy(ep["query_x"]),
                    torch.from_numpy(ep["query_y"]),
                    gt_support_y=t["gt_support_y"],
                    gt_query_y=t["gt_query_y"], train=True, logger=logger,
                    support_flag=t["support_flag"])
        loss = out[1] + 0.1 * out[2]
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        scheduler.step()
        return float(loss)

    def eval_step():
        model.eval()
        with torch.no_grad():
            out = model(t["support_x"], t["support_y"],
                        torch.from_numpy(ep["query_x"]),
                        torch.from_numpy(ep["query_y"]),
                        gt_support_y=t["gt_support_y"],
                        sampled_classes=np.array([3, 7]), eval=True)
        return float(out[1])

    sink = io.StringIO()
    with contextlib.redirect_stdout(sink):
        train_step()  # warmup (allocator, first-touch)
        print("warmup done", file=sys.stderr)
        train_times = []
        for i in range(n_steps):
            t0 = time.perf_counter()
            train_step()
            train_times.append(time.perf_counter() - t0)
            print(f"train step {i}: {train_times[-1]:.1f}s", file=sys.stderr)
        eval_times = []
        for i in range(max(2, n_steps // 2)):
            t0 = time.perf_counter()
            eval_step()
            eval_times.append(time.perf_counter() - t0)
            print(f"eval step {i}: {eval_times[-1]:.1f}s", file=sys.stderr)

    med_train = sorted(train_times)[len(train_times) // 2]
    med_eval = sorted(eval_times)[len(eval_times) // 2]
    result = {
        "ref_cpu_train_eps_per_sec": round(1.0 / med_train, 4),
        "ref_cpu_eval_eps_per_sec": round(1.0 / med_eval, 4),
        "train_step_ms_median": round(1e3 * med_train, 1),
        "eval_step_ms_median": round(1e3 * med_eval, 1),
        "n_steps": n_steps,
        "torch_version": torch.__version__,
        "torch_threads": torch.get_num_threads(),
        "cpu": platform.processor() or platform.machine(),
        "note": ("reference MPTI_SelfAtten fwd+bwd+Adam on CPU torch, "
                 "flagship config, exact-semantics stubs (gram faiss); "
                 "episode generation excluded (model step only)"),
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "REF_BENCH.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
