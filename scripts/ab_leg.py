#!/usr/bin/env python
"""Run ONE A/B leg (ab_convergence protocol: synthetic task, pretrained
encoder, sigma=0, 2000 iters, val IoU at 1000/2000) with arbitrary config
overrides, reusing an existing ab_convergence workdir's dataset+pretrain.

Usage: python scripts/ab_leg.py <workdir> <tag> key=val [key=val ...]
e.g.:  python scripts/ab_leg.py /tmp/ab_8r6454c3 gf32 \
           compute_dtype=bfloat16 graph_dtype=float32 \
           affinity_impl=threshold lp_solver=cheby lp_cg_iters=50 \
           lp_adjoint_iters=30
"""
import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ab_convergence import run  # noqa: E402  (scripts/ on path)


def main():
    tmp, tag = sys.argv[1], sys.argv[2]
    kw = {}
    for a in sys.argv[3:]:
        k, v = a.split("=", 1)
        try:
            kw[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            kw[k] = v
    ds = os.path.join(tmp, "blocks")
    ckpt = os.path.join(tmp, "pretrain", "pretrain_checkpoint.msgpack")
    ious, losses = run(tag, ds, tmp, 2000, pretrain_checkpoint_path=ckpt,
                       episode_batch=kw.pop("episode_batch", 1),
                       sigma=0.0, **kw)
    k = min(len(losses), 50)
    print("LEG %s val IoU %s | first/last-50 loss %.4f -> %.4f"
          % (tag, ious, float(np.mean(losses[:k])),
             float(np.mean(losses[-k:]))), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    main()
