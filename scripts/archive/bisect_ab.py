#!/usr/bin/env python
"""Config-level bisect of the round-3 A/B failure: which delta between the
round-2-validated optimized leg (E=4, bf16, threshold, CG-30 — escaped the
ln-3 plateau) and the round-3 leg (E=1, bf16, threshold, cheby-50 fwd +
cheby-30 adjoint — did not) kills plateau escape?  All legs run the
ROUND-3 code (centered-bf16 gram, bf16 attention, einsum scatter bwd), so
a failure in leg 1 would indict the code, not the config.

Usage: python scripts/bisect_ab.py [n_iters] [legs...]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from ab_convergence import run  # reuse the leg runner


LEGS = {
    "E4-cg30": dict(episode_batch=4, compute_dtype="bfloat16",
                    affinity_impl="threshold", lp_solver="cg",
                    lp_cg_iters=30),
    "E1-cg30": dict(episode_batch=1, compute_dtype="bfloat16",
                    affinity_impl="threshold", lp_solver="cg",
                    lp_cg_iters=30),
    "E1-cheby50-noadj": dict(episode_batch=1, compute_dtype="bfloat16",
                             affinity_impl="threshold", lp_solver="cheby",
                             lp_cg_iters=50),
    "E4-cheby50-adj30": dict(episode_batch=4, compute_dtype="bfloat16",
                             affinity_impl="threshold", lp_solver="cheby",
                             lp_cg_iters=50, lp_adjoint_iters=30),
}


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    names = sys.argv[2:] or list(LEGS)
    from r3dfsseg_tpu.data.synthetic import make_synthetic_dataset
    tmp = tempfile.mkdtemp(prefix="bisect_ab_")
    ds = make_synthetic_dataset(os.path.join(tmp, "blocks"), n_scans=60,
                                pts_per_scan=4096, seed=7)
    for name in names:
        iou, loss = run(name, ds, tmp, n_iters, **LEGS[name])
        k = min(len(loss), 50)
        print("LEG %-18s val IoU %s | loss %.4f -> %.4f" % (
            name, iou, float(np.mean(loss[:k])), float(np.mean(loss[-k:]))),
            flush=True)


if __name__ == "__main__":
    main()
