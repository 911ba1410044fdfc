#!/usr/bin/env python
"""Quick optimized-mode train-step bench (same methodology as bench.py,
train only)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    from r3dfsseg_tpu.config import R3DConfig
    import ast
    over = ast.literal_eval(sys.argv[1]) if len(sys.argv) > 1 else {}
    cfg = R3DConfig(episode_batch=bench.EBATCH, lp_solver="cheby",
                    lp_cg_iters=50, compute_dtype="bfloat16", **over)
    eps = bench.measure_train(cfg, bench.EBATCH)
    print(f"train eps/s: {eps:.2f}  ({1000.0/eps:.1f} ms/step)")


if __name__ == "__main__":
    main()
