#!/usr/bin/env python
"""Whole-scene serving benchmark: FewShotPredictor.predict_scene
points/sec on the current backend at the flagship config.

The graph is the cost driver: M = 300 + P nodes.  Up to 18k nodes the
dense threshold-affinity + Chebyshev path materialises M^2 buffers; above
that `ops/lp_blocked.py` builds the graph tile by tile — stored as ONE
half-width matrix when it fits 9.2 GB, else rematerialised per matvec —
lifting the single-chip cap from ~16-24k to 64k+ points.  The
node-sharded path (mesh) remains the scale-out option.

Usage: python scripts/bench_scene.py [P ...]
       (default 8192 16384 32768 65536; the two large sizes take the
        blocked path automatically)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [8192, 16384, 32768, 65536]
    from r3dfsseg_tpu.config import R3DConfig
    from r3dfsseg_tpu.learners import MPTILearner
    from r3dfsseg_tpu.serve import FewShotPredictor
    from __graft_entry__ import _example_episode

    rng = np.random.default_rng(0)
    for tag, cfg in (
        ("f32 ", R3DConfig()),
        ("bf16", R3DConfig(compute_dtype="bfloat16")),
    ):
        ep = _example_episode(cfg, rng)
        learner = MPTILearner(cfg)
        learner.init(ep)
        pred = FewShotPredictor(cfg, learner)
        sup_x, sup_y = np.asarray(ep.support_x), np.asarray(ep.support_y)

        for p in sizes:
            xyz = rng.uniform(0, 6, size=(p, 3)).astype(np.float32)
            rgb = rng.uniform(size=(p, 3)).astype(np.float32)
            pred.predict_scene(sup_x, sup_y, xyz, rgb)      # warmup/compile
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                pred.predict_scene(sup_x, sup_y, xyz, rgb)
                times.append(time.perf_counter() - t0)
            dt = sorted(times)[1]
            print(f"{tag} P={p}: {dt*1e3:.1f} ms/scene  "
                  f"{p/dt/1e3:.1f}k pts/s")


if __name__ == "__main__":
    main()
