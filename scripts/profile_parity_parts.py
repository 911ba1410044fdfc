#!/usr/bin/env python
"""Per-flag parity-step profiler (round-5 evidence tool).

Measures the parity-mode train step with ONE flag flipped at a time to
attribute its wall-clock without a trace: the round-5 run located the
cost in the two lax.top_k sorts (affinity k=200: ~68 ms; encoder kNN
k=20: ~53 ms), not the LP solve — see DESIGN.md "Round 5: parity mode
5.1 -> 12.0 eps/s".  Run on the real chip.

Usage: python scripts/profile_parity_parts.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench
    from r3dfsseg_tpu.config import R3DConfig

    base = dict(episode_batch=1, lp_solver="cheby", lp_cg_iters=150,
                lp_adjoint_iters=0, affinity_impl="topk",
                knn_impl="pallas_exact", fps_impl="xla",
                compute_dtype="float32")
    variants = {
        "SHIPPED parity (pallas_exact knn + exact-bit topk)": {},
        "knn=xla (lax.top_k sort — the old kNN path)":
            dict(knn_impl="xla"),
        "affinity=threshold (NOT parity: bracketed kth)":
            dict(affinity_impl="threshold"),
        "solver=dense LU": dict(lp_solver="solve", lp_cg_iters=50),
        "cheby50+adj30 (optimized solver, parity rest)":
            dict(lp_cg_iters=50, lp_adjoint_iters=30),
        "fps=pallas (NOT parity)": dict(fps_impl="pallas"),
    }
    for name, kw in variants.items():
        cfg = R3DConfig(**{**base, **kw})
        learner = bench._learner(cfg)
        batch = bench._batch(cfg, 1)
        learner.init(batch)

        def chain():
            for _ in range(10):
                m = learner.train(batch)
            float(m["loss"])

        chain()
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            chain()
            rates.append(10 / (time.perf_counter() - t0))
        print(f"{name:48s} {sorted(rates)[1]:6.2f} eps/s", flush=True)


if __name__ == "__main__":
    main()
