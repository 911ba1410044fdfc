#!/usr/bin/env python
"""Dump the compiled HLO of the optimized train step and print the bodies
of named fusions (for attributing trace hot spots to source ops).

Usage: python scripts/hlo_dump.py [--ebatch E] [fusion-name-pattern ...]
E > 1 lowers the vmapped batched-episode step (pairs with
`capture_trace.py <dir> E` + `trace_attr.py` for the E>1 attribution).
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    import bench
    from r3dfsseg_tpu.config import R3DConfig

    argv = sys.argv[1:]
    ebatch = 1
    if "--ebatch" in argv:
        i = argv.index("--ebatch")
        ebatch = int(argv[i + 1])
        del argv[i:i + 2]
    cfg = R3DConfig(episode_batch=ebatch, lp_solver="cheby", lp_cg_iters=50,
                    lp_adjoint_iters=30, bn_mode="fastvar",
                    compute_dtype="bfloat16")
    learner = bench._learner(cfg)
    batch = bench._batch(cfg, ebatch)
    learner.init(jax.tree.map(lambda x: x[0], batch) if ebatch > 1 else batch)
    lowered = jax.jit(learner._train_step_impl).lower(
        learner.state, batch, learner._rng)
    txt = lowered.compile().as_text()
    out = f"/tmp/train_step_hlo_e{ebatch}.txt" if ebatch > 1 \
        else "/tmp/train_step_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out} ({len(txt)} bytes)")
    pats = argv or ["convert_reduce_fusion", "bitcast_convert_fusion"]
    for pat in pats:
        # print each fusion computation body matching the name
        for m in re.finditer(
                rf'^%?({re.escape(pat)}[.\d]*)\b[^\n]*\{{', txt, re.M):
            name = m.group(1)
            body = txt[m.start():txt.index("\n}", m.start()) + 2]
            print(f"\n==== {name} ({len(body.splitlines())} lines)")
            print("\n".join(body.splitlines()[:40]))


if __name__ == "__main__":
    main()
