#!/usr/bin/env python
"""Chunked test runner: the full suite in invocations that each stay
under this container's ~10-minute command ceiling (VERDICT r3 #8).

    python scripts/run_tests.py fast    # -m "not slow"        (~4 min)
    python scripts/run_tests.py slow1   # parity/interop + op-level slow
    python scripts/run_tests.py slow2   # CLI/e2e/parallel/serve slow

fast + slow1 + slow2 = the complete suite.  slow2 is defined as "every
slow test NOT in slow1's module list", so new slow modules are covered
automatically without editing this file.

Measured on this container (single CPU core, 2026-08-20):
fast 3:47, slow1 ~8:30, slow2 ~5:00.
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# slow1: the compile-heavy parity/interop modules + op-level slow tests
SLOW1 = [
    "test_reference_parity.py", "test_reference_parity_cfg2.py",
    "test_reference_parity_extra.py", "test_reference_parity_grads.py",
    "test_torch_interop.py", "test_backbone.py", "test_transformer.py",
    "test_lowp_graph.py", "test_misc_configs.py",
    "test_models_smoke.py", "test_mpti.py", "test_ops.py",
    "test_opt_interop.py", "test_run_protocol.py",
]


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fast"
    extra = sys.argv[2:]
    base = [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider"]
    if which == "fast":
        cmd = base + ["tests/", "-m", "not slow"]
    elif which == "slow1":
        cmd = base + [f"tests/{m}" for m in SLOW1] + ["-m", "slow"]
    elif which == "slow2":
        cmd = base + ["tests/", "-m", "slow"] \
            + [f"--ignore=tests/{m}" for m in SLOW1]
    else:
        sys.exit(f"unknown chunk {which!r} (fast|slow1|slow2)")
    print(" ".join(cmd), flush=True)
    sys.exit(subprocess.call(cmd + extra, cwd=HERE))


if __name__ == "__main__":
    main()
