#!/usr/bin/env python
"""Chunked test runner: the full suite in invocations that each stay
under this container's ~10-minute command ceiling (VERDICT r3 #8).

    python scripts/run_tests.py fast    # -m "not slow"        (~4 min)
    python scripts/run_tests.py slow1   # parity/interop + op-level slow
    python scripts/run_tests.py slow2   # CLI/e2e/parallel/serve slow
    python scripts/run_tests.py all --json SUITE.json
                                        # every chunk, one JSON artifact
                                        # (run detached — exceeds 10 min)

fast + slow1 + slow2 = the complete suite.  slow2 is defined as "every
slow test NOT in slow1's module list", so new slow modules are covered
automatically without editing this file.

`all` records per-chunk pass/fail, duration and the pytest tail line to a
JSON file (VERDICT r4 #6: a committed SUITE_rN.json is the per-round
evidence the WHOLE suite ran, not just the fast gate).

Measured on this container (single CPU core, 2026-08-20):
fast 3:47, slow1 ~8:30, slow2 ~5:00.
"""
import json
import os
import re
import subprocess
import sys
import time

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


def chunk_cmd(which, extra=()):
    base = [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider"]
    if which == "fast":
        cmd = base + ["tests/", "-m", "not slow"]
    elif which == "slow1":
        cmd = base + [f"tests/{m}" for m in SLOW1] + ["-m", "slow"]
    elif which == "slow2":
        cmd = base + ["tests/", "-m", "slow"] \
            + [f"--ignore=tests/{m}" for m in SLOW1]
    else:
        sys.exit(f"unknown chunk {which!r} (fast|slow1|slow2|all)")
    return cmd + list(extra)


def run_all(json_path, extra=()):
    chunks = {}
    for which in ("fast", "slow1", "slow2"):
        cmd = chunk_cmd(which, extra)
        print(f"==== {which}: {' '.join(cmd)}", flush=True)
        t0 = time.time()
        proc = subprocess.run(cmd, cwd=HERE, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
        dt = time.time() - t0
        lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
        summary = next((ln for ln in reversed(lines)
                        if re.search(r"\b(passed|failed|error)", ln)),
                       lines[-1] if lines else "")
        chunks[which] = {"rc": proc.returncode, "seconds": round(dt, 1),
                         "summary": summary.strip()}
        print(proc.stdout[-2000:], flush=True)
        # each chunk's JSON lands as soon as it finishes, so a killed run
        # still leaves a partial artifact
        with open(json_path, "w") as f:
            json.dump({"chunks": chunks,
                       "ok": all(c["rc"] == 0 for c in chunks.values()),
                       "complete": len(chunks) == 3}, f, indent=1)
    ok = all(c["rc"] == 0 for c in chunks.values())
    print(f"==== suite {'GREEN' if ok else 'RED'} -> {json_path}", flush=True)
    return 0 if ok else 1


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fast"
    extra = sys.argv[2:]
    if which == "all":
        json_path = "SUITE.json"
        if "--json" in extra:
            i = extra.index("--json")
            json_path = extra[i + 1]
            extra = extra[:i] + extra[i + 2:]
        sys.exit(run_all(os.path.join(HERE, json_path), extra))
    cmd = chunk_cmd(which, extra)
    print(" ".join(cmd), flush=True)
    sys.exit(subprocess.call(cmd, cwd=HERE))


if __name__ == "__main__":
    main()
