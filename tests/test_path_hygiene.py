"""Regression guard for the reference-path leak (VERDICT r3, weak #6).

The repo's entry modules share names with the reference's files
(`eval_noise.py`, `mpti_train_noise.py`).  If any test module leaves
`/root/reference` on `sys.path`, a later lazy `import eval_noise` resolves
to the REFERENCE's file (which imports `dataloaders.loader` and crashes on
missing `transforms3d`).  This test imports EVERY test module — executing
each one's module-scope path manipulation — and then asserts both that
nothing leaked onto `sys.path` and that the entry modules still resolve
into /root/repo.
"""
import importlib
import os
import pathlib
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_no_reference_path_leak_after_importing_every_test_module():
    here = pathlib.Path(__file__).parent
    for f in sorted(here.glob("test_*.py")):
        if f.name == pathlib.Path(__file__).name:
            continue
        # pytest (rootdir layout, no tests/__init__.py) imports test files
        # as top-level modules with the tests dir on sys.path — mirror that
        sys.path.insert(0, str(here))
        try:
            importlib.import_module(f.stem)
        finally:
            sys.path.remove(str(here))

    leaked = [p for p in sys.path if "reference" in p]
    assert not leaked, f"test modules leaked reference paths: {leaked}"

    for name in ("eval_noise", "mpti_train_noise", "pretrain"):
        mod = sys.modules.pop(name, None)
        try:
            fresh = importlib.import_module(name)
            assert os.path.abspath(fresh.__file__).startswith(REPO), (
                f"{name} resolves outside the repo: {fresh.__file__}")
        finally:
            if mod is not None:
                sys.modules[name] = mod
