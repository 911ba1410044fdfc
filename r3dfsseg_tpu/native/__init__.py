"""Native (C) host-path kernels, built on first use and loaded via ctypes.

The reference hides its host episode-assembly cost inside torch's C++
DataLoader workers; this package is the TPU build's equivalent native data
path.  Everything degrades gracefully: if no C compiler is available (or
the build fails) `assemble_scan` is None and callers fall back to the
numpy implementation — the two paths consume identical RNG streams and
produce identical episodes (tests/test_native_ops.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "episode_ops.c")

assemble_scan = None  # ctypes symbol, or None when unavailable
_lib = None


def _build() -> str:
    """Compile episode_ops.c -> a cached shared object; returns its path."""
    build_dir = os.path.join(_HERE, "_build")
    os.makedirs(build_dir, exist_ok=True)
    so = os.path.join(build_dir, "libepisode_ops.so")
    if (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(_SRC)):
        return so
    cc = os.environ.get("CC", "cc")
    # build to a temp name then atomically rename: concurrent test workers
    # may race the build
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=build_dir)
    os.close(fd)
    subprocess.run(
        [cc, "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
        check=True, capture_output=True)
    os.replace(tmp, so)
    return so


def _load():
    global assemble_scan, _lib
    if os.environ.get("R3D_DISABLE_NATIVE"):
        return
    try:
        _lib = ctypes.CDLL(_build())
    except Exception:
        return
    fn = _lib.assemble_scan
    fn.restype = ctypes.c_long
    fn.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long,   # data, n_rows, n_cols
        ctypes.c_void_p, ctypes.c_long,                  # idx, num_point
        ctypes.c_void_p,                                 # aug_m | NULL
        ctypes.c_void_p,                                 # jitter | NULL
        ctypes.c_int, ctypes.c_int, ctypes.c_int,        # use_xyz/rgb/XYZ
        ctypes.c_long, ctypes.c_void_p, ctypes.c_long,   # class, classes, n
        ctypes.c_int,                                    # support
        ctypes.c_long,                                   # cluster_col
        ctypes.c_void_p, ctypes.c_void_p,                # out_pt, out_label
        ctypes.c_void_p, ctypes.c_void_p,                # out_gt, out_cluster
    ]
    assemble_scan = fn


_load()
