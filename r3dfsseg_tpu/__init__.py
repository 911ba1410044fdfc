"""r3dfsseg_tpu — TPU-native few-shot 3D point-cloud semantic segmentation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
R3DFSSeg reference stack ("Towards Robust Few-shot Point Cloud Semantic
Segmentation", BMVC 2023): DGCNN feature backbones, multi-prototype
transductive inference (MPTI) with label propagation, prototypical-network
baselines, WayContrast noise-robust meta-training and multi-scale
degree-based noise suppression (MDNS) at meta-test time, plus the
S3DIS/ScanNet episode pipeline.

Design principles (TPU-first, not a port):
  * every episode algorithm is a pure function of fixed-shape arrays —
    ragged foreground-point sets become validity masks so the whole
    episode compiles to one XLA program;
  * the hot ops (pairwise-distance kNN, farthest point sampling, affinity
    construction, label propagation) are batched linear algebra on the MXU,
    with Pallas kernels where XLA fusion is not enough;
  * scaling is episode-data-parallel over a `jax.sharding.Mesh` rather than
    the reference's single-GPU batch_size=1 loop.
"""

__version__ = "0.2.0"

import os as _os

# Persistent XLA compilation cache: episode programs are large and every
# entry point (train CLI, eval CLI, bench, tests) compiles the same graphs.
# CPU-only: the tunnelled axon TPU backend hangs when the persistent cache
# is enabled (remote-compile does not support executable serialisation).
if (not _os.environ.get("JAX_COMPILATION_CACHE_DIR")
        and _os.environ.get("JAX_PLATFORMS", "").startswith("cpu")):
    _cache = _os.path.expanduser("~/.cache/r3dfsseg_jax")
    _os.makedirs(_cache, exist_ok=True)
    try:
        import jax as _jax
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from r3dfsseg_tpu.config import R3DConfig  # noqa: F401
