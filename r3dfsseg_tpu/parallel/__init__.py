"""Multi-chip scaling: episode-data-parallel over a jax.sharding.Mesh."""
from r3dfsseg_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_episode,
    replicate,
)
