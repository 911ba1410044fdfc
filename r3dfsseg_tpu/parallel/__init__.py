"""Multi-chip scaling: episode-data-parallel over a jax.sharding.Mesh,
plus sequence-parallel (node-sharded) label propagation for graphs larger
than one chip."""
from r3dfsseg_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    resolve_episode_batch,
    shard_episode,
    replicate,
)
from r3dfsseg_tpu.parallel.sp import (  # noqa: F401
    sp_blocked_label_propagate,
    sp_label_propagate,
)
