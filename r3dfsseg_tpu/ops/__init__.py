"""Core TPU ops: masked kNN, farthest point sampling, segment reductions,
grid pooling and label propagation.

These replace the reference's native dependencies (faiss `IndexFlatL2`,
`torch_cluster.fps`, `torch_scatter`) with device-resident XLA/Pallas code —
no host round-trips.
"""
from r3dfsseg_tpu.ops.knn import (  # noqa: F401
    pairwise_sqdist,
    knn_indices,
    gather_neighbors,
)
from r3dfsseg_tpu.ops.fps import (  # noqa: F401
    masked_fps,
    multi_prototypes,
)
from r3dfsseg_tpu.ops.segment import (  # noqa: F401
    segment_sum,
    segment_mean,
    masked_mean,
)
from r3dfsseg_tpu.ops.lp import (  # noqa: F401
    local_constrained_affinity,
    label_propagate,
)
from r3dfsseg_tpu.ops.grid import grid_seed_pool  # noqa: F401
from r3dfsseg_tpu.ops.ccns import (  # noqa: F401
    aggregate_class_clusters,
    detect_clean_clusters,
)
