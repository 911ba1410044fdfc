"""Neural building blocks (flax.linen, channels-last)."""
from r3dfsseg_tpu.nn.dgcnn import (  # noqa: F401
    DGCNN,
    EdgeConv,
    BaseLearner,
    GroupedBatchNorm,
    SelfAttention,
    FeatureExtractor,
    DGCNNSegAttention,
)
from r3dfsseg_tpu.nn.nonlocal_block import NonLocalBlock  # noqa: F401
