"""Neural building blocks (flax.linen, channels-last)."""
from r3dfsseg_tpu.nn.dgcnn import (  # noqa: F401
    DGCNN,
    EdgeConv,
    BaseLearner,
    SelfAttention,
    FeatureExtractor,
    DGCNNSegAttention,
)
