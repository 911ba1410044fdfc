"""Learners: optimizer wiring + jitted train/eval steps."""
from r3dfsseg_tpu.learners.base import TrainState, make_optimizer  # noqa: F401
from r3dfsseg_tpu.learners.mpti_learner import MPTILearner  # noqa: F401
from r3dfsseg_tpu.learners.proto_learner import ProtoLearner  # noqa: F401
from r3dfsseg_tpu.learners.transformer_learner import TransformerLearner  # noqa: F401
