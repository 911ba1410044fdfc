"""Episode algorithms: MPTI (multi-prototype transductive inference) with
WayContrast + MDNS noise robustness, and the ProtoNet baselines."""
from r3dfsseg_tpu.models.episode import Episode  # noqa: F401
from r3dfsseg_tpu.models.mpti import MPTINet  # noqa: F401
from r3dfsseg_tpu.models.protonet import ProtoNet  # noqa: F401
