"""Composed protocol-level parity (VERDICT r4 #1): the reference's OWN
evaluation loop (`/root/reference/eval_noise.py:23-113` test_few_shot +
evaluate_metric, torch CPU, exact-semantics native stubs) vs this repo's
eval CLI, over the SAME h5-cached episode set with the SAME (converted)
checkpoint — asserting the two mean-IoUs agree.

Per-module parity tests pin every ingredient (features/MDNS/logits/grads,
data contracts, cache interop, checkpoint conversion); this is the one
test that composes them through the real artifact chain:

    pretrain -> meta-train -> msgpack -> torch .tar
      -> reference h5 materialisation -> BOTH eval loops -> mean-IoU.

Scale 'tiny' (128 pts, 15 episodes) keeps it suite-runnable; the
flagship-width 'small' scale number is recorded in BASELINE.md from
`scripts/protocol_parity.py`.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/scripts")
try:
    import protocol_parity  # noqa: E402
finally:
    sys.path.remove("/root/repo/scripts")


@pytest.mark.slow
def test_composed_protocol_mean_iou_matches_reference(tmp_path):
    out = protocol_parity.run(str(tmp_path), scale="tiny")
    # both loops are deterministic given the cached episodes; the residual
    # is cross-framework f32 noise flipping argmax near-ties.  At 15
    # episodes x 2 queries x 128 pts one flipped point moves mean-IoU by
    # ~3e-4; a semantics bug moves it by >1e-2 (measured during bring-up:
    # an episode-pairing bug produced 0.023).
    assert abs(out["delta"]) <= 5e-3, out
    # sanity: the model must be decisive, not the ln(3) graph-collapse
    # state (where mean-IoU agreement would be vacuous tie-lottery
    # agreement).  Collapse pins the CE loss at exactly ln(3) = 1.0986
    # (uniform logits); a decisive model lands away from it in either
    # direction (confidently wrong on noisy episodes pushes it above).
    assert abs(out["ref_loss"] - np.log(3.0)) > 0.01, out
