#!/usr/bin/env python
"""Export a TPU-framework checkpoint as a reference-loadable torch .tar.

Usage:
    python scripts/export_torch_checkpoint.py IN.msgpack OUT.tar [key=val ...]

The output matches the reference checkpoint schema exactly
(`/root/reference/mpti_train_noise.py:138-144`) with the reference's
`MPTI_SelfAtten` key names and tensor layouts, so
`load_model_checkpoint(OUT.tar, ...)` (`checkpoint_util.py:26-44`) — or a
`strict=True` `load_state_dict` — accepts it, INCLUDING the Adam
optimizer state (exp_avg/exp_avg_sq/step + the 4 reference param groups),
so the reference's train-mode resume restores the optimizer.  Pass
R3DConfig overrides (e.g. lr=0.001 step_size=5000) when the training run
used non-default optimizer hyperparameters.  Round-trip pinned by
`tests/test_torch_interop.py`.
"""
import ast
import sys

from flax import serialization

from r3dfsseg_tpu.config import R3DConfig
from r3dfsseg_tpu.utils.torch_convert import save_reference_checkpoint


def main(src: str, dst: str, *overrides: str) -> None:
    kw = {}
    for a in overrides:
        k, v = a.split("=", 1)
        try:
            kw[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            kw[k] = v
    cfg = R3DConfig(**kw)
    with open(src, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    save_reference_checkpoint(
        dst, blob["params"], blob["batch_stats"],
        iteration=int(blob.get("iteration", 0)),
        loss=float(blob.get("loss", 0.0)), iou=float(blob.get("IoU", 0.0)),
        opt_state=blob.get("opt_state"), cfg=cfg)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(*sys.argv[1:])
