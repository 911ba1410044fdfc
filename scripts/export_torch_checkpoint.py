#!/usr/bin/env python
"""Export a TPU-framework checkpoint as a reference-loadable torch .tar.

Usage:
    python scripts/export_torch_checkpoint.py IN.msgpack OUT.tar

The output matches the reference checkpoint schema exactly
(`/root/reference/mpti_train_noise.py:138-144`) with the reference's
`MPTI_SelfAtten` key names and tensor layouts, so
`load_model_checkpoint(OUT.tar, ...)` (`checkpoint_util.py:26-44`) — or a
`strict=True` `load_state_dict` — accepts it.  Round-trip pinned by
`tests/test_torch_interop.py::test_flax_to_torch_roundtrip`.
"""
import sys

from flax import serialization

from r3dfsseg_tpu.utils.torch_convert import save_reference_checkpoint


def main(src: str, dst: str) -> None:
    with open(src, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    save_reference_checkpoint(
        dst, blob["params"], blob["batch_stats"],
        iteration=int(blob.get("iteration", 0)),
        loss=float(blob.get("loss", 0.0)), iou=float(blob.get("IoU", 0.0)))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
