"""Smoke test for the turnkey protocol runner (VERDICT r3 #6): the full
prepare->pretrain->metatrain->eval{clean, sym, ood} chain runs end-to-end
on the synthetic dataset and emits the BASELINE.md-shaped results JSON."""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


@pytest.mark.slow
def test_protocol_runner_synthetic_chain(tmp_path):
    from r3dfsseg_tpu.data.synthetic import make_synthetic_dataset
    from run_protocol import main

    ds = make_synthetic_dataset(str(tmp_path / "blocks"), n_scans=40,
                                pts_per_scan=512, seed=7)
    out = str(tmp_path / "results.json")
    report = main([
        "--data_root", ds, "--dataset", "s3dis", "--cvfolds", "0",
        "--workdir", str(tmp_path / "runs"), "--out", out,
        "--n_iters", "4", "--pretrain_iters", "4", "--eval_interval", "4",
        "--eval_episodes", "1", "--tiny"])

    assert os.path.exists(out)
    blob = json.load(open(out))
    assert blob["cells"] == report["cells"]
    (cell,) = blob["cells"]
    assert cell["dataset"] == "s3dis" and cell["cvfold"] == 0
    for proto in ("clean", "sym_0.4", "ood_0.4"):
        assert 0.0 <= cell["protocols"][proto]["mean_iou"] <= 1.0
    # every stage left its artifacts
    base = tmp_path / "runs" / "s3dis_cv0"
    assert (base / "pretrain" / "pretrain_checkpoint.msgpack").exists()
    assert (base / "metatrain" / "checkpoint.msgpack").exists()
