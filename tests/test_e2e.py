"""End-to-end CLI integration: train a few iterations on synthetic data,
checkpoint, then evaluate with noise + MDNS — all through the real entry
points (tiny model, CPU)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    from r3dfsseg_tpu.data.synthetic import make_synthetic_dataset
    root = str(tmp_path_factory.mktemp("e2e") / "blocks")
    return make_synthetic_dataset(root, n_scans=40, pts_per_scan=512, seed=7)


def _tiny_cfg(ds, tmp, **kw):
    from r3dfsseg_tpu.config import R3DConfig
    return R3DConfig(
        dataset="s3dis", cvfold=0, clean_data_path=ds,
        pc_npts=64, dgcnn_k=4,
        edgeconv_widths=((8, 8), (8, 8), (8, 8)), dgcnn_mlp_widths=(16, 16),
        base_widths=(8, 8), output_dim=8, use_attention=True,
        n_subprototypes=8, k_connect=8, lp_cg_iters=20,
        n_way=2, k_shot=2, n_queries=1, n_episode_test=1,
        n_iters=4, eval_interval=2,
        log_dir=str(tmp / "run"), save_path=str(tmp),
        **kw)


def test_train_then_eval_cli(ds, tmp_path):
    from mpti_train_noise import train
    from eval_noise import evaluate

    cfg = _tiny_cfg(ds, tmp_path, train_noise_ratio=(0.0, 0.5))
    train(cfg)
    assert os.path.exists(os.path.join(cfg.log_dir, "checkpoint.msgpack"))
    log = open(os.path.join(cfg.log_dir, "log_mptitrain.txt")).read()
    assert "[VALID]" in log and "Mean IoU" in log

    ecfg = _tiny_cfg(ds, tmp_path, phase="mptinoise_eval",
                     noise_ratio=0.5, noise_type="ood",
                     model_checkpoint_path=cfg.log_dir)
    miou = evaluate(ecfg)
    assert 0.0 <= miou <= 1.0


@pytest.mark.slow
def test_resume_from_checkpoint(ds, tmp_path):
    from mpti_train_noise import train

    cfg = _tiny_cfg(ds, tmp_path, train_noise_ratio=(0.0,))
    train(cfg)
    # resume: model_checkpoint_path set -> load + continue
    cfg2 = cfg.replace(model_checkpoint_path=cfg.log_dir, n_iters=2)
    train(cfg2)
    log = open(os.path.join(cfg.log_dir, "log_mptitrain.txt")).read()
    assert "Resume from checkpoint" in log
