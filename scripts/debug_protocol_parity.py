#!/usr/bin/env python
"""Drill into a protocol-parity delta: compare the reference eval loop and
the repo eval step EPISODE BY EPISODE on the same h5 cache + checkpoint.

For each cached episode:
  * assert the two loaders produce bit-identical tensors,
  * run reference MPTI_SelfAtten (torch CPU) and repo MPTINet (jax CPU),
  * report per-episode prediction-mismatch fraction + logit gap.
"""
from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import protocol_parity as pp  # noqa: E402

pp.force_cpu()


def main(workdir="/tmp/protpar", scale="small", n_show=30):
    import torch

    sc = pp.SCALES[scale]
    ds = os.path.join(workdir, "blocks")
    tar_dir = os.path.join(workdir, "ref_ckpt")
    ref_eval = pp._import_reference()  # installs stubs, imports ref modules
    from torch.utils.data import DataLoader

    from dataloaders.loader import (MyTestDataset_NoiseInMetaTest,
                                    batch_test_task_collate_test)
    from models.mpti_learner import MPTILearner_V3

    np.random.seed(pp.CACHE_SEED)
    dataset, _ = pp._quiet(
        MyTestDataset_NoiseInMetaTest, ds, "s3dis", cvfold=0,
        num_episode_per_comb=sc["n_per_comb"], n_way=2, k_shot=5,
        n_queries=1, num_point=sc["pc_npts"], pc_attribs="xyzrgbXYZ",
        mode="test", ReturnCluster=False, noise_ratio=pp.NOISE_RATIO,
        noise_type=pp.NOISE_TYPE)
    loader = DataLoader(dataset, batch_size=1, shuffle=False,
                        collate_fn=batch_test_task_collate_test)
    learner, _ = pp._quiet(MPTILearner_V3, pp._ref_args(tar_dir, sc),
                           "test")

    # repo side
    from r3dfsseg_tpu.data import StaticTestDataset
    from r3dfsseg_tpu.learners import MPTILearner
    from r3dfsseg_tpu.utils.torch_convert import (convert_for_phase,
                                                  load_torch_checkpoint)
    cfg = pp._repo_cfg(ds, os.path.join(workdir, "dbg"), sc,
                       phase="mptinoise_eval",
                       n_episode_test=sc["n_per_comb"],
                       noise_ratio=pp.NOISE_RATIO, noise_type=pp.NOISE_TYPE,
                       model_checkpoint_path=tar_dir, seed=pp.CACHE_SEED)
    ours_ds, _ = pp._quiet(
        StaticTestDataset, ds, "s3dis", cvfold=0,
        num_episode_per_comb=sc["n_per_comb"], n_way=2, k_shot=5,
        n_queries=1, num_point=sc["pc_npts"], pc_attribs="xyzrgbXYZ",
        mode="test", noise_ratio=pp.NOISE_RATIO,
        noise_type=pp.NOISE_TYPE, seed=pp.CACHE_SEED)
    jl = MPTILearner(cfg)
    jl.init(ours_ds[0])
    sd = load_torch_checkpoint(os.path.join(tar_dir, "checkpoint.tar"))
    params, stats = convert_for_phase(sd, cfg)
    jl.load_params(params, stats)

    print(f"{len(dataset)} ref episodes, {len(ours_ds)} repo episodes")

    # The reference orders cached episodes by glob() (loader.py:1634),
    # the repo by its own enumeration — mean-IoU is permutation-invariant,
    # so match episodes by CONTENT and compare the models on matched pairs.
    def key_of(sx):
        return sx.astype(np.float32).tobytes()

    ours_by_key = {}
    for j in range(len(ours_ds)):
        ep = ours_ds[j]
        ours_by_key[key_of(
            np.asarray(ep.support_x).transpose(0, 1, 3, 2))] = j

    rows = []
    unmatched = 0
    for i, (data, sampled_classes) in enumerate(loader):
        if i >= n_show:
            break
        j = ours_by_key.get(key_of(data[0].numpy()))
        if j is None:
            unmatched += 1
            print(f"ep {i:2d} NO content match in repo dataset", flush=True)
            continue
        ep = ours_ds[j]
        qx_ref = data[2].numpy()
        qx_ours = np.asarray(ep.query_x).transpose(0, 2, 1)
        eq = (np.array_equal(qx_ref, qx_ours)
              and np.array_equal(data[1].numpy(),
                                 np.asarray(ep.support_y))
              and np.array_equal(data[3].numpy(), np.asarray(ep.query_y))
              and np.array_equal(data[6].numpy(),
                                 np.asarray(ep.gt_support_y)))
        cls_eq = list(np.asarray(sampled_classes).ravel()) == \
            [int(c) for c in np.asarray(ep.sampled_classes)]

        with torch.no_grad(), pp.contextlib.redirect_stdout(pp.io.StringIO()):
            pred_ref, loss_ref, _ = learner.test(data, sampled_classes, i,
                                                 eval=True)
        pred_ref = pred_ref.numpy()                  # (q, P)
        pred_ours, loss_ours, _ = jl.test(ep, eval_mdns=True)
        pred_ours = np.asarray(pred_ours)
        if pred_ours.ndim == 3:
            pred_ours = pred_ours[0]
        mism = float((pred_ref != pred_ours).mean())
        rows.append((i, j, eq, cls_eq, mism, float(loss_ref),
                     float(loss_ours)))
        print(f"ep ref{i:2d}=repo{j:2d} rest_eq={eq} classes_eq={cls_eq} "
              f"pred_mismatch={mism:.4f} loss ref={float(loss_ref):.4f} "
              f"ours={float(loss_ours):.4f}", flush=True)

    bad = [r for r in rows if r[4] > 0.01]
    print(f"\n{unmatched} unmatched; "
          f"{len(bad)}/{len(rows)} matched episodes with >1% pred mismatch")


if __name__ == "__main__":
    main(*sys.argv[1:2])
