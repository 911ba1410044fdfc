"""Optimizer-state interop (VERDICT r3 missing #1 / next-round #5).

The reference saves `optimizer_state_dict` and restores it on train-mode
resume (`/root/reference/mpti_train_noise.py:138-144`,
`utils/checkpoint_util.py:36-41`).  These tests pin the torch<->optax Adam
conversion both ways:

  * round-trip exactness: real optax moments -> torch state dict -> optax
    reproduces every moment bit-for-bit and the counts;
  * step equivalence: from the SAME converted checkpoint, one optax update
    and one REAL torch.optim.Adam step (built with the reference's exact
    4-group construction, mpti_learner.py:27-32) produce matching params;
  * CLI resume: the train CLI resumes meta-training from a reference
    `checkpoint.tar` and logs the optimizer restoration.
"""
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r3dfsseg_tpu.config import tiny_config  # noqa: E402
from r3dfsseg_tpu.learners import MPTILearner  # noqa: E402
from r3dfsseg_tpu.models.episode import Episode  # noqa: E402
from r3dfsseg_tpu.utils.torch_convert import (  # noqa: E402
    convert_adam_state, convert_mpti_model, export_adam_state,
    reference_adam_param_order, save_reference_checkpoint, _moment_to_torch)


def _episode(cfg, rng):
    w, k, n, c = cfg.n_way, cfg.k_shot, cfg.pc_npts, cfg.pc_in_dim
    sy = np.zeros((w, k, n), np.int32)
    sy[..., : n // 4] = 1
    return Episode(
        support_x=rng.normal(size=(w, k, n, c)).astype(np.float32),
        support_y=sy,
        query_x=rng.normal(size=(cfg.n_queries * w, n, c)).astype(np.float32),
        query_y=rng.integers(0, w + 1, size=(cfg.n_queries * w, n)).astype(np.int32),
        support_flag=np.ones((w, k), np.int32),
    )


def _trained_learner(rng, n_steps=2):
    cfg = tiny_config(lp_cg_iters=10, pc_npts=32, dgcnn_k=4)
    learner = MPTILearner(cfg, rng=jax.random.PRNGKey(0))
    learner.init(_episode(cfg, rng))
    for _ in range(n_steps):
        learner.train(jax.tree.map(jnp.asarray, _episode(cfg, rng)))
    return cfg, learner


def test_adam_state_roundtrip_exact(rng):
    cfg, learner = _trained_learner(rng)
    params = jax.tree.map(np.asarray, learner.state.params)
    opt_state = learner.state.opt_state

    sd = export_adam_state(opt_state, params, cfg,
                           iteration=int(learner.state.step))
    # reference group structure: 4 groups, encoder at encoder_lr
    assert len(sd["param_groups"]) == 4
    assert sd["param_groups"][0]["lr"] == cfg.encoder_lr
    assert all(g["lr"] == cfg.lr for g in sd["param_groups"][1:])
    order, groups = reference_adam_param_order(params)
    assert sorted(i for g in sd["param_groups"] for i in g["params"]) \
        == list(range(len(order)))

    back, step = convert_adam_state(sd, params, cfg, tx=learner.tx)
    assert step == int(learner.state.step)
    got = jax.tree.map(np.asarray, jax.tree.leaves(back))
    want = jax.tree.map(np.asarray, jax.tree.leaves(opt_state))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_torch_and_optax_step_match_from_converted_state(rng):
    """One optax step and one REAL torch.optim.Adam step from the same
    converted checkpoint, driven by IDENTICAL gradients, update the params
    identically (the cross-implementation gradient agreement itself is
    pinned separately by the parity-grads tests)."""
    cfg, learner = _trained_learner(rng)
    params = jax.tree.map(np.asarray, learner.state.params)
    stats = jax.tree.map(np.asarray, learner.state.batch_stats)
    it = int(learner.state.step)

    # ---- export: torch side gets model + optimizer exactly as the
    # reference builds them (mpti_learner.py:27-32) ----
    order, groups = reference_adam_param_order(params)
    sd_opt = export_adam_state(learner.state.opt_state, params, cfg, it)
    # torch.save/load (the product path) produces tensors; tensorise here
    # since we hand the dict straight to load_state_dict
    sd_opt["state"] = {
        i: {"step": torch.tensor(float(s["step"])),
            "exp_avg": torch.from_numpy(s["exp_avg"].copy()),
            "exp_avg_sq": torch.from_numpy(s["exp_avg_sq"].copy())}
        for i, s in sd_opt["state"].items()}
    from flax import traverse_util
    flatp = traverse_util.flatten_dict(params)
    tparams = [torch.nn.Parameter(torch.from_numpy(
        _moment_to_torch(flatp[path], nd).copy()))
        for path, nd in order]
    topt = torch.optim.Adam(
        [{"params": [tparams[i] for i in groups[0]], "lr": cfg.encoder_lr},
         {"params": [tparams[i] for i in groups[1]]},
         {"params": [tparams[i] for i in groups[2]]},
         {"params": [tparams[i] for i in groups[3]]}], lr=cfg.lr)
    topt.load_state_dict(sd_opt)

    # ---- identical gradients on both sides ----
    gen = np.random.default_rng(3)
    gflat = {p: gen.normal(size=np.shape(v)).astype(np.float32) * 0.1
             for p, v in flatp.items()}
    grads = traverse_util.unflatten_dict(gflat)
    for (path, nd), tp in zip(order, tparams):
        tp.grad = torch.from_numpy(_moment_to_torch(gflat[path], nd).copy())

    updates, _ = learner.tx.update(
        jax.tree.map(jnp.asarray, grads), learner.state.opt_state, params)
    new_params = jax.tree.map(lambda p, u: np.asarray(p + u), params, updates)
    topt.step()

    flat_new = traverse_util.flatten_dict(new_params)
    for (path, nd), tp in zip(order, tparams):
        ours = _moment_to_torch(flat_new[path], nd)
        np.testing.assert_allclose(
            tp.detach().numpy(), ours, rtol=1e-5, atol=1e-7,
            err_msg=str(path))

    del stats  # (exported alongside in the CLI path; unused here)


@pytest.mark.slow
def test_cli_resumes_from_reference_tar(tmp_path, rng):
    """Train-CLI resume from a reference checkpoint.tar: params AND Adam
    moments restored (previously only checkpoint.msgpack could resume)."""
    from mpti_train_noise import train
    from r3dfsseg_tpu.data.synthetic import make_synthetic_dataset

    cfg, learner = _trained_learner(rng)
    params = jax.tree.map(np.asarray, learner.state.params)
    stats = jax.tree.map(np.asarray, learner.state.batch_stats)
    ckdir = tmp_path / "ref_ckpt"
    ckdir.mkdir()
    save_reference_checkpoint(
        str(ckdir / "checkpoint.tar"), params, stats,
        iteration=int(learner.state.step), iou=0.25,
        opt_state=learner.state.opt_state, cfg=cfg)

    ds = make_synthetic_dataset(str(tmp_path / "blocks"), n_scans=40,
                                pts_per_scan=512, seed=7)
    run_cfg = cfg.replace(
        dataset="s3dis", cvfold=0, clean_data_path=ds,
        model_checkpoint_path=str(ckdir), n_iters=2, eval_interval=2,
        n_episode_test=1, n_workers=2, episode_batch=1,
        log_dir=str(tmp_path / "resume_run"), save_path=str(tmp_path))
    train(run_cfg)
    log = open(tmp_path / "resume_run" / "log_mptitrain.txt").read()
    assert "optimizer state restored" in log
    assert "Resume from checkpoint at Iteration 2" in log

    # the converted moments actually landed in the learner state: reload
    # the tar directly and compare against a fresh conversion
    l2 = MPTILearner(cfg, rng=jax.random.PRNGKey(1))
    l2.init(_episode(cfg, rng))
    from r3dfsseg_tpu.utils.torch_convert import (
        resume_from_reference_checkpoint)
    info = resume_from_reference_checkpoint(
        str(ckdir / "checkpoint.tar"), l2)
    assert info["iteration"] == int(learner.state.step)
    for a, b in zip(jax.tree.leaves(l2.state.opt_state),
                    jax.tree.leaves(learner.state.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_checkpoint_iteration_in_episode_units(tmp_path, rng):
    """Checkpoints store `iteration` in EPISODE terms (reference units)
    while TrainState.step counts optimizer steps: at episode_batch=8 a
    250-step state saves iteration=2000 and resume restores step=250."""
    import jax.numpy as jnp

    from r3dfsseg_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg, learner = _trained_learner(rng)           # 2 steps at E=1
    learner.state = learner.state._replace(step=jnp.asarray(250, jnp.int32))
    path = str(tmp_path / "checkpoint.msgpack")
    save_checkpoint(path, learner.state, iou=0.5, iteration=250 * 8)
    blob, restored = load_checkpoint(path, learner.state, episode_batch=8)
    assert blob["iteration"] == 2000
    assert int(restored.step) == 250
    # E=1 default: identical units both ways
    save_checkpoint(path, learner.state, iou=0.5)
    blob, restored = load_checkpoint(path, learner.state)
    assert blob["iteration"] == 250 and int(restored.step) == 250
