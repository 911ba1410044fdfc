"""Serving API: checkpoint round-trip + prediction agreement."""
import numpy as np
import pytest

from r3dfsseg_tpu.config import tiny_config
from r3dfsseg_tpu.models.episode import Episode


def _episode(cfg, rng):
    w, k, n, d = cfg.n_way, cfg.k_shot, cfg.pc_npts, cfg.pc_in_dim
    q = cfg.n_queries * cfg.n_way
    sy = (rng.uniform(size=(w, k, n)) < 0.3).astype(np.int32)
    sy[..., 0] = 1
    return Episode(
        support_x=rng.normal(size=(w, k, n, d)).astype(np.float32),
        support_y=sy,
        query_x=rng.normal(size=(q, n, d)).astype(np.float32),
        query_y=rng.integers(0, w + 1, size=(q, n)).astype(np.int32),
        gt_support_y=sy.copy(),
        gt_query_y=np.zeros((q, n), np.int32),
        support_flag=np.ones((w, k), np.int32))


@pytest.mark.slow
def test_predictor_matches_learner_and_roundtrips(tmp_path, rng):
    from r3dfsseg_tpu.learners import MPTILearner
    from r3dfsseg_tpu.serve import FewShotPredictor
    from r3dfsseg_tpu.utils.checkpoint import save_checkpoint

    cfg = tiny_config(lp_cg_iters=10)
    ep = _episode(cfg, rng)

    learner = MPTILearner(cfg)
    learner.init(ep)
    learner.train(ep)                                    # non-init params
    want, _, _ = learner.test(ep, eval_mdns=True)
    save_checkpoint(str(tmp_path / "checkpoint.msgpack"), learner.state)

    p = FewShotPredictor.from_checkpoint(str(tmp_path), cfg)
    got = p.predict(np.asarray(ep.support_x), np.asarray(ep.support_y),
                    np.asarray(ep.query_x))
    assert got.shape == (cfg.n_way * cfg.n_queries, cfg.pc_npts)
    assert got.dtype == np.int32 and got.min() >= 0 and got.max() <= cfg.n_way
    np.testing.assert_array_equal(got, np.asarray(want)[0])
    # jitted program reused: second call, same result
    np.testing.assert_array_equal(
        got, p(np.asarray(ep.support_x), np.asarray(ep.support_y),
               np.asarray(ep.query_x)))


def test_predictor_loads_reference_tar(tmp_path, rng):
    """.tar branch: reference checkpoints convert on the fly, dispatched
    by phase (transformer phases get the full head)."""
    import dataclasses

    import pytest
    torch = pytest.importorskip("torch")
    from r3dfsseg_tpu.serve import FewShotPredictor
    from tests.test_torch_interop import (_reference_style_state_dict,
                                          _transformer_extra_state)

    cfg = tiny_config(lp_cg_iters=10)
    sd = _reference_style_state_dict(cfg, rng)
    sd.update(_transformer_extra_state(cfg, rng, d_model=16, n_head=2,
                                       n_layers=1, d_feed=32))
    torch.save({"model_state_dict": sd}, str(tmp_path / "checkpoint.tar"))

    p = FewShotPredictor.from_checkpoint(str(tmp_path), cfg)
    got = np.asarray(
        p._learner.state.params["features"]["encoder"]["mlp0"]["conv"]["kernel"])
    want = sd["encoder.conv.layer.0.weight"].numpy().squeeze(-1).T
    np.testing.assert_allclose(got, want, rtol=1e-6)
    ep = _episode(cfg, rng)
    out = p.predict(np.asarray(ep.support_x), np.asarray(ep.support_y),
                    np.asarray(ep.query_x))
    assert out.shape == (cfg.n_way * cfg.n_queries, cfg.pc_npts)

    cfg_t = dataclasses.replace(cfg, phase="transformereval",
                                d_model=16, n_head=2, n_layers=1, d_feed=32)
    pt = FewShotPredictor.from_checkpoint(str(tmp_path / "checkpoint.tar"),
                                          cfg_t)
    assert "transformer" in pt._learner.state.params
    out = pt.predict(np.asarray(ep.support_x), np.asarray(ep.support_y),
                     np.asarray(ep.query_x))
    assert out.shape == (cfg.n_way * cfg.n_queries, cfg.pc_npts)


def test_predictor_shape_guard(rng):
    from r3dfsseg_tpu.serve import FewShotPredictor

    cfg = tiny_config(lp_cg_iters=10)
    p = FewShotPredictor(cfg)
    import pytest
    with pytest.raises(ValueError, match="episode shape mismatch"):
        p.predict(np.zeros((3, 5, cfg.pc_npts, cfg.pc_in_dim)),
                  np.zeros((3, 5, cfg.pc_npts)),
                  np.zeros((2, cfg.pc_npts, cfg.pc_in_dim)))


def test_predict_scene_whole_scene_graph(tmp_path, rng):
    """Whole-scene serving: P points (not a multiple of pc_npts) segment
    in one global graph; the node-sharded (8-device mesh) and unsharded
    paths agree."""
    from r3dfsseg_tpu.learners import MPTILearner
    from r3dfsseg_tpu.learners import MPTILearner
    from r3dfsseg_tpu.parallel import make_mesh
    from r3dfsseg_tpu.serve import FewShotPredictor

    cfg = tiny_config(lp_cg_iters=10)
    ep = _episode(cfg, rng)
    learner = MPTILearner(cfg)
    learner.init(ep)
    p = FewShotPredictor(cfg, learner)

    n_pts = 3 * cfg.pc_npts + 17                   # padding path exercised
    scene_xyz = rng.uniform(0, 4, size=(n_pts, 3)).astype(np.float32)
    scene_rgb = rng.uniform(size=(n_pts, 3)).astype(np.float32)

    lab = p.predict_scene(np.asarray(ep.support_x), np.asarray(ep.support_y),
                          scene_xyz, scene_rgb)
    assert lab.shape == (n_pts,) and lab.dtype == np.int32
    assert lab.min() >= 0 and lab.max() <= cfg.n_way

    lab_sp = p.predict_scene(np.asarray(ep.support_x),
                             np.asarray(ep.support_y),
                             scene_xyz, scene_rgb, mesh=make_mesh(8))
    np.testing.assert_array_equal(lab, lab_sp)


def test_predict_scene_blocked_matches_dense(tmp_path, rng, monkeypatch):
    """The matrix-free scene LP (R3D_SCENE_LP=blocked) predicts the same
    labels as the dense single-chip graph — the 64k-point path is
    semantics-identical, just O(R*M) memory."""
    from r3dfsseg_tpu.learners import MPTILearner
    from r3dfsseg_tpu.serve import FewShotPredictor
    from tests.test_serve import _episode  # self-import safe under pytest

    cfg = tiny_config(lp_cg_iters=20)
    ep = _episode(cfg, rng)
    learner = MPTILearner(cfg)
    learner.init(ep)

    n_pts = 3 * cfg.pc_npts + 5
    scene_xyz = rng.uniform(0, 4, size=(n_pts, 3)).astype(np.float32)
    scene_rgb = rng.uniform(size=(n_pts, 3)).astype(np.float32)
    args = (np.asarray(ep.support_x), np.asarray(ep.support_y),
            scene_xyz, scene_rgb)

    monkeypatch.setenv("R3D_SCENE_LP", "dense")
    lab_dense = FewShotPredictor(cfg, learner).predict_scene(*args)
    monkeypatch.setenv("R3D_SCENE_LP", "blocked")
    lab_blocked = FewShotPredictor(cfg, learner).predict_scene(*args)

    assert (lab_dense == lab_blocked).mean() > 0.99, \
        (lab_dense != lab_blocked).sum()


@pytest.mark.slow
def test_predict_scene_mesh_blocked_matches_dense(rng, monkeypatch):
    """serve's mesh path with the blocked x sharded LP forced
    (R3D_SCENE_LP=blocked; auto engages it past 18k nodes) matches the
    single-device prediction."""
    from r3dfsseg_tpu.learners import MPTILearner
    from r3dfsseg_tpu.parallel import make_mesh
    from r3dfsseg_tpu.serve import FewShotPredictor

    cfg = tiny_config(lp_cg_iters=10)
    ep = _episode(cfg, rng)
    learner = MPTILearner(cfg)
    learner.init(ep)
    p = FewShotPredictor(cfg, learner)

    n_pts = 2 * cfg.pc_npts + 9
    xyz = rng.uniform(0, 4, size=(n_pts, 3)).astype(np.float32)
    rgb = rng.uniform(size=(n_pts, 3)).astype(np.float32)
    args = (np.asarray(ep.support_x), np.asarray(ep.support_y), xyz, rgb)

    lab1 = p.predict_scene(*args)
    monkeypatch.setenv("R3D_SCENE_LP", "blocked")
    lab_sp = p.predict_scene(*args, mesh=make_mesh(8))
    agree = (lab1 == lab_sp).mean()
    assert agree > 0.995, agree
