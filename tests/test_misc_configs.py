"""Coverage for non-default configurations: 3-way episodes, ScanNet
catalog, no-attention (linear mapper) path, euclidean similarity."""
import numpy as np
import jax
import pytest

from r3dfsseg_tpu.config import tiny_config
from r3dfsseg_tpu.models.mpti import MPTINet
from r3dfsseg_tpu.models.protonet import ProtoNet
from tests.test_models_smoke import _episode


@pytest.mark.slow
def test_three_way_episode(rng):
    cfg = tiny_config(n_way=3, k_shot=2)
    model = MPTINet(cfg)
    ep = _episode(cfg, rng)
    assert ep.support_x.shape[0] == 3
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, ep, train=False)
    out = model.apply(v, ep, train=False)
    assert out.query_logits.shape == (1, 3, cfg.pc_npts, 4)
    assert np.isfinite(float(out.lp_loss))


def test_no_attention_linear_mapper(rng):
    cfg = tiny_config(use_attention=False)
    model = MPTINet(cfg)
    ep = _episode(cfg, rng)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, ep, train=False)
    assert "linear_mapper" in v["params"]["features"]
    assert "att_learner" not in v["params"]["features"]
    out = model.apply(v, ep, train=False)
    assert np.isfinite(float(out.lp_loss))


def test_protonet_euclidean(rng):
    cfg = tiny_config(dist_method="euclidean")
    model = ProtoNet(cfg)
    ep = _episode(cfg, rng)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, ep, train=False)
    out = model.apply(v, ep, train=False)
    assert np.isfinite(float(out.loss))
    assert (np.asarray(out.query_logits) <= 0).all()  # -dist^2


def test_protonet_unknown_dist_raises(rng):
    cfg = tiny_config(dist_method="gaussian")   # protonet supports cosine|euclidean
    model = ProtoNet(cfg)
    ep = _episode(cfg, rng)
    with pytest.raises(NotImplementedError, match="gaussian"):
        model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, ep, train=False)


def test_scannet_catalog(tmp_path):
    """ScanNet folds: class 0 (unannotated) never trains; fold classes split
    the remaining 20 (scannet.py:23-34)."""
    import os
    from r3dfsseg_tpu.data.catalogs import SCANNET_CLASSNAMES, get_catalog
    root = str(tmp_path / "blocks")
    os.makedirs(os.path.join(root, "data"))
    meta = os.path.join(str(tmp_path), "meta")
    os.makedirs(meta, exist_ok=True)
    with open(os.path.join(meta, "scannet_classnames.txt"), "w") as f:
        f.write("\n".join(SCANNET_CLASSNAMES))
    gen = np.random.default_rng(0)
    for s in range(8):
        cls = [(s + j) % 20 + 1 for j in range(5)]
        rows = []
        for c in cls:
            xyz = gen.uniform(0, 3, size=(300, 3))
            rgb = gen.uniform(0, 255, size=(300, 3))
            rows.append(np.concatenate(
                [xyz, rgb, np.full((300, 1), c), np.full((300, 1), c)], axis=1))
        np.save(os.path.join(root, "data", f"scene{s:02d}.npy"),
                np.concatenate(rows))
    cat0 = get_catalog("scannet", 0, root)
    cat1 = get_catalog("scannet", 1, root)
    assert len(cat0.test_classes) == 10 and len(cat0.train_classes) == 10
    assert 0 not in cat0.train_classes and 0 not in cat0.test_classes
    assert set(cat0.test_classes) == set(cat1.train_classes)
