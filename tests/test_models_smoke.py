"""End-to-end model smoke tests on tiny configs (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from r3dfsseg_tpu.config import tiny_config
from r3dfsseg_tpu.models.episode import Episode, stack_episodes
from r3dfsseg_tpu.models.mpti import MPTINet
from r3dfsseg_tpu.models.protonet import ProtoNet


def _episode(cfg, rng, seed_shift=0):
    w, k, n, c = cfg.n_way, cfg.k_shot, cfg.pc_npts, cfg.pc_in_dim
    sy = np.zeros((w, k, n), np.int32)
    for wi in range(w):
        for ki in range(k):
            sy[wi, ki, rng.choice(n, n // 4, replace=False)] = 1
    return Episode(
        support_x=rng.normal(size=(w, k, n, c)).astype(np.float32),
        support_y=sy,
        query_x=rng.normal(size=(cfg.n_queries * w, n, c)).astype(np.float32),
        query_y=rng.integers(0, w + 1, size=(cfg.n_queries * w, n)).astype(np.int32),
        gt_support_y=sy.copy(),
        gt_query_y=np.zeros((cfg.n_queries * w, n), np.int32),
        support_flag=np.ones((w, k), np.int32) * 3,
    )


@pytest.fixture(scope="module")
def cfg():
    return tiny_config(lp_cg_iters=20)


@pytest.mark.slow
def test_mpti_train_forward_and_grads(cfg, rng):
    model = MPTINet(cfg)
    ep = _episode(cfg, rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ep, train=False)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            ep, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)})
        return out.lp_loss + 0.1 * out.contrast_loss, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    assert out.query_logits.shape == (
        1, cfg.n_queries * cfg.n_way, cfg.pc_npts, cfg.n_classes)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # every param leaf receives gradient (proj included via contrast loss)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    zero_leaves = [jax.tree_util.keystr(k) for k, g in flat
                   if float(jnp.sum(jnp.abs(g))) == 0.0]
    assert not zero_leaves, f"zero-grad leaves: {zero_leaves}"


@pytest.mark.slow
def test_mpti_eval_with_mdns(cfg, rng):
    model = MPTINet(cfg)
    ep = _episode(cfg, rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ep, train=False)
    out = model.apply(variables, ep, train=False, eval_mdns=True)
    assert np.isfinite(float(out.lp_loss))
    assert np.isfinite(np.asarray(out.query_logits)).all()


@pytest.mark.slow
def test_mpti_episode_batch(cfg, rng):
    model = MPTINet(cfg)
    eps = stack_episodes([_episode(cfg, rng, i) for i in range(2)])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        eps, train=False)
    out = model.apply(variables, eps, train=False)
    assert out.query_logits.shape[0] == 2


def test_protonet_forward(cfg, rng):
    model = ProtoNet(cfg)
    ep = _episode(cfg, rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ep, train=False)
    out = model.apply(variables, ep, train=False)
    assert np.isfinite(float(out.loss))
    assert out.query_logits.shape == (
        1, cfg.n_queries * cfg.n_way, cfg.pc_npts, cfg.n_classes)


def test_protonet_contrast_mdns(cfg, rng):
    model = ProtoNet(cfg, with_contrast=True)
    ep = _episode(cfg, rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ep, train=False)
    out, _ = model.apply(variables, ep, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(float(out.contrast_loss))
    out2 = model.apply(variables, ep, train=False, eval_mdns=True)
    assert np.isfinite(float(out2.loss))
