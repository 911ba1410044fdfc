"""Multi-device episode-DP tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from r3dfsseg_tpu.config import tiny_config
from r3dfsseg_tpu.learners import MPTILearner
from r3dfsseg_tpu.models.episode import Episode, stack_episodes
from r3dfsseg_tpu.parallel import make_mesh, replicate, shard_episode


def _episode(cfg, rng):
    w, k, n, c = cfg.n_way, cfg.k_shot, cfg.pc_npts, cfg.pc_in_dim
    sy = np.zeros((w, k, n), np.int32)
    sy[..., : n // 4] = 1
    return Episode(
        support_x=rng.normal(size=(w, k, n, c)).astype(np.float32),
        support_y=sy,
        query_x=rng.normal(size=(cfg.n_queries * w, n, c)).astype(np.float32),
        query_y=rng.integers(0, w + 1, size=(cfg.n_queries * w, n)).astype(np.int32),
        gt_support_y=sy.copy(),
        gt_query_y=np.zeros((cfg.n_queries * w, n), np.int32),
        support_flag=np.ones((w, k), np.int32),
    )


def test_eight_device_mesh_available():
    assert jax.device_count() >= 8


def test_sharded_train_step_runs_and_matches_unsharded(rng):
    n_dev = 4
    cfg = tiny_config(episode_batch=n_dev, lp_cg_iters=10, pc_npts=32,
                      dgcnn_k=4)
    mesh = make_mesh(n_dev)
    eps = [_episode(cfg, rng) for _ in range(n_dev)]
    batch = stack_episodes(eps)

    # sharded learner
    l1 = MPTILearner(cfg, rng=jax.random.PRNGKey(0))
    l1.init(eps[0])
    l1.state = replicate(l1.state, mesh)
    with mesh:
        m1 = l1.train(shard_episode(batch, mesh))

    # unsharded learner, identical init
    l2 = MPTILearner(cfg, rng=jax.random.PRNGKey(0))
    l2.init(eps[0])
    m2 = l2.train(jax.tree.map(jnp.asarray, batch))

    np.testing.assert_allclose(float(m1["lp_loss"]), float(m2["lp_loss"]),
                               rtol=1e-4, atol=1e-5)
    # params after the step agree in bulk.  Adam's first step is +-lr per
    # leaf entry (sign of the gradient): entries whose true gradient is at
    # f32 noise level legitimately flip sign between the two reduction
    # orders, so compare the fraction of agreeing entries, not exact values.
    p1 = np.concatenate([np.ravel(x) for x in jax.tree.leaves(l1.state.params)])
    p2 = np.concatenate([np.ravel(x) for x in jax.tree.leaves(l2.state.params)])
    agree = np.isclose(p1, p2, rtol=2e-3, atol=2e-4).mean()
    assert agree > 0.98, agree


def test_graft_entry_dryrun():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)
