"""Component-level timing of the MPTI episode on the current backend.

Times, per component on real shapes (2-way 5-shot 2048 pts, feat 192):
encoder forward, MDNS, contrast prototypes, fg/bg multi-prototypes,
affinity construction, label propagation (cg vs solve), full train step.
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from r3dfsseg_tpu.config import R3DConfig
from r3dfsseg_tpu.models.mpti import MPTINet, mdns_keep_mask, _contrast_prototypes
from r3dfsseg_tpu.ops import local_constrained_affinity, label_propagate, multi_prototypes
from __graft_entry__ import _example_episode

cfg = R3DConfig()
rng = np.random.default_rng(0)
E = 1


def timeit(name, fn, *args, n=5):
    # axon remote backend: block_until_ready is not a true sync — force a
    # scalar host materialisation instead.
    def scalar(*a):
        out = fn(*a)
        return sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                   for x in jax.tree.leaves(out))
    sfn = jax.jit(scalar)
    float(sfn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(sfn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1e3:9.2f} ms", flush=True)
    return dt


ep = _example_episode(cfg, rng)
model = MPTINet(cfg)
variables = model.init(
    {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
    ep, train=False)

# ---- encoder ----
xs = jnp.asarray(rng.normal(size=(12, cfg.pc_npts, cfg.pc_in_dim)), jnp.float32)


@jax.jit
def enc(v, x):
    return model.apply(v, x, train=False,
                       method=lambda m, xx, train: m.features(xx, train=train))


timeit("encoder fwd (12 clouds)", enc, variables, xs)

d = cfg.feat_dim
sf = jnp.asarray(rng.normal(size=(cfg.n_way, cfg.k_shot, cfg.pc_npts, d)), jnp.float32)
fg = jnp.asarray(rng.integers(0, 2, size=(cfg.n_way, cfg.k_shot, cfg.pc_npts)) > 0)
sx = jnp.asarray(rng.normal(size=(cfg.n_way, cfg.k_shot, cfg.pc_npts, 3)), jnp.float32)

timeit("MDNS (2 scales)", jax.jit(
    lambda a, b, c: mdns_keep_mask(a, b, c, cfg.mdns_scales)), sf, fg, sx)

flat = sf.reshape(cfg.n_way, -1, d)
fgf = fg.reshape(cfg.n_way, -1)
timeit("fg multi-protos (2 ways)", jax.jit(
    jax.vmap(lambda f, m: multi_prototypes(f, m, cfg.n_subprototypes))), flat, fgf)

nodes = jnp.asarray(rng.normal(size=(cfg.num_nodes, d)), jnp.float32)
valid = jnp.ones(cfg.num_nodes, bool)
aff = jax.jit(lambda nf, v: local_constrained_affinity(
    nf, cfg.k_connect, cfg.sigma, valid=v))
timeit("affinity (4396 nodes)", aff, nodes, valid)

a = aff(nodes, valid)
y = jnp.zeros((cfg.num_nodes, cfg.n_classes)).at[:300, 0].set(1.0)
timeit("LP cg-50", jax.jit(lambda aa, yy: label_propagate(
    aa, yy, solver="cg", cg_iters=50)), a, y)
timeit("LP solve (dense)", jax.jit(lambda aa, yy: label_propagate(
    aa, yy, solver="solve")), a, y)

timeit("contrast protos", jax.jit(
    lambda f, m, fl: _contrast_prototypes(f, m.astype(jnp.int32), fl, 4)),
    sf, fg, jnp.ones((cfg.n_way, cfg.k_shot), jnp.float32))

# full train step
from r3dfsseg_tpu.learners import MPTILearner
learner = MPTILearner(cfg)
learner.init(ep)
m = learner.train(ep)
float(m["loss"])
t0 = time.perf_counter()
for _ in range(5):
    m = learner.train(ep)
float(m["loss"])
print(f"{'full train step (E=1)':28s} {(time.perf_counter()-t0)/5*1e3:9.2f} ms", flush=True)
