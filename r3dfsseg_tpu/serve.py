"""Serving API: load a checkpoint once, jit once, segment query clouds.

The reference has no deployment surface — inference goes through
`MPTILearner_V3.test` (`/root/reference/models/mpti_learner.py:84-102`),
which needs a fully-constructed training learner, CUDA tensors AND
ground-truth query labels (it computes a loss it then ignores for
prediction).  `FewShotPredictor` is the production counterpart:

  * numpy in / numpy out — callers never touch jax,
  * no labels required (dummy labels feed the loss term, which is
    discarded),
  * one jit compile at construction, reused for every call,
  * loads both native msgpack checkpoints and reference ``checkpoint.tar``
    (converted on the fly),
  * MDNS clean-shot suppression on by default — a noisy support set is the
    expected serving condition for this model family.

Example::

    from r3dfsseg_tpu.config import R3DConfig
    from r3dfsseg_tpu.serve import FewShotPredictor

    p = FewShotPredictor.from_checkpoint("<log_dir>", R3DConfig())
    labels = p.predict(support_x, support_y, query_x)   # (Q, N) int32

`support_x` is ``(n_way, k_shot, n_points, 9)`` xyzrgbXYZ, `support_y`
``(n_way, k_shot, n_points)`` binary fg masks, `query_x`
``(Q, n_points, 9)``; returned labels are 0 = background, 1..n_way = way.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from r3dfsseg_tpu.config import R3DConfig
from r3dfsseg_tpu.models.episode import Episode


def _make_learner(cfg: R3DConfig):
    from r3dfsseg_tpu.learners import MPTILearner, ProtoLearner
    if cfg.phase in ("mptinoise_eval", "mptieval", "mptitrain"):
        return MPTILearner(cfg)
    if cfg.phase in ("protoeval", "prototrain"):
        return ProtoLearner(cfg, with_contrast=True)
    if cfg.phase in ("transformereval", "transformertrain"):
        from r3dfsseg_tpu.learners.transformer_learner import TransformerLearner
        return TransformerLearner(cfg)
    raise NotImplementedError(f"phase {cfg.phase!r} not servable")


class FewShotPredictor:
    """Checkpoint -> jitted episode-segmentation function."""

    def __init__(self, cfg: R3DConfig, learner=None, *, eval_mdns: bool = True):
        self.cfg = cfg
        self.eval_mdns = eval_mdns
        self._learner = learner if learner is not None else _make_learner(cfg)
        if self._learner.state is None:
            self._learner.init(self._dummy_episode())

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, path: str, cfg: Optional[R3DConfig] = None,
                        **kw) -> "FewShotPredictor":
        """`path`: a log dir holding ``checkpoint.msgpack`` (native) or
        ``checkpoint.tar`` (reference torch), or a direct file path."""
        cfg = cfg or R3DConfig()
        self = cls(cfg, **kw)
        if os.path.isdir(path):
            for name in ("checkpoint.msgpack", "checkpoint.tar"):
                f = os.path.join(path, name)
                if os.path.exists(f):
                    path = f
                    break
        if path.endswith(".msgpack"):
            from r3dfsseg_tpu.utils.checkpoint import load_checkpoint
            _, state = load_checkpoint(path, self._learner.state)
            self._learner.state = state
        elif path.endswith(".tar"):
            from r3dfsseg_tpu.utils.torch_convert import (convert_for_phase,
                                                          load_torch_checkpoint)
            sd = load_torch_checkpoint(path)
            params, stats = convert_for_phase(sd, cfg)
            self._learner.load_params(params, stats)
        else:
            raise ValueError(f"no checkpoint found at {path!r}")
        return self

    # ------------------------------------------------------------------
    def _dummy_episode(self) -> Episode:
        c = self.cfg
        w, k, n, d = c.n_way, c.k_shot, c.pc_npts, c.pc_in_dim
        q = c.n_queries * c.n_way
        sy = np.zeros((w, k, n), np.int32)
        sy[..., : n // 4] = 1
        return Episode(
            support_x=np.zeros((w, k, n, d), np.float32), support_y=sy,
            query_x=np.zeros((q, n, d), np.float32),
            query_y=np.zeros((q, n), np.int32),
            gt_support_y=sy.copy(), gt_query_y=np.zeros((q, n), np.int32),
            support_flag=np.ones((w, k), np.int32))

    def predict(self, support_x: np.ndarray, support_y: np.ndarray,
                query_x: np.ndarray) -> np.ndarray:
        """Segment `query_x` against the support set.  Returns (Q, N)
        int32 labels (0 = bg, 1..n_way).  Shapes must match the
        constructor config (fixed-shape jit program)."""
        c = self.cfg
        q, n = query_x.shape[0], query_x.shape[1]
        if (support_x.shape[:2] != (c.n_way, c.k_shot)
                or n != c.pc_npts or q != c.n_way * c.n_queries):
            raise ValueError(
                f"episode shape mismatch: support {support_x.shape}, "
                f"query {query_x.shape} vs config "
                f"({c.n_way}-way {c.k_shot}-shot, {c.pc_npts} pts, "
                f"{c.n_way * c.n_queries} queries)")
        ep = Episode(
            support_x=np.asarray(support_x, np.float32),
            support_y=np.asarray(support_y, np.int32),
            query_x=np.asarray(query_x, np.float32),
            query_y=np.zeros((q, n), np.int32),          # dummy: loss unused
            gt_support_y=np.asarray(support_y, np.int32),
            gt_query_y=np.zeros((q, n), np.int32),
            support_flag=np.ones((c.n_way, c.k_shot), np.int32))
        pred, _, _ = self._learner.test(ep, eval_mdns=self.eval_mdns)
        return np.asarray(pred[0] if pred.ndim == 3 else pred)

    __call__ = predict

    # ------------------------------------------------------------------
    def predict_scene(self, support_x: np.ndarray, support_y: np.ndarray,
                      scene_xyz: np.ndarray, scene_rgb: Optional[np.ndarray]
                      = None, *, mesh=None, cell: float = 1.0) -> np.ndarray:
        """Segment a WHOLE scene in one transductive graph.

        The reference can only evaluate independent 2048-point blocks (its
        graph is one dense matrix on one GPU, mpti.py:717-776).  Here the
        scene's P points all join a single label-propagation graph with the
        support prototypes, and that graph is node-sharded over ``mesh``
        (`parallel.sp_label_propagate`) when one is given — the node count
        scales with the mesh's aggregate HBM, not one chip.

        Args:
          support_x / support_y: as `predict`.
          scene_xyz: (P, 3) raw scene coordinates.
          scene_rgb: optional (P, 3) colors in [0, 1] (zeros if omitted).
          mesh: optional 1-D `jax.sharding.Mesh` to shard the graph over.
          cell: spatial sort granularity (metres) for grouping points into
            encoder blocks — the serving analogue of the reference's 1m
            block preprocessing.
        Returns:
          (P,) int32 labels (0 = bg, 1..n_way) in the input point order.
        """
        import jax

        c = self.cfg
        if c.pc_in_dim != 9:
            raise NotImplementedError(
                "predict_scene assembles xyzrgbXYZ attributes (9-d)")
        n = c.pc_npts
        xyz = np.asarray(scene_xyz, np.float32)
        p = xyz.shape[0]
        rgb = (np.zeros((p, 3), np.float32) if scene_rgb is None
               else np.asarray(scene_rgb, np.float32))

        # ---- spatial sort -> fixed-size encoder blocks (host) ----
        mn = xyz.min(0)
        cid = np.floor((xyz[:, :2] - mn[:2]) / max(cell, 1e-6)).astype(np.int64)
        order = np.lexsort((xyz[:, 2], cid[:, 1], cid[:, 0]))
        n_dev = mesh.devices.size if mesh is not None else 1
        n_blocks = -(-p // n)
        nb = ((n_blocks + n_dev - 1) // n_dev) * n_dev  # mesh-divisible
        idx = np.resize(order, n_blocks * n)   # cycle points into the pad
        blocks_xyz = np.zeros((nb, n, 3), np.float32)
        blocks_rgb = np.zeros((nb, n, 3), np.float32)
        blocks_xyz[:n_blocks] = xyz[idx].reshape(n_blocks, n, 3)
        blocks_rgb[:n_blocks] = rgb[idx].reshape(n_blocks, n, 3)
        # per-block min-shift + scene-extent normalisation, the sampler's
        # attribute conventions (data/sampler.py; loader.py:200-219)
        local = blocks_xyz - blocks_xyz.min(axis=1, keepdims=True)
        scale = np.maximum((xyz - mn).max(0), 1e-6)
        glob = (blocks_xyz - mn) / scale
        blocks = np.concatenate([local, blocks_rgb, glob], axis=-1)
        pad_mask = np.zeros(nb * n, bool)
        pad_mask[:p] = True                    # pad nodes leave the graph

        state = self._learner.state
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if mesh is not None:
            # block batch sharded over the mesh: DP encoding, and the jitted
            # program hands the sharded features straight to the node-
            # sharded LP (parallel/sp.py) without re-gathering
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            blocks = jax.device_put(
                blocks, NamedSharding(mesh, P(mesh.axis_names[0])))

        fn = self._scene_fn(mesh)
        pred_sorted = np.asarray(fn(
            variables, blocks, pad_mask,
            np.asarray(support_x, np.float32),
            np.asarray(support_y, np.int32)), np.int32)[:p]
        out = np.empty(p, np.int32)
        out[order] = pred_sorted
        return out

    def _scene_fn(self, mesh):
        """One jitted device program per mesh-ness: encode blocks + support,
        MDNS, prototypes, global graph LP, argmax.  jax.jit re-traces per
        scene size; the compiled program is cached across calls."""
        # Mesh hashes by devices+axis names, so a fresh make_mesh(8) per
        # call still hits the cache (id() would recompile every call).
        # The LP implementation override is part of the key: changing
        # R3D_SCENE_LP between calls must not silently reuse the program
        # compiled for the previous impl.
        key = (mesh, os.environ.get("R3D_SCENE_LP", "auto"))
        cache = getattr(self, "_scene_cache", None)
        if cache is None:
            cache = self._scene_cache = {}
        if key in cache:
            return cache[key]

        import jax
        import jax.numpy as jnp

        c = self.cfg
        model = self._learner.model
        eval_mdns = self.eval_mdns

        def enc(m, x):
            return m.features(x, train=False)

        def fn(variables, blocks, pad_mask, sup_x, sup_y):
            from r3dfsseg_tpu.models.mpti import (episode_graph_nodes,
                                                  mdns_keep_mask)
            nbk, n = blocks.shape[0], blocks.shape[1]
            scene_feat = model.apply(variables, blocks, method=enc)
            d = scene_feat.shape[-1]
            scene_feat = scene_feat.reshape(nbk * n, d)

            sf = model.apply(
                variables, sup_x.reshape(c.n_way * c.k_shot, n, -1),
                method=enc).reshape(c.n_way, c.k_shot, n, d)
            fg = sup_y > 0
            if eval_mdns:
                keep, _ = mdns_keep_mask(sf, fg, sup_x[..., :3],
                                         c.mdns_scales)
                fg_used = fg & (keep[..., None] > 0.5)
            else:
                fg_used = fg
            protos, pvalid, proto_labels, _ = episode_graph_nodes(
                sf, fg_used, fg, c)

            node_feat = jnp.concatenate(
                [protos.astype(jnp.float32), scene_feat.astype(jnp.float32)])
            node_valid = jnp.concatenate([pvalid, pad_mask])
            y0 = jnp.concatenate(
                [proto_labels, jnp.zeros((nbk * n, c.n_classes), jnp.float32)])

            if mesh is not None:
                m_nodes = node_feat.shape[0]
                if m_nodes > 18000 or key[1] == "blocked":
                    # blocked x sharded composition: per-device row blocks
                    # built tile-by-tile (capacity = aggregate HBM x the
                    # blocked headroom), same graph semantics; the dense
                    # sp path's (M/n_dev, M) build slabs would crowd HBM
                    # past ~18k nodes just like the single-chip dense path
                    from r3dfsseg_tpu.parallel import (
                        sp_blocked_label_propagate)
                    gd = (c.compute_dtype if c.graph_dtype == "auto"
                          else c.graph_dtype)
                    z = sp_blocked_label_propagate(
                        node_feat, y0, mesh=mesh, k=c.k_connect,
                        sigma=c.sigma, alpha=c.lp_alpha, valid=node_valid,
                        iters=c.lp_cg_iters,
                        compute_dtype=(jnp.bfloat16 if gd == "bfloat16"
                                       else None))
                else:
                    from r3dfsseg_tpu.parallel import sp_label_propagate
                    z = sp_label_propagate(
                        node_feat, y0, mesh=mesh, k=c.k_connect,
                        sigma=c.sigma, alpha=c.lp_alpha, valid=node_valid,
                        iters=c.lp_cg_iters)
            else:
                # same relaxed-precision contract as the episode core: a
                # bf16 compute/graph dtype halves the M^2 graph traffic
                # (accuracy A/B in BASELINE.md); f32 configs stay exact
                gd = (c.compute_dtype if c.graph_dtype == "auto"
                      else c.graph_dtype)
                lowp = jnp.bfloat16 if gd == "bfloat16" else None
                m_nodes = node_feat.shape[0]
                impl = key[1]   # env read once, part of the cache key
                # dense M^2 is fastest while it fits (one fused build +
                # VMEM-ish matvecs; 193 ms at 16k on v5e) — past ~18k
                # nodes its several M^2 f32 build buffers crowd one chip's
                # HBM.  Above that the blocked path takes over: build the
                # graph tile by tile into one half-width matrix when THAT
                # fits (<= 9.2 GB), else rematerialise per matvec — one
                # chip serves 64k+ points either way.  R3D_SCENE_LP=
                # sparse selects the experimental gather-matvec variant
                # (a measured TPU anti-pattern; kept for study).
                if impl in ("blocked", "sparse") or (impl == "auto"
                                                     and m_nodes > 18000):
                    from r3dfsseg_tpu.ops.lp_blocked import (
                        blocked_label_propagate, sparse_label_propagate)
                    fn_lp = (sparse_label_propagate if impl == "sparse"
                             else blocked_label_propagate)
                    z = fn_lp(
                        node_feat, y0, k=c.k_connect, sigma=c.sigma,
                        alpha=c.lp_alpha, valid=node_valid,
                        iters=c.lp_cg_iters, compute_dtype=lowp)
                else:
                    from r3dfsseg_tpu.ops.lp import (
                        label_propagate, local_constrained_affinity)
                    a = local_constrained_affinity(
                        node_feat, c.k_connect, c.sigma, valid=node_valid,
                        impl="threshold", compare_dtype=lowp)
                    z = label_propagate(a, y0, c.lp_alpha, solver="cheby",
                                        cg_iters=c.lp_cg_iters,
                                        matvec_dtype=lowp)
            return jnp.argmax(z[protos.shape[0]:], axis=-1)

        cache[key] = jax.jit(fn)
        return cache[key]
