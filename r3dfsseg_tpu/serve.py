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
