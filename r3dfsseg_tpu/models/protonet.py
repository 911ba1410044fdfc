"""Prototypical network baseline, TPU-native.

Re-design of the reference `ProtoNet` (`/root/reference/models/protonet.py:39-354`):
masked-average fg/bg prototypes + cosine/euclidean similarity + CE, entirely
batched tensor math (the reference's per-way Python list comprehensions
become one einsum over the way axis).

Also carries the noise-robust extensions of `ProtoNet_Contrast`
(`protonet.py:357-945`): the same WayContrast loss and MDNS clean-shot
detection as MPTI, applied to prototype averaging via clean-flag weighting
(`getPrototype(..., clean_flag)`, protonet.py:892-915).
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from r3dfsseg_tpu.config import R3DConfig
from r3dfsseg_tpu.models.episode import Episode
from r3dfsseg_tpu.models.mpti import (
    _contrast_prototypes,
    mdns_keep_mask,
    way_contrast_loss,
)
from r3dfsseg_tpu.nn import FeatureExtractor
from r3dfsseg_tpu.ops.segment import masked_mean

Array = jax.Array


class ProtoOutput(NamedTuple):
    query_logits: Array    # (E, n_q*n_way, n_points, n_classes)
    loss: Array
    contrast_loss: Array
    aux: Dict[str, Array]


class ProtoNet(nn.Module):
    """FeatureExtractor + prototype matching.

    with_contrast=False reproduces the plain baseline (`ProtoNet`);
    with_contrast=True adds WayContrast (train) and MDNS shot weighting
    (eval) — the `ProtoNet_Contrast` variant.
    """
    cfg: R3DConfig
    with_contrast: bool = False

    def setup(self):
        c = self.cfg
        self.features = FeatureExtractor(
            tuple(tuple(w) for w in c.edgeconv_widths),
            tuple(c.dgcnn_mlp_widths), tuple(c.base_widths),
            c.output_dim, dgcnn_k=c.dgcnn_k, use_attention=c.use_attention,
            attn_dropout=c.attn_dropout, knn_impl=c.knn_impl,
            attn_impl=c.attn_impl,
            dtype=(jnp.bfloat16 if c.compute_dtype == "bfloat16" else None),
            exact_grad_gather=c.exact_grad_gather,
            fuse_edge=c.fuse_edge,
            attn_f32=c.attn_f32, bn_mode=c.bn_mode,
            name="features")
        if self.with_contrast:
            self.proj = nn.Dense(c.proj_dim, name="proj")

    def __call__(self, ep: Episode, train: bool = False,
                 eval_mdns: bool = False) -> ProtoOutput:
        c = self.cfg
        ep = ep.with_batch_dim()
        e = ep.support_x.shape[0]
        sx = ep.support_x.reshape(e * c.n_way * c.k_shot, c.pc_npts, -1)
        qx = ep.query_x.reshape(e * c.n_queries * c.n_way, c.pc_npts, -1)
        sf = self.features(sx, train=train, groups=e)   # per-episode BN stats
        qf = self.features(qx, train=train, groups=e)
        d = sf.shape[-1]
        sf = sf.reshape(e, c.n_way, c.k_shot, c.pc_npts, d)
        qf = qf.reshape(e, c.n_queries * c.n_way, c.pc_npts, d)

        contrast = jnp.zeros((), jnp.float32)
        if self.with_contrast and self.is_initializing():
            self.proj(jnp.zeros((1, sf.shape[-1]), sf.dtype))
        if train and self.with_contrast and ep.support_flag is not None:
            protos, pvalid, labels, svalid = jax.vmap(
                lambda f, y, flag: _contrast_prototypes(
                    f, y, flag, c.contrast_fps_k, c.fps_impl)
            )(sf, ep.support_y, ep.support_flag.astype(jnp.float32))
            z = self.proj(protos)
            z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
            contrast = jnp.mean(jax.vmap(
                lambda zz, pv, lb, sv: way_contrast_loss(
                    zz, pv, lb, sv, c.contrast_temp)
            )(z, pvalid, labels, svalid))

        core = lambda s, q, ep1: _proto_core(  # noqa: E731
            s, q, ep1, c, train=train,
            eval_mdns=eval_mdns and self.with_contrast)
        logits, loss, aux = jax.vmap(core)(sf, qf, ep)
        return ProtoOutput(logits, jnp.mean(loss), contrast,
                           jax.tree.map(jnp.mean, aux))


def _proto_core(support_feat, query_feat, ep: Episode, cfg: R3DConfig,
                *, train: bool, eval_mdns: bool):
    c = cfg
    n_way, k_shot, n, d = support_feat.shape
    fg = (ep.support_y > 0)                               # (w, k, N)

    shot_w = jnp.ones((n_way, k_shot), jnp.float32)
    if eval_mdns and not train:
        keep, _ = mdns_keep_mask(support_feat, fg, ep.support_x[..., :3],
                                 c.mdns_scales)
        shot_w = keep                                     # clean-flag weighting

    # masked average pooling per (way, shot) (protonet.py:295-307)
    fg_feat = masked_mean(support_feat, fg[..., None], axis=2)       # (w, k, d)
    bg_feat = masked_mean(support_feat, (~fg)[..., None], axis=2)    # (w, k, d)

    # prototypes (protonet.py:309-324); clean-flag weighted mean for the
    # contrast variant (protonet.py:892-915: sum(feat*flag)/sum(flag)).
    wsum = jnp.maximum(jnp.sum(shot_w, axis=1), 1.0)                 # (w,)
    fg_proto = jnp.einsum("wk,wkd->wd", shot_w, fg_feat) / wsum[:, None]
    bg_proto = jnp.mean(bg_feat.reshape(n_way * k_shot, d), axis=0)
    protos = jnp.concatenate([bg_proto[None], fg_proto], axis=0)     # (w+1, d)

    q = query_feat                                                   # (Q, N, d)
    if c.dist_method == "cosine":
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        pn = protos / jnp.maximum(jnp.linalg.norm(protos, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("qnd,cd->qnc", qn, pn,
                         preferred_element_type=jnp.float32) * 10.0  # scaler (protonet.py:326-344)
    elif c.dist_method == "euclidean":
        d2 = (jnp.sum(q * q, -1, keepdims=True)
              - 2.0 * jnp.einsum("qnd,cd->qnc", q, protos,
                                 preferred_element_type=jnp.float32)
              + jnp.sum(protos * protos, -1)[None, None, :])
        sim = -jnp.maximum(d2, 0.0)                                  # -dist^2 (protonet.py:346)
    else:
        raise NotImplementedError(
            f"Error! Distance computation method ({c.dist_method}) is unknown!")

    logp = jax.nn.log_softmax(sim, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(logp, ep.query_y[..., None], axis=-1))
    pred = jnp.argmax(sim, axis=-1)
    aux = {"accuracy": jnp.mean((pred == ep.query_y).astype(jnp.float32))}
    return sim, loss, aux
