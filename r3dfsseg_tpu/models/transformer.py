"""TraNFS-style transformer baseline for noisy few-shot segmentation.

Re-design of `ProtoNet_transformer` (`/root/reference/models/protonet.py:
1014-1349`): per-shot masked-average fg embeddings pass through a small
transformer together with per-way class tokens; the refreshed class-token
outputs become the fg prototypes.  Training adds
  * a binary outlier head (BCE) on the refreshed shot embeddings
    (protonet.py:1204-1213, weight 0.5), and
  * an MSE pulling the transformer prototypes to the mean of gt-clean shots
    (protonet.py:1217-1235, weight 1).

Also carries `gen_prototypes` (protonet.py:948-1011): mean / soft-median
(Newton iterations) / attention-weighted (cosine|euclidean|abs) prototype
aggregation.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from r3dfsseg_tpu.config import R3DConfig
from r3dfsseg_tpu.models.episode import Episode
from r3dfsseg_tpu.nn import FeatureExtractor
from r3dfsseg_tpu.ops.segment import masked_mean

Array = jax.Array


# ----------------------------------------------------------------------
def gen_prototypes(embeddings: Array, ways: int, shots: int,
                   agg_method: str = "mean") -> Array:
    """Prototype aggregation variants (protonet.py:948-1011)."""
    emb = embeddings.reshape(ways, shots, -1)
    mean_emb = jnp.mean(emb, axis=1)
    if agg_method == "mean":
        return mean_emb
    if agg_method == "median":
        # soft geometric median via 5 Newton steps (protonet.py:961-973)
        med = mean_emb[:, None, :]
        c = 0.5
        for _ in range(5):
            err = med - emb
            denom = jnp.sqrt(jnp.sum(err ** 2, axis=2, keepdims=True) + c * c)
            dw = (-jnp.sum(err / denom, axis=1, keepdims=True)
                  / jnp.sum(1.0 / denom, axis=1, keepdims=True))
            med = med + dw
        return med[:, 0, :]
    if agg_method.split("_")[0] in ("cosine", "euclidean", "abs"):
        eps = 1e-6
        if agg_method.startswith("cosine"):
            nrm = emb / (jnp.linalg.norm(emb, axis=2, keepdims=True) + eps)
            cos = jnp.einsum("wsd,wtd->wst", nrm, nrm)
            attn = (jnp.sum(cos, axis=1) - 1.0) / (shots - 1)
        elif agg_method.startswith("euclidean"):
            d = jnp.sum((emb[:, :, None] - emb[:, None]) ** 2, axis=-1)
            attn = -jnp.sum(d, axis=1) / (shots - 1)
        else:
            d = jnp.sum(jnp.abs(emb[:, :, None] - emb[:, None]), axis=-1)
            attn = -jnp.sum(d, axis=1) / (shots - 1)
        t = float(agg_method.split("_")[-1]) if "_" in agg_method else 1.0
        w = jax.nn.softmax(attn / t, axis=1)[..., None]
        return jnp.sum(emb * w, axis=1)
    raise NotImplementedError(agg_method)


class EncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (torch TransformerEncoderLayer
    defaults: norm_first=False, relu, dropout 0.1, LayerNorm eps 1e-5)."""
    d_model: int
    n_head: int
    d_feed: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=not train,
            name="self_attn")(x, x)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)
        h = nn.Dense(self.d_feed, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, name="linear2")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)


class ShotTransformer(nn.Module):
    """[cls tokens; shot embeddings] + class-position embeddings ->
    encoder stack (protonet.py:1024-1104)."""
    ways: int
    shots: int
    num_layers: int = 3
    n_head: int = 8
    d_model: int = 128
    d_feed: int = 128
    dropout: float = 0.1
    cls_type: str = "rand_const"   # reference config (protonet.py:1149)
    pos_type: str = "pos_learn"
    agg_method: str = "mean"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        """x: (ways*shots, d_model) -> (ways*(shots+1), d_model)."""
        # the reference sizes cls/pos embeddings by dim_feedforward
        # (protonet.py:1048-1063), which only type-checks because it always
        # runs with dim_feedforward == d_model == 128; the tokens they are
        # added to are d_model-sized, so d_model is used here.
        if self.cls_type in ("cls_learn", "rand_const"):
            cls_emb = nn.Embed(self.ways, self.d_model, name="cls_embeddings")
            cls_tokens = cls_emb(jnp.arange(self.ways))
            if self.cls_type == "rand_const":
                cls_tokens = jax.lax.stop_gradient(cls_tokens)
        elif self.cls_type == "proto":
            cls_tokens = gen_prototypes(x, self.ways, self.shots, self.agg_method)
        else:
            raise NotImplementedError(self.cls_type)

        seq = jnp.concatenate([cls_tokens, x], axis=0)
        pos_emb = nn.Embed(self.ways, self.d_model, name="pos_embeddings")
        pos_idx = jnp.concatenate(
            [jnp.arange(self.ways),
             jnp.repeat(jnp.arange(self.ways), self.shots)])
        pos = pos_emb(pos_idx)
        if self.pos_type == "rand_const":
            pos = jax.lax.stop_gradient(pos)
        h = (seq + pos)[None]                       # (1, L, d): batch-of-1
        for i in range(self.num_layers):
            h = EncoderLayer(self.d_model, self.n_head, self.d_feed,
                             dropout=self.dropout,
                             name=f"layer{i}")(h, train=train)
        return h[0]


class TransformerOutput(NamedTuple):
    query_logits: Array
    loss: Array
    binary_loss: Array
    clean_proto_loss: Array
    aux: Dict[str, Array]


class ProtoNetTransformer(nn.Module):
    """ProtoNet with transformer-refined fg prototypes + outlier losses
    (protonet.py:1107-1262)."""
    cfg: R3DConfig
    d_model: int = 128
    n_layers: int = 3
    n_head: int = 8
    d_feed: int = 128
    dropout: float = 0.1
    binary_loss_weight: float = 0.5     # protonet.py:1156
    clean_proto_loss_weight: float = 1.0  # protonet.py:1157

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
        # orthogonal-initialised in/out projections, out starts as a copy of
        # in (protonet.py:1134-1139) — both params draw the same matrix from
        # a seed-derived stream, then train independently
        orth = nn.initializers.orthogonal()
        shared = lambda _rng, shape: orth(  # noqa: E731
            jax.random.PRNGKey(c.seed), shape)
        self.proj_trans_in = self.param(
            "proj_trans_in", shared, (c.feat_dim, self.d_model))
        self.proj_trans_out = self.param(
            "proj_trans_out", shared, (c.feat_dim, self.d_model))
        self.transformer = ShotTransformer(
            ways=c.n_way, shots=c.k_shot, num_layers=self.n_layers,
            n_head=self.n_head, d_model=self.d_model, d_feed=self.d_feed,
            dropout=self.dropout, name="transformer")
        self.binary_head = nn.Dense(1, name="binary_outlier_detector")

    def __call__(self, ep: Episode, train: bool = False,
                 eval_mdns: bool = False) -> TransformerOutput:
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

        fg = ep.support_y > 0
        fg_feat = masked_mean(sf, fg[..., None], axis=3)       # (E, w, k, d)
        bg_feat = masked_mean(sf, (~fg)[..., None], axis=3)

        if self.is_initializing():
            # touch the train-only head so its params exist in eval init
            self.binary_head(jnp.zeros((1, d), sf.dtype))

        def per_episode(fg_e):
            z = fg_e.reshape(c.n_way * c.k_shot, d) @ self.proj_trans_in
            out = self.transformer(z, train=train)             # (w*(k+1), dm)
            return out @ self.proj_trans_out.T                 # back to feat_dim

        trans_out = jax.vmap(per_episode)(fg_feat) if e > 1 else \
            per_episode(fg_feat[0])[None]
        fg_protos = trans_out[:, :c.n_way]                     # (E, w, d)
        shot_out = trans_out[:, c.n_way:]                      # (E, w*k, d)

        bg_proto = jnp.mean(bg_feat.reshape(e, -1, d), axis=1)  # (E, d)
        protos = jnp.concatenate([bg_proto[:, None], fg_protos], axis=1)

        if c.dist_method == "cosine":
            qn = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-12)
            pn = protos / jnp.maximum(
                jnp.linalg.norm(protos, axis=-1, keepdims=True), 1e-12)
            sim = jnp.einsum("eqnd,ecd->eqnc", qn, pn) * 10.0
        elif c.dist_method == "euclidean":
            d2 = (jnp.sum(qf * qf, -1)[..., None]
                  - 2.0 * jnp.einsum("eqnd,ecd->eqnc", qf, protos)
                  + jnp.sum(protos * protos, -1)[:, None, None, :])
            sim = -jnp.maximum(d2, 0.0)
        else:
            raise NotImplementedError(c.dist_method)

        logp = jax.nn.log_softmax(sim, axis=-1)
        loss = -jnp.mean(jnp.take_along_axis(logp, ep.query_y[..., None], -1))

        binary_loss = jnp.zeros((), jnp.float32)
        clean_proto_loss = jnp.zeros((), jnp.float32)
        if train and ep.gt_support_y is not None:
            is_clean = (jnp.sum(ep.gt_support_y, -1) > 0).astype(jnp.float32)
            # binary outlier BCE on refreshed shot embeddings
            logits = self.binary_head(shot_out)[..., 0]        # (E, w*k)
            lbl = is_clean.reshape(e, -1)
            bce = jnp.maximum(logits, 0) - logits * lbl + jnp.log1p(
                jnp.exp(-jnp.abs(logits)))
            binary_loss = self.binary_loss_weight * jnp.mean(bce)
            # clean-prototype MSE (mean of gt-clean shots per way)
            w_clean = is_clean[..., None]                      # (E, w, k, 1)
            clean_proto = (jnp.sum(fg_feat * w_clean, axis=2)
                           / jnp.maximum(jnp.sum(w_clean, axis=2), 1.0))
            clean_proto_loss = self.clean_proto_loss_weight * (
                jnp.sum((fg_protos - clean_proto) ** 2) / (e * c.n_way))

        pred = jnp.argmax(sim, axis=-1)
        aux = {"accuracy": jnp.mean((pred == ep.query_y).astype(jnp.float32))}
        return TransformerOutput(sim, loss, binary_loss, clean_proto_loss, aux)
