"""DGCNN backbone, BaseLearner head and single-head self-attention.

TPU-native re-design of the reference backbone
(`/root/reference/models/dgcnn.py`, `models/attention.py`,
`models/mpti.py:18-40`):

  * channels-LAST layout (B, N, C): every 1x1 conv becomes a dense matmul
    that tiles straight onto the MXU;
  * EdgeConv recomputes the kNN graph on current features per block
    (dynamic graph, dgcnn.py:116) with one Gram matmul + top_k + gather;
  * BatchNorm matches torch defaults (eps=1e-5, momentum 0.1 on running
    stats) — training normalises over the episode's cloud batch exactly as
    the reference does, eval uses running statistics;
  * LeakyReLU(0.2) activations (dgcnn.py:57).

Parameter tree is designed so a converted PyTorch checkpoint
(`utils/checkpoint_util.py:9-23` key remapping) drops in one-to-one —
see `r3dfsseg_tpu.utils.torch_convert`.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from r3dfsseg_tpu.ops.knn import knn_indices, gather_neighbors

Array = jax.Array


class GroupedBatchNorm(nn.Module):
    """Train-mode BatchNorm whose batch statistics are computed PER GROUP
    of leading-axis rows (one group = one episode under episode batching).

    The reference trains with batch_size=1 episodes, so its BatchNorm
    statistics span exactly one episode's clouds
    (`/root/reference/models/dgcnn.py:53-55`, `mpti.py:433-437`).  Batching
    E episodes into one jit step must NOT widen that statistics batch to
    E episodes — each episode's activations are normalised with its own
    mean/var here, making E>1 semantics-identical (per episode) to the
    reference's E=1 loop.  Running statistics are updated with the mean of
    the per-group statistics, which reduces exactly to flax's update at
    groups=1.

    Variable tree ({params: {scale, bias}, batch_stats: {mean, var}})
    matches `nn.BatchNorm`, so the same checkpoint serves both paths.

    Implementation note (round-5 E>1 throughput fix): statistics are
    computed as per-LEADING-ROW reductions (B, ..., C) -> (B, C) followed
    by a tiny (G, per, C) group reduction, and normalisation broadcasts
    (B, C) statistics back over the row — the big activation tensor is
    never reshaped.  The first version reshaped x to (G, -1, C) before
    reducing; at E=8 XLA materialised that reshape (and the f32
    normalised copy behind it) as standalone ~500 MB copy/reshape ops on
    the EdgeConv edge tensor, costing ~19 ms/step per BN against an
    18 ms whole-step E=1 baseline (trace in DESIGN.md round-5 section).
    Row-wise reduces + broadcast-elementwise normalisation fuse into the
    producing conv and downstream LeakyReLU/max exactly like the flax BN
    does at groups=1.
    """
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None          # output dtype (None -> f32 for f32 inputs)
    use_fast_variance: bool = False

    @nn.compact
    def __call__(self, x: Array, groups: int) -> Array:
        c = x.shape[-1]
        b = x.shape[0]
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        assert b % groups == 0, (x.shape, groups)
        per = b // groups
        xf = x.astype(jnp.float32)
        red = tuple(range(1, x.ndim - 1))
        count = per
        for s in x.shape[1:-1]:
            count *= s
        bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
        row_sum = jnp.sum(xf, axis=red)                   # (B, C)
        mean = row_sum.reshape(groups, per, c).sum(1) / count   # (G, C)
        mean_b = jnp.repeat(mean, per, axis=0).reshape(bshape)
        if self.use_fast_variance:
            row_sq = jnp.sum(xf * xf, axis=red)
            var = (row_sq.reshape(groups, per, c).sum(1) / count
                   - mean * mean)
        else:
            d = xf - mean_b
            row_var = jnp.sum(d * d, axis=red)
            var = row_var.reshape(groups, per, c).sum(1) / count
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * jnp.mean(mean, 0)
            ra_var.value = m * ra_var.value + (1.0 - m) * jnp.mean(var, 0)
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        mul = jax.lax.rsqrt(var + self.epsilon) * scale   # (G, C)
        mul_b = jnp.repeat(mul, per, axis=0).reshape(bshape)
        y = (xf - mean_b) * mul_b + bias
        return y.astype(dt)


class ConvBN(nn.Module):
    """1x1 conv (dense) + BatchNorm [+ LeakyReLU], torch-compatible.

    Covers the reference's `conv2d`/`conv1d` stacks (dgcnn.py:45-80) and
    BaseLearner's Conv1d+BN pairs; works on any (..., C) layout because the
    dense contraction and BN statistics both operate on the trailing axis.
    """
    features: int
    use_bias: bool = False
    relu: bool = True
    negative_slope: float = 0.2
    dtype: Any = None          # compute dtype (bf16 keeps params/BN in f32)
    # BN precision in bf16 mode: 'exact' = f32 two-pass stats + f32 output;
    # 'fastvar' = f32 single-pass stats + f32 output (saves one full-tensor
    # read); 'stats' = f32 two-pass stats, bf16 output; 'relaxed' = bf16
    # fast-var.  ('hybrid' is resolved per-layer by DGCNN/BaseLearner and
    # never reaches this module.)
    bn_mode: str = "exact"

    @nn.compact
    def __call__(self, x: Array, train: bool = False, groups: int = 1) -> Array:
        x = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     name="conv")(x)
        # Two-pass variance in f32 mode: the E[x^2]-E[x]^2 shortcut cancels
        # catastrophically on edge features whose mean >> std (~2e-2 drift
        # per block vs torch).  In bf16 mode numerics are already relaxed,
        # so the single-pass form saves one full-tensor reduction per BN.
        # dtype=self.dtype keeps the normalised activations in bf16 in
        # bf16 mode (halves the tensor bandwidth); flax always computes the
        # batch statistics in f32 (force_float32_reductions), so BN running
        # stats stay accurate.  bn_mode opts the BN (only) back into the
        # f32 two-pass path as an accuracy escape hatch (BASELINE.md A/B:
        # bf16 fast-var BN loses ~0.1 mean-IoU in meta-training).
        bn_dtype = (jnp.float32 if self.bn_mode in ("exact", "fastvar")
                    else self.dtype)
        fast = (self.dtype is not None
                and self.bn_mode in ("relaxed", "fastvar"))
        if train and groups > 1:
            # episode batching: per-episode statistics (reference BN batch
            # semantics at any E — see GroupedBatchNorm)
            x = GroupedBatchNorm(momentum=0.9, epsilon=1e-5, dtype=bn_dtype,
                                 use_fast_variance=fast, name="bn")(x, groups)
        else:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9, epsilon=1e-5, name="bn", dtype=bn_dtype,
                use_fast_variance=fast,
            )(x)
        if self.relu:
            x = nn.leaky_relu(x, self.negative_slope)
        return x


class EdgeConv(nn.Module):
    """One EdgeConv block: kNN -> edge features -> MLP -> max over k.

    Matches `get_edge_feature` + `conv2d` + max (dgcnn.py:26-42,113-119).
    Edge feature = concat(neighbour - central, central): (B, N, K, 2C).

    knn_impl selects the neighbour search:
      'auto'   — fused Pallas kernel on TPU, exact XLA elsewhere;
      'pallas' — fused distance+top-k kernel (ops/pallas_knn.py);
      'pallas_exact' — the same kernel's full-precision extraction:
                 selection-identical to 'xla' (no index-packing
                 quantisation), ~3x cheaper than the top_k sort — the
                 TPU parity-mode path (bench.py);
      'xla'    — exact lax.top_k (reference-equivalent);
      'approx' — lax.approx_max_k (TPU-optimised, ~4x faster than top_k,
                 recall ~0.95 — fine for training, not bit-parity).

    fuse_edge: ARCHIVED negative result.  The fused Pallas post-gather
    pipeline (BN0/leaky/W1/BN1/leaky/max over the raw edge tensor)
    measured SLOWER than XLA on v5e in BOTH layout generations — round 2:
    58 vs 42 ms/step; round 4 re-measure under the one-hot-gather
    layouts: 38.6 vs 18.7 ms/step — XLA's bf16 elementwise fusion already
    keeps the edge-tensor passes cheap, and the fused backward's 3x
    in-VMEM recompute costs more VPU time than the saved HBM traffic.
    Kernels + value/grad tests live in `scripts/archive/fused_edge.py`;
    requesting 'on' raises.
    """
    widths: Tuple[int, ...]
    k: int = 20
    knn_impl: str = "auto"
    dtype: Any = None
    exact_grad_gather: bool = False
    fuse_edge: str = "auto"
    bn_mode: str = "exact"
    # Per-layer override (len == len(widths)); DGCNN uses it to resolve the
    # 'hybrid' mode.  None -> bn_mode for every layer.
    bn_modes: Optional[Tuple[str, ...]] = None

    def _knn(self, x: Array) -> Array:
        impl = self.knn_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl in ("pallas", "pallas_exact"):
            from r3dfsseg_tpu.ops.pallas_knn import knn_indices_pallas
            return knn_indices_pallas(x, self.k,
                                      exact=impl == "pallas_exact")
        if impl == "approx":
            from r3dfsseg_tpu.ops.knn import pairwise_sqdist
            _, idx = jax.lax.approx_max_k(-pairwise_sqdist(x), self.k)
            return idx.astype(jnp.int32)
        return knn_indices(x, self.k)

    @nn.compact
    def __call__(self, x: Array, train: bool = False, groups: int = 1) -> Array:
        if self.fuse_edge == "on":
            raise NotImplementedError(
                "fuse_edge='on' was archived as a measured negative result "
                "(2x slower than XLA on v5e both rounds it was tried) — "
                "see scripts/archive/fused_edge.py and DESIGN.md")
        idx = self._knn(jax.lax.stop_gradient(x))             # (B, N, K)
        modes = self.bn_modes or (self.bn_mode,) * len(self.widths)
        e = _EdgeFirstLayer(self.widths[0], dtype=self.dtype,
                            exact_grad=self.exact_grad_gather,
                            bn_mode=modes[0],
                            name="layer0")(x, idx, train=train, groups=groups)
        for i, w in enumerate(self.widths[1:], start=1):
            e = ConvBN(w, dtype=self.dtype, bn_mode=modes[i],
                       name=f"layer{i}")(e, train=train, groups=groups)
        return jnp.max(e, axis=2)                             # max over K


class _EdgeFirstLayer(nn.Module):
    """Factored first EdgeConv layer.

    The reference materialises the (B, N, K, 2C) edge tensor
    concat(nbr - central, central) and convolves it (dgcnn.py:38-42).  The
    conv is linear, so with kernel W = [W_n; W_c]:

        conv(edge) = gather(x @ W_n, idx) + (x @ (W_c - W_n))[:, :, None]

    i.e. two tiny (N, 2C)->(N, C1) matmuls on the *points*, one gather on
    the C1-dim result and a broadcast add — the 2C edge tensor never exists
    and the per-edge matmul (N*K x 2C x C1, ~40x the FLOPs) disappears.
    Parameter layout ('conv' Dense with a (2C, C1) kernel + 'bn') is
    identical to ConvBN, so torch checkpoints convert unchanged.
    """
    features: int
    dtype: Any = None
    negative_slope: float = 0.2
    exact_grad: bool = False
    bn_mode: str = "exact"

    @nn.compact
    def __call__(self, x: Array, idx: Array, train: bool = False,
                 groups: int = 1) -> Array:
        conv = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                        name="conv")
        zeros = jnp.zeros_like(x)
        a = conv(jnp.concatenate([x, zeros], axis=-1))        # x @ W_n
        b = conv(jnp.concatenate([-x, x], axis=-1))           # x @ (W_c - W_n)
        from r3dfsseg_tpu.ops.fast_gather import gather_neighbors_fast
        e = gather_neighbors_fast(a, idx, self.exact_grad) + b[:, :, None, :]
        bn_dtype = (jnp.float32 if self.bn_mode in ("exact", "fastvar")
                    else self.dtype)
        fast = (self.dtype is not None
                and self.bn_mode in ("relaxed", "fastvar"))
        if train and groups > 1:
            e = GroupedBatchNorm(momentum=0.9, epsilon=1e-5, dtype=bn_dtype,
                                 use_fast_variance=fast, name="bn")(e, groups)
        else:
            e = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=bn_dtype,
                             use_fast_variance=fast, name="bn")(e)
        return nn.leaky_relu(e, self.negative_slope)


class DGCNN(nn.Module):
    """Stacked EdgeConv blocks + pointwise MLP (dgcnn.py:83-127).

    Returns (level-1 features, final features): the first EdgeConv output
    feeds the 192-d few-shot embedding concat (mpti.py:68,589).
    """
    edgeconv_widths: Tuple[Tuple[int, ...], ...] = ((64, 64), (64, 64), (64, 64))
    mlp_widths: Tuple[int, ...] = (512, 256)
    k: int = 20
    return_edgeconvs: bool = False
    knn_impl: str = "auto"
    dtype: Any = None
    exact_grad_gather: bool = False
    fuse_edge: str = "auto"
    bn_mode: str = "exact"

    @nn.compact
    def __call__(self, x: Array, train: bool = False, groups: int = 1):
        hybrid = self.bn_mode == "hybrid"
        outs = []
        h = x
        for i, widths in enumerate(self.edgeconv_widths):
            # 'hybrid' (BASELINE.md A/B): only BN outputs that feed the
            # 192-d episode embedding *without* being renormalised
            # downstream need f32 — that is edgeconv0's last layer (the
            # level-1 features, mpti.py:68,589).  Every other edge BN
            # output goes through another conv+BN (or the concat->mlp BN),
            # which renormalises away the bf16 quantisation, so those run
            # in the cheap relaxed mode.
            if hybrid:
                last = "exact" if i == 0 else "relaxed"
                modes = ("relaxed",) * (len(widths) - 1) + (last,)
            else:
                modes = None
            h = EdgeConv(tuple(widths), k=self.k, knn_impl=self.knn_impl,
                         dtype=self.dtype,
                         exact_grad_gather=self.exact_grad_gather,
                         fuse_edge=self.fuse_edge,
                         bn_mode="relaxed" if hybrid else self.bn_mode,
                         bn_modes=modes,
                         name=f"edgeconv{i}")(h, train=train, groups=groups)
            outs.append(h)
        h = jnp.concatenate(outs, axis=-1)
        for i, w in enumerate(self.mlp_widths):
            if hybrid:
                # the final MLP output feeds attention / BaseLearner whose
                # own outputs join the embedding; keep it f32 (single-pass
                # stats suffice — only the output quantisation was harmful)
                mode = "fastvar" if i == len(self.mlp_widths) - 1 else "relaxed"
            else:
                mode = self.bn_mode
            h = ConvBN(w, dtype=self.dtype, bn_mode=mode,
                       name=f"mlp{i}")(h, train=train, groups=groups)
        if self.return_edgeconvs:
            return outs, h
        return outs[0], h


class BaseLearner(nn.Module):
    """Conv1d+BN stack with ReLU between layers, none after the last
    (mpti.py:18-40)."""
    widths: Tuple[int, ...] = (128, 64)
    dtype: Any = None
    bn_mode: str = "exact"

    @nn.compact
    def __call__(self, x: Array, train: bool = False, groups: int = 1) -> Array:
        n = len(self.widths)
        for i, w in enumerate(self.widths):
            if self.bn_mode == "hybrid":
                # final layer feeds the 192-d embedding directly -> f32 out
                mode = "fastvar" if i == n - 1 else "relaxed"
            else:
                mode = self.bn_mode
            x = ConvBN(w, use_bias=True, relu=False, dtype=self.dtype,
                       bn_mode=mode,
                       name=f"conv{i}")(x, train=train, groups=groups)
            if i != n - 1:
                x = nn.relu(x)
        return x


class SelfAttention(nn.Module):
    """Single-head QKV attention over all points (attention.py:10-48).

    q,k,v are bias-free 1x1 convs; attn = softmax(q k^T / sqrt(d_out)) with
    dropout on the attention map in training.
    """
    out_channel: int
    attn_dropout: float = 0.1
    dtype: Any = None
    attn_impl: str = "auto"    # auto | pallas | xla
    score_f32: bool = False    # keep attention matmuls f32 in bf16 mode

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        d = self.out_channel
        q = nn.Dense(d, use_bias=False, dtype=self.dtype, name="q_map")(x)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="k_map")(x)
        v = nn.Dense(d, use_bias=False, dtype=self.dtype, name="v_map")(x)

        impl = self.attn_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl == "pallas":
            # fused VMEM-resident attention (ops/pallas_attention.py); the
            # dropout mask regenerates from an int32 seed in fwd and bwd.
            # In bf16 mode q/k/v stay bf16 so the kernel's matmuls take the
            # single-pass MXU path (softmax statistics are f32 inside);
            # f32 mode keeps full-precision scores via HIGHEST.
            from r3dfsseg_tpu.ops.pallas_attention import fused_attention
            if train and self.attn_dropout > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1,
                    dtype=jnp.int32)
            else:
                seed = jnp.int32(0)
            if self.dtype == jnp.bfloat16 and not self.score_f32:
                q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
            else:
                q, k, v = (t.astype(jnp.float32) for t in (q, k, v))
            y = fused_attention(
                q, k, v, seed, float(d) ** 0.5, self.attn_dropout, train)
            return y.astype(x.dtype)

        if self.score_f32:
            q, k, v = (t.astype(jnp.float32) for t in (q, k, v))
        prec = jax.lax.Precision.HIGHEST if self.score_f32 else None
        attn = jnp.einsum("bnd,bmd->bnm", q / jnp.sqrt(d).astype(q.dtype), k,
                          preferred_element_type=jnp.float32, precision=prec)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_dropout, deterministic=not train,
                          name="dropout")(attn)
        return jnp.einsum("bnm,bmd->bnd", attn.astype(v.dtype), v,
                          preferred_element_type=jnp.float32,
                          precision=prec).astype(x.dtype)


class FeatureExtractor(nn.Module):
    """The 192-d few-shot embedding: concat(level1, attention|mapper, base).

    Mirrors `MPTI_SelfAtten.getFeatures` / `ProtoNet.getFeatures`
    (mpti.py:579-595, protonet.py:277-293).  Input (B, N, C_in); output
    (B, N, feat_dim) with feat_dim = 64 + output_dim + base_widths[-1].
    """
    edgeconv_widths: Tuple[Tuple[int, ...], ...] = ((64, 64), (64, 64), (64, 64))
    dgcnn_mlp_widths: Tuple[int, ...] = (512, 256)
    base_widths: Tuple[int, ...] = (128, 64)
    output_dim: int = 64
    dgcnn_k: int = 20
    use_attention: bool = True
    attn_dropout: float = 0.1
    knn_impl: str = "auto"
    attn_impl: str = "auto"
    dtype: Any = None
    exact_grad_gather: bool = False
    fuse_edge: str = "auto"
    attn_f32: bool = False
    bn_mode: str = "exact"

    @nn.compact
    def __call__(self, x: Array, train: bool = False, groups: int = 1) -> Array:
        # groups > 1 = episode batching: BN statistics are computed per
        # episode group so E>1 keeps the reference's per-episode BN batch
        # semantics (GroupedBatchNorm; ref dgcnn.py:53-55, mpti.py:433-437)
        feat1, feat2 = DGCNN(
            self.edgeconv_widths, self.dgcnn_mlp_widths, k=self.dgcnn_k,
            knn_impl=self.knn_impl, dtype=self.dtype,
            exact_grad_gather=self.exact_grad_gather,
            fuse_edge=self.fuse_edge, bn_mode=self.bn_mode,
            name="encoder",
        )(x, train=train, groups=groups)
        feat3 = BaseLearner(self.base_widths, dtype=self.dtype,
                            bn_mode=self.bn_mode,
                            name="base_learner")(feat2, train=train,
                                                 groups=groups)
        if self.use_attention:
            mid = SelfAttention(self.output_dim, self.attn_dropout,
                                dtype=self.dtype, attn_impl=self.attn_impl,
                                score_f32=self.attn_f32,
                                name="att_learner")(feat2, train=train)
        else:
            mid = nn.Dense(self.output_dim, use_bias=False,
                           name="linear_mapper")(feat2)
        out = jnp.concatenate([feat1, mid, feat3], axis=-1)
        return out.astype(jnp.float32)  # episode graph math stays f32


class DGCNNSegAttention(nn.Module):
    """Pretraining segmentation head (DGCNN + attention + segmenter).

    Re-design of `DGCNNSeg_attention` (dgcnn.py:185-217): full-scene
    semantic segmentation used to pretrain the encoder before episode
    meta-training (README.md:43-44).  With v2=True only level-1 + attention
    features feed the segmenter (`DGCNNSeg_attention_v2`, dgcnn.py:220-255).
    """
    num_classes: int
    edgeconv_widths: Tuple[Tuple[int, ...], ...] = ((64, 64), (64, 64), (64, 64))
    dgcnn_mlp_widths: Tuple[int, ...] = (512, 256)
    dgcnn_k: int = 20
    atten_dim: int = 128
    dropout: float = 0.3
    attn_dropout: float = 0.1
    v2: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False, return_feat: bool = False):
        outs, h = DGCNN(
            self.edgeconv_widths, self.dgcnn_mlp_widths, k=self.dgcnn_k,
            return_edgeconvs=True, name="encoder",
        )(x, train=train)
        h = SelfAttention(self.atten_dim, self.attn_dropout,
                          name="att_learner")(h, train=train)
        if self.v2:
            pc_feat = jnp.concatenate([outs[0], h], axis=-1)  # dgcnn.py:246
        else:
            g = jnp.max(h, axis=1, keepdims=True)             # global feature
            feats = outs + [jnp.broadcast_to(g, h.shape)]
            pc_feat = jnp.concatenate(feats, axis=-1)
        z = ConvBN(256, name="seg0")(pc_feat, train=train)
        z = ConvBN(128, use_bias=True, name="seg1")(z, train=train)
        z = nn.Dropout(self.dropout, deterministic=not train)(z)
        logits = nn.Dense(self.num_classes, name="seg_out")(z)
        if return_feat:
            few_shot_feat = jnp.concatenate([outs[0], h], axis=-1)
            return logits, few_shot_feat
        return logits
