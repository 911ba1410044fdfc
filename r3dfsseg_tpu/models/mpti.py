"""Multi-prototype transductive inference with noise robustness, TPU-native.

Re-design of the reference `MPTI_SelfAtten` (`/root/reference/models/mpti.py:45-781`):
the per-way/per-shot Python loops over ragged foreground point sets become
fixed-shape masked tensor programs, so one episode (or a whole vmapped batch
of episodes) compiles to a single XLA program with no host round-trips.

Pipeline (mpti.py:414-577):
  features -> [train: WayContrast loss | eval: MDNS clean-shot detection]
           -> FPS multi-prototypes (fg per way + bg)
           -> kNN affinity graph over [prototypes ++ query points]
           -> label propagation -> query logits + cross-entropy.

Fixed-shape strategy:
  * prototype slots: `n_subprototypes` per way and for bg, with validity
    masks (a way with < n_subprototypes fg points keeps every fg point as
    its own prototype — the reference's ratio>=1 branch);
  * graph nodes: NP*(n_way+1) proto slots ++ all query points; invalid
    slots get zero affinity rows and zero label rows and drop out of the
    propagation exactly;
  * MDNS grids: every (shot, cell) owns a slot, occupancy is a mask.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from r3dfsseg_tpu.config import R3DConfig
from r3dfsseg_tpu.models.episode import Episode
from r3dfsseg_tpu.nn import FeatureExtractor
from r3dfsseg_tpu.ops import (
    grid_seed_pool,
    label_propagate,
    local_constrained_affinity,
    multi_prototypes,
)

Array = jax.Array


# ======================================================================
# MDNS — Multi-scale Degree-based Noise Suppression (eval-time)
# ======================================================================
def _mdns_flags_one_scale(
    support_feat: Array,   # (n_way, k_shot, N, d)
    support_fg: Array,     # (n_way, k_shot, N) bool
    support_xyz: Array,    # (n_way, k_shot, N, 3)
    n_cells: Tuple[int, int, int],
) -> Array:
    """Per-shot clean flags at one grid scale (mpti.py:87-176).

    Per shot: grid-pool fg features into spatial cells; per way: L2-norm all
    seeds, all-pairs cosine with zero diagonal (cubed at scale 1x1x1),
    degree-sum > mean(degree-sum) marks a seed clean; a shot is clean if
    >50% of its (occupied) cells are clean.
    Returns (n_way, k_shot) float flags in {0, 1}.
    """
    cells = n_cells[0] * n_cells[1] * n_cells[2]

    def per_shot(xyz, feat, fg):
        return grid_seed_pool(xyz, feat, fg, n_cells)

    seeds, seed_ok = jax.vmap(jax.vmap(per_shot))(
        support_xyz, support_feat, support_fg
    )                                                  # (w, k, cells, d), (w, k, cells)

    def per_way(way_seeds, way_ok):
        # (k*cells, d) seed list per way (mpti.py:124)
        s = way_seeds.reshape(-1, way_seeds.shape[-1]).astype(jnp.float32)
        ok = way_ok.reshape(-1)
        s = s / jnp.maximum(jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-12)
        n = s.shape[0]
        cos = jnp.einsum("id,jd->ij", s, s,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        mask2d = ok[:, None] & ok[None, :]
        cos = jnp.where(mask2d & ~jnp.eye(n, dtype=bool), cos, 0.0)
        if cells == 1:
            cos = cos ** 3                              # pow(3) sharpening (mpti.py:135-136)
        deg = jnp.sum(cos, axis=1)                      # (n,)
        mean_deg = jnp.sum(jnp.where(ok, deg, 0.0)) / jnp.maximum(
            jnp.sum(ok.astype(jnp.float32)), 1.0)
        clean_seed = (deg > mean_deg) & ok              # (n,)
        # majority vote per shot over its occupied cells (mpti.py:157-168)
        per_shot_clean = clean_seed.reshape(-1, cells).astype(jnp.float32)
        per_shot_occ = ok.reshape(-1, cells).astype(jnp.float32)
        frac = jnp.sum(per_shot_clean, -1) / jnp.maximum(jnp.sum(per_shot_occ, -1), 1.0)
        return (frac > 0.5).astype(jnp.float32)         # (k_shot,)

    return jax.vmap(per_way)(seeds, seed_ok)            # (n_way, k_shot)


def mdns_keep_mask(
    support_feat: Array,
    support_fg: Array,
    support_xyz: Array,
    scales: Tuple[Tuple[int, int, int], ...],
) -> Tuple[Array, Array]:
    """Multi-scale MDNS (mpti.py:178-223).

    Averages per-shot flags over the grid scales; a shot with mean flag
    < 0.5 has its foreground suppressed.  A way whose every surviving shot
    has zero fg points resets to keeping all shots (mpti.py:216-219).

    Returns:
      keep: (n_way, k_shot) float {0,1} — multiply into the fg mask.
      clean_flag: (n_way, k_shot) float {0,1} (diagnostics).
    """
    flags = [
        _mdns_flags_one_scale(support_feat, support_fg, support_xyz, sc)
        for sc in scales
    ]
    total = jnp.mean(jnp.stack(flags, 0), 0)            # (n_way, k_shot)
    keep = (total >= 0.5).astype(jnp.float32)
    # reset ways that lost every fg point
    n_fg = jnp.sum(support_fg.astype(jnp.float32), axis=-1)   # (w, k)
    alive = jnp.sum(keep * n_fg, axis=-1, keepdims=True) > 0  # (w, 1)
    keep = jnp.where(alive, keep, 1.0)
    return keep, keep


# ======================================================================
# WayContrast — per-way supervised contrastive loss (train-time)
# ======================================================================
def way_contrast_loss(
    proj_feat: Array,      # (n_way, k_shot+2, fps_k, p) projected prototypes
    proto_valid: Array,    # (n_way, k_shot+2, fps_k) bool
    labels: Array,         # (n_way, k_shot+2) float absolute labels (-1 = borrowed negative)
    slot_valid: Array,     # (n_way, k_shot+2) bool (borrowed slots valid iff clean episode)
    temp: float = 0.1,
) -> Array:
    """Supervised InfoNCE per way, averaged over ways (mpti.py:226-313).

    The projection/normalisation happens outside (params live in the flax
    module); this function is pure masked math.
    """
    n_way, slots, fps_k, p = proj_feat.shape

    def per_way(z, pv, lab, sv):
        z = z.reshape(slots * fps_k, p).astype(jnp.float32)
        valid = (pv & sv[:, None]).reshape(-1)                    # (S,)
        lab = jnp.repeat(lab, fps_k)                              # (S,)
        n = z.shape[0]
        not_self = ~jnp.eye(n, dtype=bool)
        pair_ok = valid[:, None] & valid[None, :] & not_self      # logits_mask (mpti.py:288)
        logits = jnp.einsum("id,jd->ij", z, z,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST) / temp
        gt = (lab[:, None] == lab[None, :]) & pair_ok             # (mpti.py:291-293)
        exp = jnp.exp(logits) * pair_ok.astype(jnp.float32)       # (mpti.py:299)
        log_prob = logits - jnp.log(jnp.maximum(jnp.sum(exp, 1, keepdims=True), 1e-12))
        pos_cnt = jnp.sum(gt.astype(jnp.float32), 1)
        mean_log_prob_pos = jnp.sum(gt * log_prob, 1) / jnp.maximum(pos_cnt, 1.0)
        # anchors: valid rows with >=1 positive (reference rows always have
        # fps_k-1 same-shot positives; padding makes the guard necessary)
        row_ok = valid & (pos_cnt > 0)
        loss = -jnp.sum(jnp.where(row_ok, mean_log_prob_pos, 0.0))
        return loss / jnp.maximum(jnp.sum(row_ok.astype(jnp.float32)), 1.0)

    per = jax.vmap(per_way)(proj_feat, proto_valid, labels, slot_valid)
    return jnp.mean(per)


# ======================================================================
# The model
# ======================================================================
class MPTIOutput(NamedTuple):
    query_logits: Array    # (n_q*n_way, n_points, n_classes)
    lp_loss: Array
    contrast_loss: Array
    aux: Dict[str, Array]


class MPTINet(nn.Module):
    """Flax module: FeatureExtractor + WayContrast projection + the episode
    algorithm.  `__call__` accepts a batched Episode (leading E axis)."""
    cfg: R3DConfig

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
        self.proj = nn.Dense(c.proj_dim, name="proj")  # mpti.py:83

    # ------------------------------------------------------------------
    def extract_features(self, ep: Episode, train: bool):
        """Encode support+query clouds.  BN statistics are computed over the
        support batch and the query batch separately, exactly like the two
        `getFeatures` calls in the reference forward (mpti.py:433-437) — and
        PER EPISODE under episode batching (groups=e), so E>1 is
        semantics-identical per episode to the reference's E=1 loop."""
        c = self.cfg
        e = ep.support_x.shape[0]
        sx = ep.support_x.reshape(e * c.n_way * c.k_shot, c.pc_npts, -1)
        qx = ep.query_x.reshape(e * c.n_queries * c.n_way, c.pc_npts, -1)
        sf = self.features(sx, train=train, groups=e)
        qf = self.features(qx, train=train, groups=e)
        d = sf.shape[-1]
        sf = sf.reshape(e, c.n_way, c.k_shot, c.pc_npts, d)
        qf = qf.reshape(e, c.n_queries * c.n_way, c.pc_npts, d)
        return sf, qf

    # ------------------------------------------------------------------
    def __call__(
        self,
        ep: Episode,
        train: bool = False,
        eval_mdns: bool = False,
    ) -> MPTIOutput:
        c = self.cfg
        ep = ep.with_batch_dim()
        sf, qf = self.extract_features(ep, train)

        # WayContrast prototype projection (params) happens at module level;
        # the rest of the episode core is pure and vmapped over episodes.
        if self.is_initializing():
            # touch proj so its params exist even when init runs in eval mode
            self.proj(jnp.zeros((1, sf.shape[-1]), sf.dtype))
        if train:
            protos, pvalid, labels, svalid = jax.vmap(
                lambda f, y, flag: _contrast_prototypes(
                    f, y, flag, c.contrast_fps_k, c.fps_impl)
            )(sf, ep.support_y, ep.support_flag.astype(jnp.float32))
            z = self.proj(protos)
            z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
            contrast = jax.vmap(
                lambda zz, pv, lb, sv: way_contrast_loss(
                    zz, pv, lb, sv, c.contrast_temp)
            )(z, pvalid, labels, svalid)
            contrast = jnp.mean(contrast)
        else:
            contrast = jnp.zeros((), jnp.float32)

        core = lambda s, q, ep1: _mpti_core(  # noqa: E731
            s, q, ep1, c, train=train, eval_mdns=eval_mdns)
        logits, lp_loss, aux = jax.vmap(core)(sf, qf, ep)
        return MPTIOutput(logits, jnp.mean(lp_loss), contrast,
                          jax.tree.map(jnp.mean, aux))


# ----------------------------------------------------------------------
def _contrast_prototypes(
    support_feat: Array,   # (n_way, k_shot, N, d)
    support_y: Array,      # (n_way, k_shot, N)
    support_flag: Array,   # (n_way, k_shot) float
    fps_k: int,
    fps_impl: str = "auto",
):
    """Per-shot FPS prototypes + labels/validity for WayContrast
    (mpti.py:246-284), fixed shapes: (n_way, k_shot+2, fps_k, d).

    Slots [0:k_shot] are the way's own shots; slots [k_shot:k_shot+2] are
    shots 0 and 1 borrowed from the next way as label=-1 negatives, valid
    only when the episode is clean — judged from way 0's flags only, as the
    reference does (mpti.py:239-244).
    """
    n_way, k_shot, n, d = support_feat.shape
    fg = support_y > 0

    def per_shot(f, m):
        mp = multi_prototypes(f, m, fps_k, impl=fps_impl)
        return mp.prototypes, mp.proto_valid

    protos, pvalid = jax.vmap(jax.vmap(per_shot))(support_feat, fg)
    # (n_way, k_shot, fps_k, d) / (n_way, k_shot, fps_k)

    clean = (support_flag[0, 0] * k_shot) == jnp.sum(support_flag[0])
    nxt = (jnp.arange(n_way) + 1) % n_way
    borrowed = protos[nxt][:, :2]                      # (n_way, 2, fps_k, d)
    borrowed_valid = pvalid[nxt][:, :2]
    protos = jnp.concatenate([protos, borrowed], axis=1)
    pvalid = jnp.concatenate([pvalid, borrowed_valid], axis=1)

    labels = jnp.concatenate(
        [support_flag, jnp.full((n_way, 2), -1.0, jnp.float32)], axis=1)
    slot_valid = jnp.concatenate(
        [jnp.ones((n_way, k_shot), bool),
         jnp.broadcast_to(clean, (n_way, 2))], axis=1)
    return protos, pvalid, labels, slot_valid


# ----------------------------------------------------------------------
def episode_graph_nodes(
    support_feat: Array,   # (n_way, k_shot, N, d)
    fg_used: Array,        # (n_way, k_shot, N) bool — MDNS-filtered fg
    fg: Array,             # (n_way, k_shot, N) bool — raw fg masks
    cfg: R3DConfig,
):
    """Multi-prototype graph nodes (mpti.py:488-489,597-715): FPS fg
    prototypes per way from the (possibly MDNS-filtered) fg points, bg
    prototypes from the raw complement, in the reference node order
    [bg | way0 | way1 | ...].  Shared by the episode core and the
    whole-scene serving path.

    FPS perf notes (v5e traces, round 3): the 100-iteration loop costs
    ~10 us/iteration, half in the (P, 192) distance update (VPU-bound —
    the feature matrix stays VMEM-resident, so a bf16 copy does NOT help;
    measured identical) and half in the argmax/dynamic-slice latency
    (merging ways+bg into one padded vmapped loop also measured SLOWER —
    the pad rows triple the VPU work).  Both rewrites were reverted.

    Returns (protos ((w+1)*P, d), pvalid ((w+1)*P,), proto_labels
    ((w+1)*P, n_classes), fg_assign (w, k*N) prototype assignments for
    diagnostics)."""
    c = cfg
    n_way, k_shot, n, d = support_feat.shape
    np_ = c.n_subprototypes
    flat = support_feat.reshape(n_way, k_shot * n, d)
    fg_flat = fg_used.reshape(n_way, k_shot * n)
    fg_mp = jax.vmap(lambda f, m: multi_prototypes(
        f, m, np_, impl=c.fps_impl))(flat, fg_flat)
    fg_assign = fg_mp.assignments                      # (n_way, k_shot*n)

    bg_feat_all = support_feat.reshape(n_way * k_shot * n, d)
    bg_mask_all = (~fg).reshape(-1)                    # raw complement (mpti.py:486)
    bg_mp = multi_prototypes(bg_feat_all, bg_mask_all, np_, impl=c.fps_impl)

    # node order: [bg | way0 | way1 | ... | queries] (mpti.py:493-508)
    protos = jnp.concatenate(
        [bg_mp.prototypes[None], fg_mp.prototypes], axis=0
    ).reshape((n_way + 1) * np_, d)
    pvalid = jnp.concatenate(
        [bg_mp.proto_valid[None], fg_mp.proto_valid], axis=0
    ).reshape((n_way + 1) * np_)

    cls_of_block = jnp.arange(n_way + 1)               # bg=0, way i -> i+1
    block_labels = jax.nn.one_hot(cls_of_block, c.n_classes)  # (w+1, cls)
    proto_labels = jnp.repeat(block_labels, np_, axis=0) * pvalid[:, None]
    return protos, pvalid, proto_labels, fg_assign


# ----------------------------------------------------------------------
def _mpti_core(
    support_feat: Array,   # (n_way, k_shot, N, d)
    query_feat: Array,     # (n_q*n_way, N, d)
    ep: Episode,
    cfg: R3DConfig,
    *,
    train: bool,
    eval_mdns: bool,
):
    """One episode: MDNS -> prototypes -> affinity -> LP -> CE.
    Pure function of arrays; vmapped over the episode batch."""
    c = cfg
    n_way, k_shot, n, d = support_feat.shape
    np_ = c.n_subprototypes
    fg = ep.support_y > 0                              # (w, k, N)

    aux: Dict[str, Array] = {}

    # ---- MDNS clean-shot detection (eval only, mpti.py:440-442) ----
    if eval_mdns and not train:
        keep, clean_flag = mdns_keep_mask(
            support_feat, fg, ep.support_x[..., :3], c.mdns_scales)
        fg_used = fg & (keep[..., None] > 0.5)
        if ep.gt_support_y is not None:
            gt_flag = (jnp.sum(ep.gt_support_y, -1) > 0).astype(jnp.float32)
            aux["mdns_shot_clean_ratio"] = jnp.sum(clean_flag * gt_flag) / jnp.maximum(
                jnp.sum(clean_flag), 1.0)
            # point-level MDNS quality (mpti.py:444-453 / protonet.py:214-242)
            from r3dfsseg_tpu.utils.diagnostics import (
                clean_detection_precision_recall, support_mask_accuracy)
            sm = support_mask_accuracy(fg_used, fg, ep.gt_support_y > 0)
            aux["mdns_point_clean_ratio"] = sm["clean_ratio"]
            aux["mdns_size_ratio"] = sm["size_ratio"]
            p, r = clean_detection_precision_recall(gt_flag, clean_flag)
            aux["mdns_precision"] = p
            aux["mdns_recall"] = r
    else:
        fg_used = fg

    protos, pvalid, proto_labels, fg_assign = episode_graph_nodes(
        support_feat, fg_used, fg, c)

    qflat = query_feat.reshape(-1, d)
    node_feat = jnp.concatenate([protos, qflat], axis=0)
    node_valid = jnp.concatenate(
        [pvalid, jnp.ones(qflat.shape[0], bool)], axis=0)
    y0 = jnp.concatenate(
        [proto_labels, jnp.zeros((qflat.shape[0], c.n_classes), jnp.float32)],
        axis=0)

    # ---- affinity + label propagation (mpti.py:511-512,717-776) ----
    # bf16 mode extends the relaxed-precision contract to the graph's
    # bandwidth-bound passes: neighbour selection compares bf16 distances
    # and the CG matvec reads a bf16 copy of S (accuracy A/B in BASELINE.md).
    # graph_dtype can pin the graph to f32 independently of the encoder.
    gd = c.compute_dtype if c.graph_dtype == "auto" else c.graph_dtype
    lowp = jnp.bfloat16 if gd == "bfloat16" else None
    a = local_constrained_affinity(node_feat, c.k_connect, c.sigma,
                                   valid=node_valid, impl=c.affinity_impl,
                                   compare_dtype=lowp)
    z = label_propagate(a, y0, c.lp_alpha, solver=c.lp_solver,
                        cg_iters=c.lp_cg_iters, matvec_dtype=lowp,
                        adjoint_iters=(c.lp_adjoint_iters or None)
                        if train else None)

    n_protos = (n_way + 1) * np_
    query_logits = z[n_protos:].reshape(
        c.n_queries * n_way, n, c.n_classes)           # (q, N, cls)

    # ---- cross-entropy (mpti.py:571,778-781) ----
    logp = jax.nn.log_softmax(query_logits, axis=-1)
    lp_loss = -jnp.mean(
        jnp.take_along_axis(logp, ep.query_y[..., None], axis=-1))

    # ---- train-time diagnostics (mpti.py:514-568) ----
    pred = jnp.argmax(query_logits, axis=-1)
    aux["accuracy"] = jnp.mean((pred == ep.query_y).astype(jnp.float32))
    if train and ep.gt_query_y is not None:
        aux["query_acc_LP"] = jnp.mean((pred == ep.gt_query_y).astype(jnp.float32))
        aux["query_acc_original"] = jnp.mean(
            (ep.query_y == ep.gt_query_y).astype(jnp.float32))
    if train and ep.gt_support_y is not None:
        # clean ratio after LP: per way, diffuse prototype predictions back
        # to their assigned fg points and compare with the clean gt mask.
        proto_block = z[:n_protos].reshape(n_way + 1, np_, c.n_classes)
        proto_pred = jnp.argmax(proto_block[1:], axis=-1)       # (w, NP)
        way_ids = jnp.arange(n_way)[:, None]
        proto_is_cls = (proto_pred == way_ids + 1)              # (w, NP)
        # table lookup as a one-hot contraction: the 80k-row gather from a
        # 100-wide table lowers to a ~200 us scalar-core gather on TPU,
        # while the one-hot einsum runs on the MXU in ~10 us (exact: 0/1
        # factors).  Diagnostics-only path, but it runs every train step.
        oh = jax.nn.one_hot(fg_assign, np_, dtype=jnp.float32)  # (w, kN, NP)
        point_pred = jnp.einsum(
            "wmp,wp->wm", oh, proto_is_cls.astype(jnp.float32)) > 0.5
        gt_flat = (ep.gt_support_y.reshape(n_way, -1) > 0)
        fgf = fg_used.reshape(n_way, -1).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(fgf, -1), 1.0)
        aux["clean_ratio_LP"] = jnp.mean(
            jnp.sum((point_pred == gt_flat).astype(jnp.float32) * fgf, -1) / denom)
        aux["clean_ratio_original"] = jnp.mean(
            jnp.sum(gt_flat.astype(jnp.float32) * fgf, -1) / denom)

    return query_logits, lp_loss, aux
