"""MPTI episode-core tests: the fixed-shape masked implementation must
reproduce a ragged numpy transliteration of the reference pipeline
(mpti.py:414-577) given the same features."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from r3dfsseg_tpu.config import tiny_config
from r3dfsseg_tpu.models.episode import Episode
from r3dfsseg_tpu.models.mpti import (
    _contrast_prototypes,
    _mpti_core,
    mdns_keep_mask,
    way_contrast_loss,
)

W, K, N, D = 2, 2, 32, 8
NP_ = 6
KC = 8
SIGMA = 1.0
ALPHA = 0.99


# ------------------------------------------------------------ oracle ----
def _fps_ragged(feat, k):
    """torch_cluster.fps(random_start=False) + unique: greedy from point 0."""
    n = feat.shape[0]
    if n <= k:
        return np.arange(n)
    chosen = [0]
    mind = ((feat - feat[0]) ** 2).sum(-1)
    for _ in range(k - 1):
        nxt = int(np.argmax(mind))
        chosen.append(nxt)
        mind = np.minimum(mind, ((feat - feat[nxt]) ** 2).sum(-1))
    return np.asarray(chosen)


def _multi_proto_ragged(feat, k):
    """getMutiplePrototypes (mpti.py:597-634)."""
    n = feat.shape[0]
    if n <= k:
        return feat.copy(), np.arange(n)
    idx = _fps_ragged(feat, k)
    seeds = feat[idx]
    d = ((feat[:, None] - seeds[None]) ** 2).sum(-1)
    assign = np.argmin(d, axis=1)
    protos = np.stack([feat[assign == i].mean(0) for i in range(len(idx))])
    return protos, assign


def _affinity_ragged(x, k, sigma):
    n = x.shape[0]
    d2 = ((x[:, None] - x[None]) ** 2).sum(-1)
    d2s = d2.copy()
    np.fill_diagonal(d2s, np.inf)
    idx = np.argsort(d2s, axis=1, kind="stable")[:, :k]
    a = np.zeros((n, n))
    for i in range(n):
        a[i, idx[i]] = np.exp(-0.5 * d2[i, idx[i]] / sigma**2)
    a = a + a.T
    np.fill_diagonal(a, 0)
    return a


def _lp_ragged(a, y, alpha=ALPHA):
    eps = np.finfo(float).eps
    d = a.sum(1)
    dsi = np.sqrt(1.0 / (d + eps))
    s = a * dsi[:, None] * dsi[None]
    return np.linalg.inv(np.eye(len(a)) - alpha * s + eps) @ y


def _oracle_forward(sf, qf, sy, qy):
    """Ragged reference pipeline on precomputed features."""
    protos, labels = [], []
    # background first (mpti.py:489-493)
    bg_feat = sf.reshape(-1, D)[(sy.reshape(-1) == 0)]
    bgp, _ = _multi_proto_ragged(bg_feat, NP_)
    protos.append(bgp)
    labels.append(np.tile(np.eye(W + 1)[0], (len(bgp), 1)))
    for w in range(W):
        f = sf[w].reshape(-1, D)[sy[w].reshape(-1) == 1]
        p, _ = _multi_proto_ragged(f, NP_)
        protos.append(p)
        labels.append(np.tile(np.eye(W + 1)[w + 1], (len(p), 1)))
    protos = np.concatenate(protos)
    labels = np.concatenate(labels)
    qflat = qf.reshape(-1, D)
    node = np.concatenate([protos, qflat])
    y = np.concatenate([labels, np.zeros((len(qflat), W + 1))])
    a = _affinity_ragged(node.astype(np.float64), KC, SIGMA)
    z = _lp_ragged(a, y)
    qlog = z[len(protos):].reshape(qf.shape[0], N, W + 1)
    # CE (torch F.cross_entropy mean)
    sm = np.exp(qlog - qlog.max(-1, keepdims=True))
    sm = sm / sm.sum(-1, keepdims=True)
    ce = -np.log(np.take_along_axis(sm, qy[..., None], -1)).mean()
    return qlog, ce


def _make_episode(rng, fg_counts):
    """Synthetic features + masks; fg_counts[w][k] fg points per shot."""
    sf = rng.normal(size=(W, K, N, D)).astype(np.float32)
    qf = rng.normal(size=(1 * W, N, D)).astype(np.float32)
    sy = np.zeros((W, K, N), np.int32)
    for w in range(W):
        for k in range(K):
            pick = rng.choice(N, fg_counts[w][k], replace=False)
            sy[w, k, pick] = 1
    qy = rng.integers(0, W + 1, size=(W, N)).astype(np.int32)
    return sf, qf, sy, qy


@pytest.mark.slow
def test_mpti_core_matches_ragged_oracle(rng):
    cfg = tiny_config(
        n_way=W, k_shot=K, pc_npts=N, n_subprototypes=NP_, k_connect=KC,
        sigma=SIGMA, lp_solver="solve")
    # mix: shots with fewer fg than NP_ (identity branch) and many more
    sf, qf, sy, qy = _make_episode(rng, [[4, 20], [15, 3]])
    want_logits, want_ce = _oracle_forward(
        sf.astype(np.float64), qf.astype(np.float64), sy, qy)

    ep = Episode(
        support_x=jnp.zeros((W, K, N, 9)), support_y=jnp.asarray(sy),
        query_x=jnp.zeros((W, N, 9)), query_y=jnp.asarray(qy))
    logits, ce, aux = _mpti_core(
        jnp.asarray(sf), jnp.asarray(qf), ep, cfg, train=False, eval_mdns=False)
    np.testing.assert_allclose(np.asarray(logits), want_logits, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(ce), want_ce, rtol=1e-3, atol=1e-3)


def test_mpti_core_cg_close_to_solve(rng):
    sf, qf, sy, qy = _make_episode(rng, [[10, 20], [15, 8]])
    ep = Episode(
        support_x=jnp.zeros((W, K, N, 9)), support_y=jnp.asarray(sy),
        query_x=jnp.zeros((W, N, 9)), query_y=jnp.asarray(qy))
    outs = {}
    for solver in ["solve", "cg"]:
        cfg = tiny_config(n_way=W, k_shot=K, pc_npts=N, n_subprototypes=NP_,
                          k_connect=KC, lp_solver=solver, lp_cg_iters=100)
        logits, ce, _ = _mpti_core(jnp.asarray(sf), jnp.asarray(qf), ep, cfg,
                                   train=False, eval_mdns=False)
        outs[solver] = np.asarray(logits)
    np.testing.assert_allclose(outs["cg"], outs["solve"], rtol=1e-2, atol=1e-3)


# ------------------------------------------------------------- MDNS ----
def _mdns_oracle(sf, sy, sx, scales):
    """Transliteration of Mean_pl_support_y(_multi_scale) (mpti.py:87-223),
    returning per-shot keep flags."""
    total = []
    for (nx, ny, nz) in scales:
        flag = np.zeros((W, K))
        for w in range(W):
            seeds, lens = [], []
            for k in range(K):
                m = sy[w, k] == 1
                pts, ft = sx[w, k][m][:, :3], sf[w, k][m]
                lo, hi = pts.min(0), pts.max(0)
                d = (hi - lo) / np.asarray([nx, ny, nz], np.float32)
                cnt = 0
                for ix in range(nx):
                    for iy in range(ny):
                        for iz in range(nz):
                            st = lo + d * np.asarray([ix, iy, iz], np.float32)
                            mm = np.ones(len(pts), bool)
                            for ax in range(3):
                                mm &= (pts[:, ax] >= st[ax]) & (pts[:, ax] <= st[ax] + d[ax])
                            if mm.sum() > 0:
                                seeds.append(ft[mm].mean(0)); cnt += 1
                lens.append(cnt)
            s = np.stack(seeds)
            s = s / np.linalg.norm(s, axis=1, keepdims=True)
            cos = s @ s.T * (1 - np.eye(len(s)))
            if nx == ny == nz == 1:
                cos = cos ** 3
            deg = cos.sum(1)
            mask = deg > deg.mean()
            c0 = 0
            for k in range(K):
                cur = mask[c0:c0 + lens[k]]
                flag[w, k] = 1.0 if cur.mean() > 0.5 else 0.0
                c0 += lens[k]
        total.append(flag)
    avg = np.mean(total, 0)
    keep = (avg >= 0.5).astype(np.float32)
    for w in range(W):
        n_fg = sy[w].sum(-1)
        if (keep[w] * n_fg).sum() == 0:
            keep[w] = 1.0
    return keep


@pytest.mark.slow
def test_mdns_matches_oracle(rng):
    scales = ((1, 1, 1), (2, 2, 1))
    sf = rng.normal(size=(W, K, N, D)).astype(np.float32)
    sx = rng.uniform(size=(W, K, N, 9)).astype(np.float32)
    sy = np.zeros((W, K, N), np.int32)
    for w in range(W):
        for k in range(K):
            pick = rng.choice(N, 10, replace=False)
            sy[w, k, pick] = 1
    # make way 0 shot 1 an outlier so flags aren't all-ones
    sf[0, 1][sy[0, 1] == 1] += 10.0
    want = _mdns_oracle(sf, sy, sx, scales)
    keep, _ = mdns_keep_mask(jnp.asarray(sf), jnp.asarray(sy) > 0,
                             jnp.asarray(sx[..., :3]), scales)
    np.testing.assert_array_equal(np.asarray(keep), want)


# --------------------------------------------------------- contrast ----
def _contrast_oracle(sf, sy, flag, fps_k, temp, proj_w, proj_b):
    """Transliteration of per_way_contrast_loss (mpti.py:226-313)."""
    clean = flag[0, 0] * K == flag[0].sum()
    losses = []
    for w in range(W):
        feats, labs = [], []
        for k in range(K):
            f = sf[w, k][sy[w, k] == 1]
            p, _ = _multi_proto_ragged(f, fps_k)
            z = p @ proj_w + proj_b
            z = z / np.linalg.norm(z, axis=1, keepdims=True)
            feats.append(z)
            labs.append(np.full(len(p), flag[w, k], np.float64))
        if clean:
            other = (w + 1) % W
            for k in range(2):
                f = sf[other, k][sy[other, k] == 1]
                p, _ = _multi_proto_ragged(f, fps_k)
                z = p @ proj_w + proj_b
                z = z / np.linalg.norm(z, axis=1, keepdims=True)
                feats.append(z)
                labs.append(np.full(len(p), -1.0))
        z = np.concatenate(feats)
        lab = np.concatenate(labs)
        n = len(z)
        lm = 1 - np.eye(n)
        gt = (lab[:, None] == lab[None]) * lm
        logits = z @ z.T / temp
        exp = np.exp(logits) * lm
        logp = logits - np.log(exp.sum(1, keepdims=True))
        mlpp = (gt * logp).sum(1) / gt.sum(1)
        losses.append(-mlpp.mean())
    return np.mean(losses)


@pytest.mark.slow
def test_way_contrast_matches_oracle(rng):
    fps_k, temp, p = 2, 0.1, 8
    proj_w = rng.normal(size=(D, p)).astype(np.float32) * 0.3
    proj_b = rng.normal(size=(p,)).astype(np.float32) * 0.1
    for flags in [np.asarray([[3., 3.], [5., 5.]]),      # clean episode
                  np.asarray([[3., 7.], [5., 5.]])]:     # noisy episode
        sf = rng.normal(size=(W, K, N, D)).astype(np.float32)
        sy = np.zeros((W, K, N), np.int32)
        for w in range(W):
            for k in range(K):
                sy[w, k, rng.choice(N, 6, replace=False)] = 1
        want = _contrast_oracle(sf.astype(np.float64), sy, flags, fps_k,
                                temp, proj_w.astype(np.float64),
                                proj_b.astype(np.float64))
        protos, pvalid, labels, svalid = _contrast_prototypes(
            jnp.asarray(sf), jnp.asarray(sy), jnp.asarray(flags), fps_k)
        z = jnp.einsum("...d,dp->...p", protos, proj_w) + proj_b
        z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
        # zero-out invalid prototype rows the way the model's masking does
        got = way_contrast_loss(z, pvalid, labels, svalid, temp)
        np.testing.assert_allclose(float(got), want, rtol=1e-3, atol=1e-4)
