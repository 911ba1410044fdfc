"""Gradient-level golden parity vs the REAL reference backward.

`scripts/make_reference_fixture.py` runs the reference's training loss
`lp_loss + 0.1 * contrast_loss` (the exact combination
`/root/reference/models/mpti_learner.py:66` backprops) through
`MPTI_SelfAtten.forward(train=True)` + `loss.backward()` on CPU torch and
records every parameter gradient.  This test computes the same gradients
with `jax.grad` through `MPTINet` (converted weights, reference-faithful
numerics) and compares them leaf by leaf — the torch gradients are mapped
into the flax tree by running them through the SAME layout converter as
the weights (gradients transform identically to the parameters they
belong to).

Forward-value parity (test_reference_parity.py) cannot catch backward
drift in the episode-core gradient semantics — the LP
custom_linear_solve adjoint, WayContrast, the gather custom-VJP, the
detached-selection boundaries (FPS / kNN / MDNS), BN train-mode
statistics gradients; this does.  (It runs on the CPU parity paths; the
TPU Pallas kernels' VJPs are covered by their own dedicated tests:
attention dropout fwd/bwd consistency, fused-edge grads, scatter
backward.)
"""
import json
import os

import numpy as np
import pytest

import jax

from r3dfsseg_tpu.config import R3DConfig
from r3dfsseg_tpu.learners import MPTILearner
from r3dfsseg_tpu.models.episode import Episode
from r3dfsseg_tpu.utils.torch_convert import convert_mpti_model

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "reference_parity.npz")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="run scripts/make_reference_fixture.py")]


@pytest.fixture(scope="module")
def golden():
    data = np.load(FIXTURE)
    meta = json.loads(bytes(data["meta"]).decode())
    cfg = R3DConfig(
        n_way=meta["n_way"], k_shot=meta["k_shot"], n_queries=1,
        pc_npts=meta["pc_npts"], dgcnn_k=meta["dgcnn_k"],
        edgeconv_widths=tuple(tuple(w) for w in meta["edgeconv_widths"]),
        dgcnn_mlp_widths=tuple(meta["dgcnn_mlp_widths"]),
        base_widths=tuple(meta["base_widths"]), output_dim=meta["output_dim"],
        n_subprototypes=meta["n_subprototypes"], k_connect=meta["k_connect"],
        sigma=meta["sigma"], proj_dim=128, attn_dropout=0.0,
        lp_solver="solve", affinity_impl="topk", knn_impl="xla",
        fps_impl="xla", compute_dtype="float32", contrast_fps_k=4,
    )
    sd = {k[len("sd/"):]: data[k] for k in data.files if k.startswith("sd/")}
    params, stats = convert_mpti_model(
        sd, edgeconv_widths=cfg.edgeconv_widths,
        dgcnn_mlp_widths=cfg.dgcnn_mlp_widths, base_widths=cfg.base_widths,
        use_attention=True)
    learner = MPTILearner(cfg)
    episodes = {}
    for name in meta["fixtures"]:
        g = lambda f: data[f"{name}/ep/{f}"]  # noqa: E731
        episodes[name] = Episode(
            support_x=np.ascontiguousarray(g("support_x").transpose(0, 1, 3, 2)),
            support_y=g("support_y").astype(np.int32),
            query_x=np.ascontiguousarray(g("query_x").transpose(0, 2, 1)),
            query_y=g("query_y").astype(np.int32),
            gt_support_y=g("gt_support_y").astype(np.int32),
            gt_query_y=g("gt_query_y").astype(np.int32),
            support_flag=g("support_flag").astype(np.int32),
        )
    learner.init(episodes[meta["fixtures"][0]])
    learner.load_params(params, stats)
    return data, meta, cfg, learner, episodes


@pytest.mark.parametrize("solver", ["solve", "cheby150"])
@pytest.mark.parametrize("name", ["f0", "f1"])
def test_train_gradients_match_reference(golden, name, solver):
    """solver='cheby150' re-checks the full backward with the fast-parity
    LP solver (f32 Chebyshev-150 forward AND adjoint through
    custom_linear_solve) — the configuration bench.py's parity mode runs —
    against the reference's dense-inverse gradients, same tolerances."""
    data, meta, cfg, learner, eps = golden
    if solver == "cheby150":
        from r3dfsseg_tpu.learners import MPTILearner
        cfg = cfg.replace(lp_solver="cheby", lp_cg_iters=150,
                          lp_adjoint_iters=0)
        clearner = MPTILearner(cfg)
        clearner.init(eps[meta["fixtures"][0]])
        clearner.load_params(learner.state.params,
                             learner.state.batch_stats)
        learner = clearner

    def loss_fn(params):
        out, _ = learner.model.apply(
            {"params": params, "batch_stats": learner.state.batch_stats},
            eps[name], train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        return out.lp_loss + 0.1 * out.contrast_loss

    got = jax.grad(loss_fn)(learner.state.params)

    # Map the torch gradients through the SAME converter as the weights:
    # start from an all-zeros state dict (so any torch parameter without a
    # recorded gradient contributes an exact-zero leaf, which the jax grad
    # must reproduce) and overwrite with the recorded per-parameter grads.
    sd = {k[len("sd/"):]: data[k] for k in data.files if k.startswith("sd/")}
    gsd = {k: np.zeros_like(v) for k, v in sd.items()}
    prefix = f"{name}/train_grads/"
    n_found = 0
    for k in data.files:
        if k.startswith(prefix):
            gsd[k[len(prefix):]] = data[k]
            n_found += 1
    assert n_found >= 20, f"only {n_found} reference grads in fixture"
    want, _ = convert_mpti_model(
        gsd, edgeconv_widths=cfg.edgeconv_widths,
        dgcnn_mlp_widths=cfg.dgcnn_mlp_widths, base_widths=cfg.base_widths,
        use_attention=True)

    got_flat = jax.tree_util.tree_flatten_with_path(got)[0]
    want_flat = jax.tree_util.tree_flatten_with_path(want)[0]
    got_map = {jax.tree_util.keystr(p): np.asarray(v) for p, v in got_flat}
    want_map = {jax.tree_util.keystr(p): np.asarray(v) for p, v in want_flat}
    assert set(got_map) == set(want_map)

    # absolute floor: leaves whose true gradient is analytically ~0 (e.g.
    # a BN bias whose effect is renormalised away downstream) carry only
    # f32 rounding noise (~1e-7) in BOTH frameworks — meaningless to
    # compare relatively.  Floor at 1e-5 x the largest gradient anywhere.
    gmax = max(float(np.max(np.abs(v))) for v in want_map.values())
    for key in sorted(want_map):
        w, g = want_map[key], got_map[key]
        # per-leaf scale-aware tolerance: gradients span ~6 orders of
        # magnitude across layers; f32 reduction-order drift through the
        # LP solve / attention / BN-train backward is ~1e-3 relative
        scale = max(float(np.max(np.abs(w))), 1e-12)
        atol = max(5e-3 * scale, 1e-5 * gmax)
        np.testing.assert_allclose(
            g, w, rtol=5e-3, atol=atol,
            err_msg=f"gradient mismatch at {key} (ref grad scale {scale:.3g})")
