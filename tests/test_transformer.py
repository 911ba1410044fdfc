"""Transformer baseline (TraNFS-style) tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from r3dfsseg_tpu.config import tiny_config
from r3dfsseg_tpu.models.transformer import ProtoNetTransformer, gen_prototypes
from tests.test_models_smoke import _episode


def test_gen_prototypes_variants(rng):
    emb = rng.normal(size=(6, 8)).astype(np.float32)
    for method in ["mean", "median", "cosine", "euclidean", "abs", "cosine_2"]:
        out = np.asarray(gen_prototypes(jnp.asarray(emb), 2, 3, method))
        assert out.shape == (2, 8)
        assert np.isfinite(out).all()
    # mean variant == plain mean
    np.testing.assert_allclose(
        np.asarray(gen_prototypes(jnp.asarray(emb), 2, 3, "mean")),
        emb.reshape(2, 3, 8).mean(1), rtol=1e-6)
    # median of a clean cluster stays near the mean
    tight = np.tile(emb[:1], (6, 1))
    np.testing.assert_allclose(
        np.asarray(gen_prototypes(jnp.asarray(tight), 2, 3, "median")),
        tight.reshape(2, 3, 8).mean(1), atol=1e-3)


def test_transformer_model_train_and_eval(rng):
    cfg = tiny_config()
    model = ProtoNetTransformer(cfg, d_model=16, n_layers=1, n_head=2)
    ep = _episode(cfg, rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ep, train=False)
    out, _ = model.apply(variables, ep, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(float(out.loss))
    assert np.isfinite(float(out.binary_loss))
    assert np.isfinite(float(out.clean_proto_loss))
    assert out.query_logits.shape == (
        1, cfg.n_queries * cfg.n_way, cfg.pc_npts, cfg.n_classes)
    out2 = model.apply(variables, ep, train=False)
    assert np.isfinite(np.asarray(out2.query_logits)).all()


@pytest.mark.slow
def test_transformer_learner_step(rng):
    from r3dfsseg_tpu.learners import TransformerLearner
    cfg = tiny_config()
    learner = TransformerLearner(cfg, d_model=16, n_layers=1, n_head=2)
    ep = _episode(cfg, rng)
    learner.init(ep)
    m = learner.train(ep)
    assert np.isfinite(float(m["loss"]))
    pred, loss, acc = learner.test(ep)
    assert pred.shape == (1, cfg.n_queries * cfg.n_way, cfg.pc_npts)
