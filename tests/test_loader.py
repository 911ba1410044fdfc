"""EpisodeLoader scheduling: determinism in ordered mode, exception
propagation from worker threads (round-1 ADVICE: a raising worker used to
hang the consumer forever)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r3dfsseg_tpu.data.loader import EpisodeLoader, prefetch_iter  # noqa: E402
from r3dfsseg_tpu.models.episode import Episode  # noqa: E402


def _mk_episode(val: float) -> Episode:
    z = np.full((2, 2, 8, 9), val, np.float32)
    return Episode(
        support_x=z, support_y=np.zeros((2, 2, 8), np.int32),
        query_x=z[:, 0], query_y=np.zeros((2, 8), np.int32))


def _counter_fn(seed: int):
    state = {"n": 0}

    def fn():
        state["n"] += 1
        return _mk_episode(seed * 1000 + state["n"])
    return fn


def _first_vals(loader):
    return [float(b.support_x.flat[0]) for b in loader]


def test_ordered_mode_is_deterministic():
    runs = []
    for _ in range(3):
        loader = EpisodeLoader(
            _counter_fn(1), num_batches=12, episode_batch=1,
            worker_fns=[_counter_fn(1), _counter_fn(2), _counter_fn(3)],
            ordered=True)
        runs.append(_first_vals(loader))
    assert runs[0] == runs[1] == runs[2]
    # batch i comes from worker i % n_workers: 1001, 2001, 3001, 1002, ...
    assert runs[0][:6] == [1001.0, 2001.0, 3001.0, 1002.0, 2002.0, 3002.0]


def test_unordered_mode_yields_all_batches():
    loader = EpisodeLoader(
        _counter_fn(1), num_batches=10, episode_batch=1,
        worker_fns=[_counter_fn(1), _counter_fn(2)], ordered=False)
    assert len(_first_vals(loader)) == 10


@pytest.mark.parametrize("ordered", [True, False])
def test_worker_exception_propagates(ordered):
    def bad():
        raise ValueError("sampler failed")

    loader = EpisodeLoader(bad, num_batches=4, episode_batch=1,
                           ordered=ordered)
    with pytest.raises(ValueError, match="sampler failed"):
        list(loader)


def test_worker_exception_mid_stream():
    state = {"n": 0}

    def flaky():
        state["n"] += 1
        if state["n"] >= 3:
            raise RuntimeError("boom at 3")
        return _mk_episode(state["n"])

    loader = EpisodeLoader(flaky, num_batches=6, episode_batch=1)
    got = []
    with pytest.raises(RuntimeError, match="boom at 3"):
        for b in loader:
            got.append(b)
    assert len(got) == 2


def test_prefetch_iter_order_and_errors():
    assert list(prefetch_iter(iter(range(100)), prefetch=3)) == list(range(100))

    def gen():
        yield 1
        raise KeyError("io error")

    it = prefetch_iter(gen(), prefetch=2)
    assert next(it) == 1
    with pytest.raises(KeyError):
        next(it)


def test_ordered_mode_backpressure():
    """A stalled worker must throttle the others: the pending window is
    bounded by prefetch + n_workers, not by num_batches."""
    import threading
    import time

    produced = []
    gate = threading.Event()

    def make_fn(w):
        state = {"n": 0}

        def fn():
            state["n"] += 1
            if w == 0 and state["n"] == 1:
                gate.wait(timeout=10)     # worker 0 stalls on its 1st batch
            produced.append((w, state["n"]))
            return _mk_episode(w * 1000 + state["n"])
        return fn

    loader = EpisodeLoader(make_fn(0), num_batches=40, episode_batch=1,
                           worker_fns=[make_fn(0), make_fn(1)],
                           prefetch=2, ordered=True)
    vals = []
    consumer = threading.Thread(
        target=lambda: vals.extend(
            float(b.support_x.flat[0]) for b in loader),
        daemon=True)
    consumer.start()        # blocks on batch 0 (worker 0 is gated)
    time.sleep(1.0)         # let worker 1 run as far as the window allows
    ahead = len([p for p in produced if p[0] == 1])
    # window = prefetch + n_workers = 4 -> worker 1 can produce at most a
    # handful of batches while batch 0 is stuck
    assert 0 < ahead <= 6, ahead
    gate.set()
    consumer.join(timeout=20)
    assert len(vals) == 40


def test_wire_format_roundtrip(rng):
    """compress_episode_wire -> widen_episode is lossless for int8 (labels)
    and ~2^-11 for f16 points.  (Cheap half — stays in the fast gate so a
    wire regression cannot pass it.)"""
    import jax

    from r3dfsseg_tpu.config import tiny_config
    from r3dfsseg_tpu.models.episode import (
        compress_episode_wire, widen_episode)
    from tests.test_models_smoke import _episode

    cfg = tiny_config()
    ep = _episode(cfg, rng)

    for wire, float_exact in (("int8", True), ("f16", False)):
        c = compress_episode_wire(ep, wire)
        assert c.support_y.dtype == np.int8
        assert c.query_y.dtype == np.int8
        w = jax.tree.map(np.asarray, widen_episode(
            jax.tree.map(jax.numpy.asarray, c)))
        np.testing.assert_array_equal(w.support_y, ep.support_y)
        np.testing.assert_array_equal(w.query_y, ep.query_y)
        np.testing.assert_array_equal(w.support_flag, ep.support_flag)
        if float_exact:
            np.testing.assert_array_equal(w.support_x, ep.support_x)
        else:
            np.testing.assert_allclose(w.support_x, ep.support_x,
                                       rtol=1e-3, atol=1e-3)
    assert compress_episode_wire(ep, "none") is ep


@pytest.mark.slow
def test_wire_format_step_equivalence(rng):
    """A jitted eval step on the compressed wire matches the uncompressed
    step (compile-heavy half)."""
    from r3dfsseg_tpu.config import tiny_config
    from r3dfsseg_tpu.learners import MPTILearner
    from r3dfsseg_tpu.models.episode import compress_episode_wire
    from tests.test_models_smoke import _episode

    cfg = tiny_config()
    ep = _episode(cfg, rng)
    learner = MPTILearner(cfg)
    learner.init(ep)
    pred_f32, loss_f32, _ = learner.test(ep)
    pred_i8, loss_i8, _ = learner.test(compress_episode_wire(ep, "int8"))
    np.testing.assert_array_equal(np.asarray(pred_i8), np.asarray(pred_f32))
    np.testing.assert_allclose(float(loss_i8), float(loss_f32), rtol=1e-6)


def test_group_equal_shape_and_stack():
    """Superbatch grouping: up to T consecutive equal-shaped batches per
    group; a shape change (ragged tail) flushes immediately and ships
    alone; stacking adds the transfer axis."""
    from r3dfsseg_tpu.data.loader import group_equal_shape, stack_superbatch

    def ep(n):
        return Episode(
            support_x=np.zeros((2, 2, n, 9), np.float32),
            support_y=np.zeros((2, 2, n), np.int32),
            query_x=np.zeros((2, n, 9), np.float32),
            query_y=np.zeros((2, n), np.int32))

    items = [ep(16)] * 5 + [ep(8)] + [ep(16)] * 2
    groups = list(group_equal_shape(iter(items), 3))
    assert [len(g) for g in groups] == [3, 2, 1, 2]
    assert groups[2][0].support_x.shape[2] == 8   # ragged one ships alone

    stacked = stack_superbatch(groups[0])
    assert stacked.support_x.shape == (3, 2, 2, 16, 9)
    assert stack_superbatch(groups[2]) is groups[2][0]  # singleton: no copy


def test_make_take_i_slices_on_device():
    import jax

    from r3dfsseg_tpu.data.loader import make_take_i, stack_superbatch

    eps = [Episode(
        support_x=np.full((1, 1, 4, 9), i, np.float32),
        support_y=np.full((1, 1, 4), i, np.int32),
        query_x=np.zeros((1, 4, 9), np.float32),
        query_y=np.zeros((1, 4), np.int32)) for i in range(4)]
    sup = jax.device_put(stack_superbatch(eps))
    take_i = make_take_i()
    for i in (0, 3):
        got = take_i(sup, i)
        assert float(got.support_x[0, 0, 0, 0]) == i
        assert got.support_x.shape == (1, 1, 4, 9)
