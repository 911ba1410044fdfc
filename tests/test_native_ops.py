"""Native C episode-assembly kernel vs the numpy path: identical episodes
from identical seeds (the RNG draws live in Python and are shared)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r3dfsseg_tpu import native  # noqa: E402
from r3dfsseg_tpu.data.sampler import sample_scan  # noqa: E402

pytestmark = pytest.mark.skipif(native.assemble_scan is None,
                                reason="native kernel unavailable (no cc?)")


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    from r3dfsseg_tpu.data.synthetic import make_synthetic_dataset
    root = str(tmp_path_factory.mktemp("native") / "blocks")
    return make_synthetic_dataset(root, n_scans=20, pts_per_scan=1024, seed=3)


def _scan_name(ds):
    return sorted(os.listdir(os.path.join(ds, "data")))[0][:-4]


@pytest.mark.parametrize("support", [True, False])
@pytest.mark.parametrize("augm", [False, True])
def test_sample_scan_native_matches_numpy(ds, support, augm, monkeypatch):
    name = _scan_name(ds)
    import r3dfsseg_tpu.data.sampler as sampler_mod
    data = sampler_mod.load_scan(ds, name)
    cls = int(data[:, 6][data[:, 6] >= 0][0])
    kw = dict(sampled_classes=[cls, (cls + 1) % 13], sampled_class=cls,
              support=support, pc_augm=augm,
              pc_augm_config={"scale": 1.3, "rot": 1, "mirror_prob": 0.4,
                              "jitter": 1})

    got = sample_scan(ds, name, 256, "xyzrgbXYZ",
                      rng=np.random.default_rng(42), **kw)
    monkeypatch.setattr(native, "assemble_scan", None)
    want = sample_scan(ds, name, 256, "xyzrgbXYZ",
                       rng=np.random.default_rng(42), **kw)

    np.testing.assert_allclose(got[0], want[0], atol=2e-6, rtol=0)
    for g, w in zip(got[1:], want[1:]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_attrib_subset(ds, monkeypatch):
    name = _scan_name(ds)
    import r3dfsseg_tpu.data.sampler as sampler_mod
    data = sampler_mod.load_scan(ds, name)
    cls = int(data[:, 6][data[:, 6] >= 0][0])
    for attribs in ("xyz", "xyzrgb", "xyzXYZ"):
        got = sample_scan(ds, name, 128, attribs, sampled_classes=[cls],
                          sampled_class=cls, support=True,
                          rng=np.random.default_rng(7))
        monkeypatch.setattr(native, "assemble_scan", None)
        want = sample_scan(ds, name, 128, attribs, sampled_classes=[cls],
                           sampled_class=cls, support=True,
                           rng=np.random.default_rng(7))
        monkeypatch.undo()
        assert got[0].shape == (128, len(attribs))
        np.testing.assert_allclose(got[0], want[0], atol=2e-6, rtol=0)


def test_full_episode_stream_identical(ds, monkeypatch):
    """A seeded NoisyEpisodeSampler produces the same episodes through the
    native and numpy paths."""
    from r3dfsseg_tpu.data import NoisyEpisodeSampler

    def episodes(n):
        s = NoisyEpisodeSampler(
            ds, "s3dis", cvfold=0, n_way=2, k_shot=2, n_queries=1,
            mode="train", num_point=128, pc_attribs="xyzrgbXYZ",
            pc_augm=True,
            pc_augm_config={"scale": 1.2, "rot": 1, "mirror_prob": 0.3,
                            "jitter": 1},
            noise_ratio=[0.0, 0.5], noise_type="train", seed=11)
        return [s.sample() for _ in range(n)]

    got = episodes(3)
    monkeypatch.setattr(native, "assemble_scan", None)
    want = episodes(3)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g.support_x, w.support_x, atol=2e-6)
        np.testing.assert_array_equal(g.support_y, w.support_y)
        np.testing.assert_allclose(g.query_x, w.query_x, atol=2e-6)
        np.testing.assert_array_equal(g.query_y, w.query_y)
