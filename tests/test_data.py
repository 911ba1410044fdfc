"""Data pipeline tests on a synthetic on-disk dataset."""
import os

import numpy as np
import pytest

from r3dfsseg_tpu.data import (
    EpisodeLoader,
    EpisodeSampler,
    NoisyEpisodeSampler,
    StaticTestDataset,
    get_catalog,
    read_episode_h5,
    write_episode_h5,
)
from r3dfsseg_tpu.data.sampler import augment_pointcloud, sample_scan
from r3dfsseg_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth") / "blocks")
    return make_synthetic_dataset(root, n_scans=40, pts_per_scan=1024, seed=3)


def test_catalog_splits_and_class2scans(ds):
    cat = get_catalog("s3dis", 0, ds)
    assert len(cat.test_classes) == 6
    assert len(cat.train_classes) == 6
    assert set(cat.test_classes).isdisjoint(cat.train_classes)
    # every class should appear in several scans (synthetic rotates classes)
    for c in cat.train_classes:
        assert len(cat.class2scans[c]) >= 6
    # pickle cache created + reused
    assert os.path.exists(os.path.join(ds, "class2scans.pkl"))
    cat2 = get_catalog("s3dis", 1, ds)
    assert set(cat2.test_classes) == set(cat.train_classes)


def test_sample_scan_shapes_and_labels(ds):
    cat = get_catalog("s3dis", 0, ds)
    cls = cat.train_classes[0]
    scan = cat.class2scans[cls][0]
    rng = np.random.default_rng(0)
    pt, lb, gt, cl = sample_scan(
        ds, scan, 256, "xyzrgbXYZ", sampled_classes=[cls],
        sampled_class=cls, support=True, rng=rng)
    assert pt.shape == (256, 9) and lb.shape == (256,)
    assert lb.sum() > 0                       # stratified: fg survived
    assert pt[:, 3:6].max() <= 1.0            # rgb scaled
    assert pt[:, 6:9].min() >= 0 and pt[:, 6:9].max() <= 1.0  # XYZ normalised
    xyz = pt[:, :3]
    assert np.allclose(xyz.min(0), 0, atol=1e-5)  # min-shifted


def test_sample_scan_use_label_noise(ds, tmp_path):
    """Noisy-fold label columns (loader.py:174-181,222-229): with
    use_label_noise the sampler selects/labels from column 7+fold while the
    diagnostic gt label stays on the clean column 6."""
    root = str(tmp_path / "noisy")
    os.makedirs(os.path.join(root, "data"))
    rng = np.random.default_rng(3)
    n = 600
    scan = np.zeros((n, 10), np.float32)
    scan[:, :3] = rng.normal(size=(n, 3))
    scan[:, 3:6] = rng.integers(0, 256, size=(n, 3))
    scan[:, 6] = (np.arange(n) < n // 2).astype(np.float32) * 5  # clean: cls 5
    scan[:, 7] = (np.arange(n) >= n // 2).astype(np.float32) * 5  # fold0 flip
    scan[:, 8] = scan[:, 6]                                       # fold1 clean
    scan[:, 9] = np.arange(n) // 100                              # cluster
    np.save(os.path.join(root, "data", "scan0.npy"), scan)

    kw = dict(sampled_classes=[5], sampled_class=5, support=True)
    _, lb0, gt0, _ = sample_scan(root, "scan0", 256, "xyzrgbXYZ",
                                 use_label_noise=True, noise_in_fold=0,
                                 rng=np.random.default_rng(0), **kw)
    _, lb1, gt1, _ = sample_scan(root, "scan0", 256, "xyzrgbXYZ",
                                 use_label_noise=True, noise_in_fold=1,
                                 rng=np.random.default_rng(0), **kw)
    # fold0's labels disagree with the clean gt (columns are flipped) ...
    assert lb0.sum() > 0 and gt0.sum() > 0
    assert np.any(lb0 != gt0)
    # ... while fold1's column equals the clean one -> label == gt
    np.testing.assert_array_equal(lb1, gt1)
    with pytest.raises(ValueError):
        sample_scan(root, "scan0", 256, "xyzrgbXYZ",
                    use_label_noise=True, **kw)


def test_augmentation_properties(rng):
    P = rng.normal(size=(100, 9)).astype(np.float32)
    cfg = {"scale": 0, "rot": 1, "mirror_prob": 0, "jitter": 0}
    out = augment_pointcloud(P, cfg, np.random.default_rng(0))
    # pure z-rotation preserves z and xy-norms
    np.testing.assert_allclose(out[:, 2], P[:, 2], atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(out[:, :2], axis=1),
        np.linalg.norm(P[:, :2], axis=1), rtol=1e-4)
    # attributes beyond xyz untouched without jitter
    np.testing.assert_array_equal(out[:, 3:], P[:, 3:])


def test_clean_episode_sampler(ds):
    s = EpisodeSampler(ds, "s3dis", cvfold=0, n_way=2, k_shot=3, n_queries=1,
                       mode="train", num_point=128, seed=0)
    ep = s.sample()
    assert ep.support_x.shape == (2, 3, 128, 9)
    assert ep.query_y.shape == (2, 128)
    assert set(np.unique(ep.query_y)) <= {0, 1, 2}
    # clean: support_flag rows constant = sampled class
    for w in range(2):
        assert (ep.support_flag[w] == ep.sampled_classes[w]).all()
        # every shot has fg
        assert (ep.support_y[w].sum(-1) > 0).all()


@pytest.mark.parametrize("noise_type", ["sym", "ood"])
def test_noisy_episode_sampler_test_mode(ds, noise_type):
    s = NoisyEpisodeSampler(ds, "s3dis", cvfold=0, n_way=2, k_shot=5,
                            n_queries=1, mode="test", num_point=128,
                            noise_ratio=0.4, noise_type=noise_type, seed=1)
    ep = s.sample()
    n_noise = int(round(5 * 0.4))
    for w in range(2):
        cls = ep.sampled_classes[w]
        flags = ep.support_flag[w]
        n_wrong = int((flags != cls).sum())
        assert n_wrong == n_noise
        wrong = flags[flags != cls]
        if noise_type == "sym":
            assert set(wrong.tolist()) <= set(ep.sampled_classes.tolist())
        else:
            assert set(wrong.tolist()).isdisjoint(ep.sampled_classes.tolist())
        # noisy shots' gt masks zeroed (loader.py:797-801)
        for k in range(5):
            if flags[k] != cls:
                assert ep.gt_support_y[w, k].sum() == 0


def test_noisy_pair_type(ds):
    """'pair' noise (loader.py:734-735,744-745): every noisy shot comes
    from the way's fixed confusion partner; partners may map a class to
    itself (then the 'noisy' shot is a genuine extra clean shot whose gt
    is still zeroed, loader.py:798-801)."""
    cat = get_catalog("s3dis", 0, ds)
    t = list(cat.test_classes)
    pair = {t[0]: t[1], t[1]: t[0], t[2]: t[2], t[3]: t[3],
            t[4]: t[5], t[5]: t[4]}
    s = NoisyEpisodeSampler(ds, "s3dis", cvfold=0, n_way=2, k_shot=5,
                            n_queries=1, mode="test", num_point=128,
                            noise_ratio=0.4, noise_type="pair",
                            noise_pair=pair, seed=7)
    for _ in range(4):
        ep = s.sample()
        for w in range(2):
            cls = int(ep.sampled_classes[w])
            flags = ep.support_flag[w]
            wrong = flags[flags != cls]
            # every off-class shot is the partner
            assert all(int(x) == pair[cls] for x in wrong)
            if pair[cls] == cls:       # self-pair: flags all == cls
                assert (flags == cls).all()
    # missing dict is a clear error, not the reference's AttributeError
    with pytest.raises(ValueError, match="noise_pair"):
        NoisyEpisodeSampler(ds, "s3dis", cvfold=0, mode="test",
                            noise_ratio=0.4, noise_type="pair")


def test_cut_out_masks_largest_segment():
    """cut_out (loader.py:1191-1238): the largest fg segment is zeroed in
    both attributes and mask, but only when the cloud has >1 fg segment."""
    from r3dfsseg_tpu.data import cut_out
    pcd = np.ones((2, 8, 3), np.float32)
    label = np.array([[1, 1, 1, 0, 0, 0, 1, 0],
                      [1, 1, 0, 0, 0, 0, 0, 0]])
    cluster = np.array([[5, 5, 5, 2, 2, 2, 7, 2],
                        [3, 3, 3, 3, 4, 4, 4, 4]])
    out_x, out_y = cut_out(pcd, label, cluster)
    # cloud 0: fg segments {5: 3 pts, 7: 1 pt} -> segment 5 removed entirely
    assert out_y[0].tolist() == [0, 0, 0, 0, 0, 0, 1, 0]
    assert np.all(out_x[0, :3] == 0) and np.all(out_x[0, 3:] == 1)
    # cloud 1: single fg segment -> untouched
    assert np.array_equal(out_y[1], label[1])
    assert np.all(out_x[1] == 1)
    # inputs not mutated
    assert label[0, 0] == 1 and pcd[0, 0, 0] == 1


def test_sample_augmented_views(ds):
    """generate_one_episode_Augment (loader.py:892-1188): the episode keeps
    regular noisy semantics while every support shot + bg cloud yields a
    fresh 1024-pt view and a segment-cutout view."""
    n_way, k_shot, num_point = 2, 3, 128
    s = NoisyEpisodeSampler(ds, "s3dis", cvfold=0, n_way=n_way,
                            k_shot=k_shot, n_queries=1, mode="test",
                            num_point=num_point, noise_ratio=1 / 3,
                            noise_type="ood", seed=4)
    ep, aux = s.sample_augmented(n_bg_cls=2, per_bg=2)
    n = n_way * k_shot + 2 * 2
    assert aux["pcd_1024"].shape == (n, 1024, 9)
    assert aux["label_1024"].shape == (n, 1024)
    assert aux["pcd_cutout"].shape == (n, num_point, 9)
    assert aux["label_cutout"].shape == (n, num_point)
    # every view has foreground pre-cutout (bg clouds are labeled vs their
    # own class)
    assert np.all(aux["label_1024"].sum(1) > 0)
    # synthetic scans hold 2 objects per class, so cuts fire: some cloud
    # has points fully zeroed by the cutout
    zeroed = np.all(aux["pcd_cutout"] == 0, axis=2)
    assert zeroed.any()
    # and zeroed points are never foreground
    assert not np.any(zeroed & (aux["label_cutout"] == 1))
    # the episode itself keeps the regular noisy-episode contract
    n_noise = int(round(k_shot * (1 / 3)))
    for w in range(n_way):
        cls = ep.sampled_classes[w]
        flags = ep.support_flag[w]
        assert int((flags != cls).sum()) == n_noise
        assert set(flags[flags != cls].tolist()).isdisjoint(
            ep.sampled_classes.tolist())
        for k in range(k_shot):
            if flags[k] != cls:
                assert ep.gt_support_y[w, k].sum() == 0


def test_noisy_train_mode_ratio_list(ds):
    s = NoisyEpisodeSampler(ds, "s3dis", cvfold=0, n_way=2, k_shot=5,
                            n_queries=1, mode="train", num_point=128,
                            noise_ratio=[0.0, 0.2, 0.4], seed=2)
    counts = set()
    for _ in range(10):
        ep = s.sample()
        wrong = int((ep.support_flag[0] != ep.sampled_classes[0]).sum())
        counts.add(wrong)
    assert counts <= {0, 1, 2}
    assert len(counts) > 1      # the per-episode draw actually varies


def test_h5_roundtrip(ds, tmp_path):
    s = EpisodeSampler(ds, "s3dis", cvfold=0, n_way=2, k_shot=2,
                       n_queries=1, mode="test", num_point=64, seed=0)
    ep = s.sample()
    p = str(tmp_path / "0.h5")
    write_episode_h5(p, ep)
    back = read_episode_h5(p)
    np.testing.assert_allclose(back.support_x, ep.support_x)
    np.testing.assert_array_equal(back.query_y, ep.query_y)
    np.testing.assert_array_equal(back.sampled_classes, ep.sampled_classes)


def test_static_test_dataset_materialise_and_reload(ds):
    kw = dict(cvfold=0, num_episode_per_comb=1, n_way=2, k_shot=2,
              n_queries=1, num_point=64, mode="valid", seed=0)
    d1 = StaticTestDataset(ds, "s3dis", **kw)
    # C(6,2)=15 combos x 1 episode
    assert len(d1) == 15
    d2 = StaticTestDataset(ds, "s3dis", **kw)  # second time: loaded from disk
    assert len(d2) == 15
    ep = d2[0]
    assert ep.support_x.shape == (2, 2, 64, 9)


def test_episode_loader_batches(ds):
    s = EpisodeSampler(ds, "s3dis", cvfold=0, n_way=2, k_shot=2,
                       n_queries=1, mode="train", num_point=64, seed=0)
    loader = EpisodeLoader(s.sample, num_batches=3, episode_batch=2,
                           n_workers=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0].support_x.shape == (2, 2, 2, 64, 9)


def test_h5_cache_interop_with_reference_writer(ds, tmp_path):
    """Write an episode cache file with the REFERENCE's own `write_episode`
    (loader.py:1687-1703) and read it through our reader — and the reverse
    — proving reference-materialised test sets load verbatim."""
    import sys
    import types

    import pytest

    # the reference loader imports open3d (unused) and transforms3d at
    # module scope; stub what's missing
    for mod in ("open3d", "transforms3d"):
        if mod not in sys.modules:
            try:
                __import__(mod)
            except ImportError:
                sys.modules[mod] = types.ModuleType(mod)
    sys.path.insert(0, "/root/reference")
    try:
        from dataloaders.loader import read_episode, write_episode
    except Exception as e:  # pragma: no cover - missing torch etc.
        pytest.skip(f"reference loader not importable: {e}")
    finally:
        sys.path.remove("/root/reference")

    from r3dfsseg_tpu.data.cache import read_episode_h5, write_episode_h5
    from r3dfsseg_tpu.data.episodes import NoisyEpisodeSampler

    s = NoisyEpisodeSampler(
        ds, "s3dis", cvfold=0, n_way=2, k_shot=2, n_queries=1,
        mode="test", num_point=128, pc_attribs="xyzrgbXYZ",
        noise_ratio=0.5, noise_type="sym", seed=5)
    ep = s.sample()

    # reference writes, we read
    p1 = str(tmp_path / "ref_written.h5")
    zeros_s = np.zeros_like(np.asarray(ep.support_y), dtype=np.int32)
    zeros_q = np.zeros_like(np.asarray(ep.query_y), dtype=np.int32)
    write_episode(p1, (np.asarray(ep.support_x), np.asarray(ep.support_y),
                       np.asarray(ep.query_x), np.asarray(ep.query_y),
                       np.asarray(ep.sampled_classes), zeros_s, zeros_q,
                       np.asarray(ep.gt_support_y)))
    back = read_episode_h5(p1)
    np.testing.assert_allclose(back.support_x, ep.support_x)
    np.testing.assert_array_equal(back.support_y, ep.support_y)
    np.testing.assert_array_equal(back.query_y, ep.query_y)
    np.testing.assert_array_equal(back.gt_support_y, ep.gt_support_y)
    np.testing.assert_array_equal(back.sampled_classes, ep.sampled_classes)

    # we write, reference reads
    p2 = str(tmp_path / "ours_written.h5")
    write_episode_h5(p2, ep)
    (sup, smask, q, qlab, cls, _, _, gts) = read_episode(p2)
    np.testing.assert_allclose(sup, np.asarray(ep.support_x))
    np.testing.assert_array_equal(smask, np.asarray(ep.support_y))
    np.testing.assert_array_equal(qlab, np.asarray(ep.query_y))
    np.testing.assert_array_equal(gts, np.asarray(ep.gt_support_y))
    np.testing.assert_array_equal(cls, np.asarray(ep.sampled_classes))
