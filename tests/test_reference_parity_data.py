"""Golden parity for the DATA PIPELINE vs the REAL reference loader.

Drives `/root/reference/dataloaders/loader.py` (`NoiseInMetaTest`,
`MyDataset`, `MyTestDataset_NoiseInMetaTest`, `sample_pointcloud_universal`)
and `dataloaders/s3dis.py` (`S3DISDataset`) on seeded synthetic scans, and
asserts this repo's samplers reproduce the episode-generation SEMANTICS:

* class2scans construction — exact dict parity + pkl cache interop
  (s3dis.py:48-79);
* single-scan sampling — bit-level parity of attribute construction,
  stratified subsample and mask labeling under a scripted RNG that makes
  both implementations select identical point indices (loader.py:138-237);
* noisy episode generation — one CONTRACT function (scan provenance
  recovered from fingerprinted rgb channels) applied to reference episodes
  AND to ours: noise-shot counts, noise-class ranges (sym/ood/train),
  wrong-class mask labeling, gt zeroing, blacklist, per-way shuffle,
  the per-draw class-removal quirk, stratified-count invariants, bg pcds
  (loader.py:648-890);
* partial-noise object flips (loader.py:239-322);
* cache materialisation counts + dir naming: the reference's
  `MyTestDataset_NoiseInMetaTest` materialises, our `StaticTestDataset`
  consumes the same files (loader.py:1599-1659).

RNG streams differ between the implementations (reference: global
`np.random`; ours: `np.random.default_rng`), so episode-level checks are
semantic/statistical; scan-level attribute construction is exact.
"""
import contextlib
import io
import itertools
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# ---- shims the reference code needs in a modern environment -------------
if not hasattr(np, "int"):
    np.int = int  # removed in numpy>=1.24; loader.py uses it at runtime
for _mod in ("open3d", "transforms3d"):
    if _mod not in sys.modules:
        try:
            __import__(_mod)
        except ImportError:
            sys.modules[_mod] = types.ModuleType(_mod)
sys.path.insert(0, "/root/reference")
try:
    from dataloaders import loader as ref_loader
    from dataloaders.s3dis import S3DISDataset as RefS3DIS
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference loader not importable: {e}",
                allow_module_level=True)
finally:
    sys.path.remove("/root/reference")

from r3dfsseg_tpu.data.catalogs import S3DIS_CLASSNAMES, get_catalog  # noqa: E402
from r3dfsseg_tpu.data.episodes import (  # noqa: E402
    EpisodeSampler, NoisyEpisodeSampler)
from r3dfsseg_tpu.data.sampler import sample_scan  # noqa: E402

N_CLASSES, N_SCANS, PTS, P = 13, 60, 1024, 256


# ---- fingerprinted synthetic dataset ------------------------------------
# rgb channels carry provenance: rgb0 = scan id, rgb1 = row index, rgb2 = 0.
# The loaders only ever divide rgb by 255, so sid/row are exactly
# recoverable from any sampled cloud — every episode-generation decision
# becomes observable from the outputs alone.

def _make_fingerprinted(root, *, n_scans=N_SCANS, pts=PTS, seed=0,
                        classes_per_scan=4, objects_per_class=2):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    meta = os.path.join(os.path.dirname(root), "meta")
    os.makedirs(meta, exist_ok=True)
    with open(os.path.join(meta, "s3dis_classnames.txt"), "w") as f:
        f.write("\n".join(S3DIS_CLASSNAMES) + "\n")
    scans = {}
    for s in range(n_scans):
        cls_ids = [(s + 3 * j) % N_CLASSES for j in range(classes_per_scan)]
        n_obj = classes_per_scan * objects_per_class
        ppo = pts // n_obj
        rows = []
        for oi, c in enumerate(np.repeat(cls_ids, objects_per_class)):
            xyz = rng.uniform(0, 5, 3) + rng.normal(scale=0.3, size=(ppo, 3))
            lab = np.full((ppo, 1), c, np.float64)
            ins = np.full((ppo, 1), oi, np.float64)
            rows.append(np.concatenate(
                [xyz, np.zeros((ppo, 3)), lab, ins], axis=1))
        arr = np.concatenate(rows)
        rng.shuffle(arr, axis=0)
        arr[:, 3] = s                    # rgb0: scan id
        arr[:, 4] = np.arange(len(arr))  # rgb1: row index
        name = f"scan{s:03d}"
        np.save(os.path.join(root, "data", f"{name}.npy"), arr)
        scans[name] = arr
    return scans


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("parity_data") / "blocks")
    scans = _make_fingerprinted(root)
    scans_by_id = {int(a[0, 3]): a for a in scans.values()}
    return types.SimpleNamespace(root=root, scans=scans, by_id=scans_by_id)


def _rows_of(cloud):
    """(P, 9) sampled cloud -> (scan_id, raw row indices)."""
    rgb = np.asarray(cloud)[:, 3:6] * 255.0
    sid = int(round(float(rgb[0, 0])))
    assert np.all(np.abs(rgb[:, 0] - sid) < 0.01), "mixed scans in one cloud"
    return sid, np.rint(rgb[:, 1]).astype(int)


def _quiet(fn, *a, **k):
    with contextlib.redirect_stdout(io.StringIO()):
        return fn(*a, **k)


# ========================================================================
# class2scans: exact parity + pkl interop (s3dis.py:48-79)
# ========================================================================

def test_class2scans_exact_parity_and_pkl_interop(ds):
    ref = _quiet(RefS3DIS, 0, ds.root)          # writes class2scans.pkl
    pkl = os.path.join(ds.root, "class2scans.pkl")
    assert os.path.exists(pkl)

    # our catalog reads the reference-written pkl verbatim
    ours_cached = get_catalog("s3dis", 0, ds.root)
    assert {k: sorted(v) for k, v in ref.class2scans.items()} == \
           {int(k): sorted(v) for k, v in ours_cached.class2scans.items()}

    # and computes the identical dict from scratch
    os.remove(pkl)
    ours_fresh = get_catalog("s3dis", 0, ds.root)
    assert {k: sorted(v) for k, v in ref.class2scans.items()} == \
           {int(k): sorted(v) for k, v in ours_fresh.class2scans.items()}
    assert list(ref.test_classes) == list(ours_fresh.test_classes)
    assert list(ref.train_classes) == list(ours_fresh.train_classes)


# ========================================================================
# single-scan sampling: EXACT parity under a scripted RNG
# (loader.py:138-237 vs data/sampler.py sample_scan)
# ========================================================================

class _ScriptedRng:
    """Deterministic stand-in for both RNG APIs: choice() returns the
    first `size` candidates, so the reference (global np.random) and our
    sampler (np.random.Generator) select IDENTICAL point indices and the
    outputs must match bit-for-bit (modulo float32 rounding)."""

    def choice(self, a, size=None, replace=True, **kw):
        arr = np.arange(a) if np.isscalar(a) else np.asarray(a)
        if size is None:
            return arr[0]
        n = int(size)
        if n <= len(arr):
            return arr[:n].copy()
        assert replace, "scripted choice exhausted without replacement"
        reps = int(np.ceil(n / len(arr)))
        return np.tile(arr, reps)[:n].copy()

    def uniform(self, *a, **k):
        return 0.0

    def permutation(self, n):
        return np.arange(n)


@pytest.mark.parametrize("support", [True, False])
def test_single_scan_sampling_exact_parity(ds, support, monkeypatch):
    scan = "scan007"
    cls = int(ds.scans[scan][0, 6])  # a class present in the scan
    sampled_classes = [cls, (cls + 1) % N_CLASSES]

    monkeypatch.setattr(ref_loader.np.random, "choice", _ScriptedRng().choice)
    ref_pc, ref_lab, ref_gt, _ = _quiet(
        ref_loader.sample_pointcloud_universal,
        ds.root, P, "xyzrgbXYZ", False, None, scan,
        sampled_classes, cls, support=support)

    ours_pc, ours_lab, ours_gt, _ = sample_scan(
        ds.root, scan, P, "xyzrgbXYZ", sampled_classes=sampled_classes,
        sampled_class=cls, support=support, rng=_ScriptedRng())

    np.testing.assert_allclose(ours_pc, ref_pc, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ours_lab, np.int64),
                                  np.asarray(ref_lab, np.int64))
    np.testing.assert_array_equal(np.asarray(ours_gt, np.int64),
                                  np.asarray(ref_gt, np.int64))


def test_single_scan_stratified_count_rule(ds):
    """The stratified rule (loader.py:160-172): exactly
    int(class_ratio * P) picks come from the target class, the rest are
    uniform over the scan — verified on both implementations with live
    RNGs via the fingerprint."""
    scan = "scan007"
    raw = ds.scans[scan]
    cls = int(raw[0, 6])
    n_cls = int((raw[:, 6] == cls).sum())
    want_min = int(n_cls / raw.shape[0] * P)

    np.random.seed(11)
    for _ in range(10):
        pc, lab, _, _ = _quiet(
            ref_loader.sample_pointcloud_universal,
            ds.root, P, "xyzrgbXYZ", False, None, scan, [cls], cls,
            support=True)
        _, rows = _rows_of(pc)
        got = int((raw[rows, 6] == cls).sum())
        assert got >= want_min
        np.testing.assert_array_equal(
            np.asarray(lab, bool), raw[rows, 6] == cls)

    rng = np.random.default_rng(11)
    for _ in range(10):
        pc, lab, _, _ = sample_scan(
            ds.root, scan, P, "xyzrgbXYZ", sampled_classes=[cls],
            sampled_class=cls, support=True, rng=rng)
        _, rows = _rows_of(pc)
        got = int((raw[rows, 6] == cls).sum())
        assert got >= want_min
        np.testing.assert_array_equal(np.asarray(lab, bool),
                                      raw[rows, 6] == cls)


# ========================================================================
# the episode contract: every semantic property of generate_one_episode
# (loader.py:648-890), observable through the fingerprint
# ========================================================================

def _check_episode(ds, ep, *, sampled_classes, k_shot, n_queries,
                   noise_type, classes, expect_noise, class2scans,
                   partial=False):
    """Assert the episode obeys the reference's generation semantics.
    Returns stats for statistical aggregation across episodes."""
    sx, sy = np.asarray(ep["sx"]), np.asarray(ep["sy"])
    gsy = np.asarray(ep["gsy"])
    qx, qy, gqy = np.asarray(ep["qx"]), np.asarray(ep["qy"]), np.asarray(ep["gqy"])
    flags = np.asarray(ep["flag"])
    n_way = len(sampled_classes)
    assert sx.shape == (n_way, k_shot, P, 9)
    assert qx.shape == (n_way * n_queries, P, 9)

    sids = []
    noisy_positions, noisy_classes_per_way = [], []
    for w, cls in enumerate(sampled_classes):
        cls = int(cls)
        way_noisy = []
        for i in range(k_shot):
            sid, rows = _rows_of(sx[w, i])
            sids.append(sid)
            raw = ds.by_id[sid]
            flag = int(flags[w, i])
            scan_name = f"scan{sid:03d}"
            # the shot's scan was drawn from its flag class's scan list
            assert scan_name in class2scans[flag], (w, i, flag, scan_name)
            if partial:
                # partial noise keeps the way class (loader.py:736-737)
                assert flag == cls
                _check_partial_mask(raw, rows, sy[w, i], cls)
                if not np.array_equal(
                        np.asarray(sy[w, i], bool), raw[rows, 6] == cls):
                    way_noisy.append(i)
            else:
                # masks labeled as if the flag class (loader.py:770-780)
                np.testing.assert_array_equal(
                    np.asarray(sy[w, i], bool), raw[rows, 6] == flag)
            if flag != cls:
                way_noisy.append(i)
                # noisy shots' gt zeroed (loader.py:797-801)
                assert not np.asarray(gsy[w, i], bool).any()
            elif not partial:
                np.testing.assert_array_equal(gsy[w, i], sy[w, i])
                # stratified-count invariant (loader.py:160-172)
                n_cls = int((raw[:, 6] == cls).sum())
                assert int((raw[rows, 6] == cls).sum()) >= \
                    int(n_cls / raw.shape[0] * P)
            # attribute construction (loader.py:200-219)
            xyz = raw[rows, :3] - raw[rows, :3].min(0)
            np.testing.assert_allclose(sx[w, i, :, :3], xyz,
                                       rtol=1e-5, atol=1e-5)
            denom = np.maximum(xyz.max(0), 1e-30)
            np.testing.assert_allclose(sx[w, i, :, 6:9], xyz / denom,
                                       rtol=1e-4, atol=1e-5)
        if partial:
            # gt of the declared-noisy tail is zeroed after shuffle; the
            # count equals expect_noise
            n_zero = sum(1 for i in range(k_shot)
                         if not np.asarray(gsy[w, i], bool).any())
            assert n_zero >= expect_noise
        else:
            assert len(way_noisy) == expect_noise, \
                f"way {w}: {len(way_noisy)} noisy shots, want {expect_noise}"
            way_flags = [int(flags[w, i]) for i in way_noisy]
            for f in way_flags:
                if noise_type == "sym":
                    assert f in [int(c) for c in sampled_classes] and f != cls
                elif noise_type == "ood":
                    assert f in classes and f not in [
                        int(c) for c in sampled_classes]
                elif noise_type == "train":
                    assert f in classes and f != cls
            # per-draw class-removal quirk (loader.py:742,786-791): the
            # counter dict resets every draw, so a class is removed from
            # the range iff k_shot - num_noise - 1 == 1 — in that case a
            # way never repeats a noise class
            if (expect_noise > 0 and k_shot - expect_noise - 1 == 1
                    and noise_type in ("ood", "train")):
                assert len(set(way_flags)) == len(way_flags), \
                    f"removal quirk violated: repeated noise class {way_flags}"
            noisy_classes_per_way.append(way_flags)
        noisy_positions.extend(way_noisy)

        # queries: clean, labels = index into sampled_classes + 1
        # (loader.py:230-237)
        for qn in range(n_queries):
            qi = w * n_queries + qn
            sid, rows = _rows_of(qx[qi])
            sids.append(sid)
            raw = ds.by_id[sid]
            assert f"scan{sid:03d}" in class2scans[cls]
            want = np.zeros(P, np.int64)
            for j, c in enumerate(sampled_classes):
                want[raw[rows, 6] == int(c)] = j + 1
            np.testing.assert_array_equal(np.asarray(qy[qi], np.int64), want)
            np.testing.assert_array_equal(np.asarray(gqy[qi], np.int64), want)

    # bg pcds: classes outside the episode, masks of their own class
    # (loader.py:853-887)
    if ep.get("bg_x") is not None:
        bg_x, bg_y = np.asarray(ep["bg_x"]), np.asarray(ep["bg_y"])
        bg_classes = []
        for b in range(bg_x.shape[0]):
            sid, rows = _rows_of(bg_x[b])
            sids.append(sid)
            raw = ds.by_id[sid]
            cands = [c for c in classes
                     if np.array_equal(np.asarray(bg_y[b], bool),
                                       raw[rows, 6] == c)
                     and f"scan{sid:03d}" in class2scans[c]]
            assert cands, f"bg cloud {b} matches no class"
            assert all(c not in [int(x) for x in sampled_classes]
                       for c in cands)
            bg_classes.append(cands)
        # distinct bg classes (the reference removes each drawn class)
        flat = [c[0] for c in bg_classes]
        assert len(set(flat)) == len(flat)

    # episode-wide blacklist: every scan used at most once (loader.py:691-693,
    # 753-768, 871-874)
    assert len(sids) == len(set(sids)), "blacklist violated: scan reused"
    return {"noisy_positions": noisy_positions}


def _check_partial_mask(raw, rows, mask, cls):
    """Partial noise (loader.py:239-322): the mask is per-object constant
    and differs from the clean class mask only by whole-object flips."""
    mask = np.asarray(mask, bool)
    base = raw[rows, 6] == cls
    inst = raw[rows, -1]
    flipped_on, flipped_off = [], []
    for o in np.unique(inst):
        sel = inst == o
        assert mask[sel].min() == mask[sel].max(), \
            f"object {o} has a mixed mask (not object-level)"
        if mask[sel][0] and not base[sel][0]:
            flipped_on.append(o)
        if not mask[sel][0] and base[sel][0]:
            flipped_off.append(o)
    # at most one bg object flipped in, at most one fg object flipped out
    assert len(flipped_on) <= 1 and len(flipped_off) <= 1
    assert mask.sum() > 0


# ---- episode sources ----------------------------------------------------

def _ref_noisy_episode(ds_ref, sampled_classes):
    out = _quiet(ds_ref.generate_one_episode, np.asarray(sampled_classes))
    (sx, sy, qx, qy, _sc, _qc, gsy, gqy, bg_x, bg_y, flag) = out
    return dict(sx=sx, sy=sy, qx=qx, qy=qy, gsy=gsy, gqy=gqy, flag=flag,
                bg_x=bg_x, bg_y=bg_y)


def _our_noisy_episode(sampler, sampled_classes):
    ep = sampler.sample(n_way_classes=sampled_classes)
    return dict(sx=ep.support_x, sy=ep.support_y, qx=ep.query_x,
                qy=ep.query_y, gsy=ep.gt_support_y, gqy=ep.gt_query_y,
                flag=ep.support_flag, bg_x=None, bg_y=None)


CASES = [
    # (noise_type, mode, k_shot, noise_ratio, expect_noise)
    ("sym", "test", 5, 0.4, 2),
    ("ood", "test", 5, 0.4, 2),
    ("ood", "test", 4, 0.5, 2),   # k - noise - 1 == 1: removal quirk active
]


@pytest.mark.parametrize("noise_type,mode,k_shot,ratio,expect", CASES)
def test_reference_noisy_episodes_obey_contract(ds, noise_type, mode,
                                                k_shot, ratio, expect):
    """First pin the contract on the REFERENCE's own episodes — proving the
    contract encodes what loader.py actually does, not our reading of it."""
    np.random.seed(101)
    ref_ds = _quiet(ref_loader.NoiseInMetaTest, ds.root, "s3dis", cvfold=0,
                    n_way=2, k_shot=k_shot, n_queries=1, mode=mode,
                    num_point=P, pc_attribs="xyzrgbXYZ",
                    noise_ratio=ratio, noise_type=noise_type)
    classes = [int(c) for c in ref_ds.classes]
    positions = []
    for seed in range(8):
        np.random.seed(200 + seed)
        sampled = np.random.choice(classes, 2, replace=False)
        stats = _check_episode(
            ds, _ref_noisy_episode(ref_ds, sampled),
            sampled_classes=sampled, k_shot=k_shot, n_queries=1,
            noise_type=noise_type, classes=classes, expect_noise=expect,
            class2scans=ref_ds.class2scans)
        positions.extend(stats["noisy_positions"])
    # shot shuffle: noisy shots land across positions, not only the tail
    assert len(set(positions)) >= 3, f"no shuffle? positions={positions}"


@pytest.mark.parametrize("noise_type,mode,k_shot,ratio,expect", CASES)
def test_our_noisy_episodes_obey_contract(ds, noise_type, mode,
                                          k_shot, ratio, expect):
    """The SAME contract, applied to our sampler's episodes."""
    sampler = NoisyEpisodeSampler(
        ds.root, "s3dis", cvfold=0, n_way=2, k_shot=k_shot, n_queries=1,
        mode=mode, num_point=P, pc_attribs="xyzrgbXYZ",
        noise_ratio=ratio, noise_type=noise_type, seed=7)
    classes = [int(c) for c in sampler.classes]
    ref_classes = [int(c) for c in _quiet(
        ref_loader.NoiseInMetaTest, ds.root, "s3dis", cvfold=0, n_way=2,
        k_shot=k_shot, mode=mode, num_point=P, noise_ratio=ratio,
        noise_type=noise_type).classes]
    assert classes == ref_classes  # same candidate class pool

    positions = []
    rng = np.random.default_rng(0)
    for _ in range(8):
        sampled = rng.choice(classes, 2, replace=False)
        stats = _check_episode(
            ds, _our_noisy_episode(sampler, sampled),
            sampled_classes=sampled, k_shot=k_shot, n_queries=1,
            noise_type=noise_type, classes=classes, expect_noise=expect,
            class2scans={int(k): list(v)
                         for k, v in sampler.class2scans.items()})
        positions.extend(stats["noisy_positions"])
    assert len(set(positions)) >= 3, f"no shuffle? positions={positions}"


def test_train_noise_ratio_draw_parity(ds):
    """mode='train': the per-episode ratio draw from the list
    (loader.py:668-671) — both implementations produce every
    round(k * r) noise count, with 'train' range semantics."""
    ratios = [0, 0.2, 0.4]
    want_counts = {int(round(5 * r)) for r in ratios}

    np.random.seed(303)
    ref_ds = _quiet(ref_loader.NoiseInMetaTest, ds.root, "s3dis", cvfold=0,
                    n_way=2, k_shot=5, n_queries=1, mode="train",
                    num_point=P, pc_attribs="xyzrgbXYZ",
                    noise_ratio=ratios, noise_type="sym")
    classes = [int(c) for c in ref_ds.classes]

    def observe(episode_fn, class2scans, n=12, seed=404):
        seen = set()
        rng = np.random.default_rng(seed)
        for _ in range(n):
            sampled = rng.choice(classes, 2, replace=False)
            ep = episode_fn(sampled)
            flags = np.asarray(ep["flag"])
            per_way = [(flags[w] != int(sampled[w])).sum()
                       for w in range(2)]
            assert per_way[0] == per_way[1]  # one draw per episode
            n_noise = int(per_way[0])
            assert n_noise in want_counts
            seen.add(n_noise)
            _check_episode(ds, ep, sampled_classes=sampled, k_shot=5,
                           n_queries=1, noise_type="train", classes=classes,
                           expect_noise=n_noise, class2scans=class2scans)
        return seen

    ref_seen = observe(lambda c: _ref_noisy_episode(ref_ds, c),
                       ref_ds.class2scans)
    sampler = NoisyEpisodeSampler(
        ds.root, "s3dis", cvfold=0, n_way=2, k_shot=5, n_queries=1,
        mode="train", num_point=P, pc_attribs="xyzrgbXYZ",
        noise_ratio=ratios, seed=9)
    our_seen = observe(lambda c: _our_noisy_episode(sampler, c),
                       {int(k): list(v)
                        for k, v in sampler.class2scans.items()})
    assert ref_seen == want_counts == our_seen


def test_partial_noise_contract_both(ds):
    np.random.seed(77)
    ref_ds = _quiet(ref_loader.NoiseInMetaTest, ds.root, "s3dis", cvfold=0,
                    n_way=2, k_shot=5, n_queries=1, mode="test",
                    num_point=P, pc_attribs="xyzrgbXYZ",
                    noise_ratio=0.2, noise_type="partial")
    classes = [int(c) for c in ref_ds.classes]
    rng = np.random.default_rng(5)
    for _ in range(4):
        sampled = rng.choice(classes, 2, replace=False)
        _check_episode(ds, _ref_noisy_episode(ref_ds, sampled),
                       sampled_classes=sampled, k_shot=5, n_queries=1,
                       noise_type="partial", classes=classes,
                       expect_noise=1, class2scans=ref_ds.class2scans,
                       partial=True)

    sampler = NoisyEpisodeSampler(
        ds.root, "s3dis", cvfold=0, n_way=2, k_shot=5, n_queries=1,
        mode="test", num_point=P, pc_attribs="xyzrgbXYZ",
        noise_ratio=0.2, noise_type="partial", seed=13)
    for _ in range(4):
        sampled = rng.choice(classes, 2, replace=False)
        _check_episode(ds, _our_noisy_episode(sampler, sampled),
                       sampled_classes=sampled, k_shot=5, n_queries=1,
                       noise_type="partial", classes=classes,
                       expect_noise=1,
                       class2scans={int(k): list(v)
                                    for k, v in sampler.class2scans.items()},
                       partial=True)


def test_clean_episode_contract_both(ds):
    """MyDataset (loader.py:377-560) vs EpisodeSampler: the zero-noise
    contract (all shots clean, blacklist, stratified counts)."""
    np.random.seed(55)
    ref_ds = _quiet(ref_loader.MyDataset, ds.root, "s3dis", cvfold=0,
                    n_way=2, k_shot=5, n_queries=1, mode="train",
                    num_point=P, pc_attribs="xyzrgbXYZ", ReturnCluster=False)
    classes = [int(c) for c in ref_ds.classes]
    rng = np.random.default_rng(3)
    for _ in range(3):
        sampled = rng.choice(classes, 2, replace=False)
        out = _quiet(ref_ds.generate_one_episode, np.asarray(sampled))
        (sx, sy, qx, qy, _sc, _qc, gsy, gqy) = out
        ep = dict(sx=sx, sy=sy, qx=qx, qy=qy, gsy=gsy, gqy=gqy,
                  flag=np.tile(np.asarray(sampled)[:, None], (1, 5)),
                  bg_x=None, bg_y=None)
        _check_episode(ds, ep, sampled_classes=sampled, k_shot=5,
                       n_queries=1, noise_type="sym", classes=classes,
                       expect_noise=0, class2scans=ref_ds.class2scans)

    sampler = EpisodeSampler(ds.root, "s3dis", cvfold=0, n_way=2, k_shot=5,
                             n_queries=1, mode="train", num_point=P,
                             pc_attribs="xyzrgbXYZ", seed=21)
    for _ in range(3):
        sampled = rng.choice(classes, 2, replace=False)
        _check_episode(ds, _our_noisy_episode(sampler, sampled),
                       sampled_classes=sampled, k_shot=5, n_queries=1,
                       noise_type="sym", classes=classes, expect_noise=0,
                       class2scans={int(k): list(v)
                                    for k, v in sampler.class2scans.items()})


def test_bg_pcds_contract_both(ds):
    """bg pcd sampling (loader.py:853-887): 4 clouds from distinct classes
    outside the episode, blacklist shared with the episode."""
    np.random.seed(42)
    ref_ds = _quiet(ref_loader.NoiseInMetaTest, ds.root, "s3dis", cvfold=0,
                    n_way=2, k_shot=5, n_queries=1, mode="train",
                    num_point=P, pc_attribs="xyzrgbXYZ",
                    noise_ratio=[0.4], noise_type="sym")
    classes = [int(c) for c in ref_ds.classes]
    sampled = np.asarray(classes[:2])
    ep = _ref_noisy_episode(ref_ds, sampled)
    assert ep["bg_x"].shape[0] == 4
    _check_episode(ds, ep, sampled_classes=sampled, k_shot=5, n_queries=1,
                   noise_type="train", classes=classes, expect_noise=2,
                   class2scans=ref_ds.class2scans)

    sampler = NoisyEpisodeSampler(
        ds.root, "s3dis", cvfold=0, n_way=2, k_shot=5, n_queries=1,
        mode="train", num_point=P, pc_attribs="xyzrgbXYZ",
        noise_ratio=[0.4], seed=17)
    ep = _our_noisy_episode(sampler, sampled)
    blacklist = []
    for arr in (ep["sx"].reshape(-1, P, 9), ep["qx"]):
        for cloud in arr:
            sid, _ = _rows_of(cloud)
            blacklist.append(f"scan{sid:03d}")
    bg_x, bg_y = sampler.sample_bg_pcds(sampled, blacklist)
    assert bg_x.shape[0] == 4
    ep["bg_x"], ep["bg_y"] = bg_x, bg_y
    _check_episode(ds, ep, sampled_classes=sampled, k_shot=5, n_queries=1,
                   noise_type="train", classes=classes, expect_noise=2,
                   class2scans={int(k): list(v)
                                for k, v in sampler.class2scans.items()})


def test_contract_detects_drift(ds):
    """The contract is not vacuous: corrupting any pinned semantic makes it
    fail — a same-author misreading encoded twice cannot pass silently."""
    np.random.seed(606)
    ref_ds = _quiet(ref_loader.NoiseInMetaTest, ds.root, "s3dis", cvfold=0,
                    n_way=2, k_shot=5, n_queries=1, mode="test",
                    num_point=P, pc_attribs="xyzrgbXYZ",
                    noise_ratio=0.4, noise_type="ood")
    classes = [int(c) for c in ref_ds.classes]
    sampled = np.asarray(classes[:2])
    kw = dict(sampled_classes=sampled, k_shot=5, n_queries=1,
              noise_type="ood", classes=classes, expect_noise=2,
              class2scans=ref_ds.class2scans)
    base = _ref_noisy_episode(ref_ds, sampled)
    _check_episode(ds, base, **kw)  # sanity: clean copy passes

    def mutated(**changes):
        ep = {k: (np.array(v, copy=True) if v is not None else None)
              for k, v in base.items()}
        for k, fn in changes.items():
            ep[k] = fn(ep[k])
        return ep

    def flip_mask(sy):
        sy[0, 0, :7] = 1 - sy[0, 0, :7]; return sy

    def unzero_gt(gsy):
        flags = np.asarray(base["flag"])
        noisy = int(np.nonzero(flags[0] != int(sampled[0]))[0][0])
        gsy[0, noisy, :10] = 1; return gsy

    def wrong_query_label(qy):
        qy[0, :5] = (qy[0, :5] + 1) % 3; return qy

    def reuse_scan(qx):
        qx[1] = base["sx"][0, 0]; return qx

    def wrong_noise_class(flag):
        flags = np.asarray(flag)
        noisy = int(np.nonzero(flags[0] != int(sampled[0]))[0][0])
        flags[0, noisy] = int(sampled[1])  # sym-style class under ood
        return flags

    for name, changes in [
        ("mask flip", dict(sy=flip_mask)),
        ("gt not zeroed", dict(gsy=unzero_gt)),
        ("query label remap", dict(qy=wrong_query_label)),
        ("blacklist reuse", dict(qx=reuse_scan)),
        ("noise class range", dict(flag=wrong_noise_class)),
    ]:
        with pytest.raises(AssertionError):
            _check_episode(ds, mutated(**changes), **kw)


# ========================================================================
# cache materialisation: reference writes, we consume (loader.py:1599-1659)
# ========================================================================

def test_cache_counts_and_interop_with_reference_materialiser(ds):
    """The reference's MyTestDataset_NoiseInMetaTest materialises
    C(test_classes, n_way) * num_episode_per_comb h5 files under its
    name-encoded dir; our StaticTestDataset finds the same dir by its own
    naming and loads every episode verbatim."""
    from r3dfsseg_tpu.data.cache import StaticTestDataset

    np.random.seed(88)
    n_per = 2
    ref_ds = _quiet(ref_loader.MyTestDataset_NoiseInMetaTest,
                    ds.root, "s3dis", cvfold=0, num_episode_per_comb=n_per,
                    n_way=2, k_shot=5, n_queries=1, num_point=P,
                    pc_attribs="xyzrgbXYZ", mode="test",
                    noise_ratio=0.4, noise_type="sym")
    n_test_classes = 6
    want = n_per * len(list(itertools.combinations(range(n_test_classes), 2)))
    assert ref_ds.num_episode == want

    dirname = ("NoiseTest_%s_%f_S_%d_N_%d_K_%d_test_episodes_%d_pts_%d"
               % ("sym", 0.4, 0, 2, 5, n_per, P))
    cache_dir = os.path.join(ds.root, dirname)
    assert os.path.isdir(cache_dir)
    assert len([f for f in os.listdir(cache_dir)
                if f.endswith(".h5")]) == want

    ours = _quiet(StaticTestDataset, ds.root, "s3dis", cvfold=0,
                  num_episode_per_comb=n_per, n_way=2, k_shot=5,
                  n_queries=1, num_point=P, pc_attribs="xyzrgbXYZ",
                  mode="test", noise_ratio=0.4, noise_type="sym")
    assert len(ours) == want  # found the reference's dir — did NOT rebuild
    classes = [int(c) for c in ref_ds.classes]
    for i in range(0, want, max(1, want // 5)):
        ep = ours[i]
        sampled = [int(c) for c in np.asarray(ep.sampled_classes)]
        # flags aren't cached (the reference test collate drops them,
        # loader.py:1676-1684) — check the flag-independent contract subset
        _check_cached_episode(ds, ep, sampled, classes)


def _check_cached_episode(ds, ep, sampled, classes):
    """Contract subset observable without support_flag: provenance, query
    labels, gt zeroing count, blacklist."""
    sx = np.asarray(ep.support_x)
    sy = np.asarray(ep.support_y)
    gsy = np.asarray(ep.gt_support_y)
    qx, qy = np.asarray(ep.query_x), np.asarray(ep.query_y)
    sids = []
    for w, cls in enumerate(sampled):
        n_noisy = 0
        for i in range(sx.shape[1]):
            sid, rows = _rows_of(sx[w, i])
            sids.append(sid)
            raw = ds.by_id[sid]
            # the mask is SOME class's binary mask (way class if clean,
            # another sampled class if sym-noisy)
            cands = [c for c in classes + list(sampled)
                     if np.array_equal(np.asarray(sy[w, i], bool),
                                       raw[rows, 6] == c)]
            assert cands, f"mask of shot ({w},{i}) matches no class"
            if cls not in cands:
                n_noisy += 1
                assert not np.asarray(gsy[w, i], bool).any()
        assert n_noisy == 2  # round(5 * 0.4)
        sid, rows = _rows_of(qx[w])
        sids.append(sid)
        raw = ds.by_id[sid]
        want = np.zeros(P, np.int64)
        for j, c in enumerate(sampled):
            want[raw[rows, 6] == int(c)] = j + 1
        np.testing.assert_array_equal(np.asarray(qy[w], np.int64), want)
    assert len(sids) == len(set(sids))


# ========================================================================
# augmentation: exact parity under scripted draws (loader.py:354-373)
# ========================================================================

def _install_real_transforms3d_stub():
    """The module-level shim registers transforms3d as an EMPTY module so
    the loader imports; give it the real math (formulas transliterated
    from the transforms3d package) so augment_pointcloud runs."""
    t3d = sys.modules["transforms3d"]
    zooms = types.ModuleType("transforms3d.zooms")

    def zfdir2mat(factor, direction=None):
        if direction is None:
            return np.diag([factor] * 3).astype(float)
        d = np.asarray(direction, float)
        d = d / np.sqrt(np.sum(d * d))
        return np.identity(3) - (1.0 - factor) * np.outer(d, d)

    zooms.zfdir2mat = zfdir2mat
    axangles = types.ModuleType("transforms3d.axangles")

    def axangle2mat(axis, angle, is_normalized=False):
        x, y, z = np.asarray(axis, float) / np.sqrt(
            np.sum(np.asarray(axis, float) ** 2))
        c, s = np.cos(angle), np.sin(angle)
        C = 1.0 - c
        return np.array([
            [x * x * C + c, x * y * C - z * s, x * z * C + y * s],
            [y * x * C + z * s, y * y * C + c, y * z * C - x * s],
            [z * x * C - y * s, z * y * C + x * s, z * z * C + c]])

    axangles.axangle2mat = axangle2mat
    t3d.zooms = zooms
    t3d.axangles = axangles


def test_augmentation_exact_parity(rng, monkeypatch):
    """Same scripted draws -> bit-level agreement of the scale/z-rot/
    mirror matrix composition and the clipped float32 jitter between the
    reference `augment_pointcloud` and ours (data/sampler.py)."""
    from r3dfsseg_tpu.data.sampler import augment_pointcloud as ours_augment

    _install_real_transforms3d_stub()
    n = 200
    P = rng.uniform(0, 4, size=(n, 3))
    normals = rng.standard_normal((n, 3))
    cfg = {"scale": 1.5, "rot": 1, "mirror_prob": 1.0, "jitter": 1}
    uniforms = [1.31, 2.2]          # scale in [1/1.5, 1.5]... then angle
    randoms = [0.2, 0.9]            # mirror x yes (<0.5), mirror y no

    seq_u, seq_r = list(uniforms), list(randoms)
    monkeypatch.setattr(ref_loader.random, "uniform",
                        lambda a, b: seq_u.pop(0))
    monkeypatch.setattr(ref_loader.random, "random", lambda: seq_r.pop(0))
    monkeypatch.setattr(ref_loader.np.random, "randn",
                        lambda *s: normals.reshape(s))
    ref_out = ref_loader.augment_pointcloud(P.copy(), cfg)

    class _Gen:
        def __init__(self):
            self.u, self.r = list(uniforms), list(randoms)

        def uniform(self, a, b):
            return self.u.pop(0)

        def random(self):
            return self.r.pop(0)

        def standard_normal(self, shape):
            return normals.reshape(shape)

    our_out = ours_augment(P.copy(), cfg, _Gen())
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-12, atol=1e-12)

    # and with every augmentation disabled both are exact no-ops
    cfg0 = {"scale": 0, "rot": 0, "mirror_prob": 0, "jitter": 0}
    np.testing.assert_allclose(
        ours_augment(P.copy(), cfg0, _Gen()),
        ref_loader.augment_pointcloud(P.copy(), cfg0), rtol=0, atol=0)


def test_scannet_class2scans_parity(tmp_path):
    """Same exact-parity check for the ScanNet catalog (scannet.py:38-69;
    train classes exclude class 0 'unannotated', :33-34)."""
    sys.path.insert(0, "/root/reference")
    try:
        from dataloaders.scannet import ScanNetDataset as RefScanNet
    finally:
        sys.path.remove("/root/reference")
    from r3dfsseg_tpu.data.catalogs import SCANNET_CLASSNAMES

    root = str(tmp_path / "blocks")
    os.makedirs(os.path.join(root, "data"))
    meta = os.path.join(str(tmp_path), "meta")
    os.makedirs(meta, exist_ok=True)
    with open(os.path.join(meta, "scannet_classnames.txt"), "w") as f:
        f.write("\n".join(SCANNET_CLASSNAMES) + "\n")
    gen = np.random.default_rng(4)
    for s in range(30):
        cls_ids = [(s + 5 * j) % 21 for j in range(4)]
        rows = []
        for c in cls_ids:
            block = np.zeros((256, 8))
            block[:, :3] = gen.uniform(0, 5, size=(256, 3))
            block[:, 6] = c
            block[:, 7] = c
            rows.append(block)
        np.save(os.path.join(root, "data", f"scene{s:04d}.npy"),
                np.concatenate(rows))

    ref = _quiet(RefScanNet, 0, root)
    os.remove(os.path.join(root, "class2scans.pkl"))
    ours = get_catalog("scannet", 0, root)
    assert {k: sorted(v) for k, v in ref.class2scans.items()} == \
           {int(k): sorted(v) for k, v in ours.class2scans.items()}
    assert list(ref.test_classes) == list(ours.test_classes)
    assert list(ref.train_classes) == list(ours.train_classes)
