"""Room->block preprocessing (scripts/prepare_data.py) feeding the real
catalog + episode sampler — the on-ramp the reference delegates to the
external attMPTI repo (/root/reference/README.md:19-31)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from prepare_data import load_s3dis_raw_room, main, split_room_to_blocks

from r3dfsseg_tpu.data import EpisodeSampler, get_catalog
from r3dfsseg_tpu.data.catalogs import S3DIS_CLASSNAMES


def _make_room(rng, classes, extent=(2.5, 1.8), pts_per_class=600):
    """Blobby room spanning `extent` metres in xy, columns [xyzrgb label]."""
    rows = []
    for c in classes:
        center = rng.uniform([0, 0, 0], [extent[0], extent[1], 2.0])
        xyz = center + rng.normal(scale=0.25, size=(pts_per_class, 3))
        xyz = np.clip(xyz, 0, [extent[0], extent[1], 3.0])
        rgb = rng.uniform(0, 255, size=(pts_per_class, 3))
        lab = np.full((pts_per_class, 1), c, np.float64)
        rows.append(np.concatenate([xyz, rgb, lab], axis=1))
    return np.concatenate(rows, axis=0)


def test_split_room_to_blocks_basic():
    rng = np.random.default_rng(0)
    room = _make_room(rng, classes=[0, 1, 7], extent=(2.5, 1.8))
    room[:, :3] += 11.0  # un-shifted input: splitter must re-origin
    blocks = split_room_to_blocks(room, block_size=1.0, stride=1.0,
                                  min_pts=10)
    assert blocks, "expected at least one block"
    total = sum(b.shape[0] for b in blocks)
    assert total >= int(0.9 * room.shape[0])  # stride==bs: near-full cover
    for b in blocks:
        assert b.shape[1] == 7
        assert b[:, :2].min() >= 0.0
        # block xy extent bounded by block_size (origin varies)
        ext = b[:, :2].max(0) - b[:, :2].min(0)
        assert (ext <= 1.0 + 1e-5).all()
    # small blocks dropped
    assert all(b.shape[0] >= 10 for b in blocks)


def test_prepare_rooms_to_episode(tmp_path):
    """rooms-mode end-to-end: rooms -> blocks -> catalog -> episode."""
    rng = np.random.default_rng(1)
    in_dir = tmp_path / "rooms"
    in_dir.mkdir()
    # rotate classes so each appears in several rooms (catalog needs >=
    # k_shot+n_queries scans per class)
    for r in range(12):
        classes = [(r + j) % 13 for j in range(4)]
        room = _make_room(rng, classes, extent=(1.9, 1.4), pts_per_class=500)
        np.save(in_dir / f"Area_1_room_{r}.npy", room)

    out = tmp_path / "S3DIS"
    block_root = main(["--in_dir", str(in_dir), "--out_dir", str(out),
                       "--dataset", "s3dis", "--mode", "rooms",
                       "--min_pts", "50"])
    files = sorted(os.listdir(os.path.join(block_root, "data")))
    assert files and all(f.endswith(".npy") for f in files)
    blk = np.load(os.path.join(block_root, "data", files[0]))
    assert blk.ndim == 2 and blk.shape[1] == 7
    assert os.path.exists(out / "meta" / "s3dis_classnames.txt")

    cat = get_catalog("s3dis", 0, str(block_root))
    assert any(cat.class2scans[c] for c in cat.test_classes + cat.train_classes)

    # pick a class with enough scans and sample a real episode through the
    # standard sampler (proves schema compatibility end to end)
    ok = [c for c in range(13) if len(cat.class2scans[c]) >= 3]
    assert ok, "no class got >=3 block scans"
    s = EpisodeSampler(str(block_root), "s3dis", cvfold=0, n_way=1, k_shot=2,
                       n_queries=1, mode="train", num_point=128, seed=0)
    ep = s.sample(n_way_classes=[ok[0]])
    assert ep.support_x.shape == (1, 2, 128, 9)
    assert np.isfinite(ep.support_x).all()


def test_s3dis_raw_mode(tmp_path):
    """Stanford Annotations/*.txt layout -> labelled room array."""
    rng = np.random.default_rng(2)
    room_dir = tmp_path / "Area_1" / "office_1"
    ann = room_dir / "Annotations"
    ann.mkdir(parents=True)
    for fname, n in [("chair_1.txt", 40), ("table_3.txt", 30),
                     ("mystery_9.txt", 10)]:
        xyzrgb = np.concatenate(
            [rng.uniform(0, 2, (n, 3)), rng.uniform(0, 255, (n, 3))], axis=1)
        np.savetxt(ann / fname, xyzrgb)

    name2label = {n: i for i, n in enumerate(S3DIS_CLASSNAMES)}
    room = load_s3dis_raw_room(str(room_dir), name2label)
    assert room.shape == (80, 7)
    labels = set(np.unique(room[:, 6]).astype(int))
    # chair=8, table=7, unknown prefix -> clutter=12
    assert labels == {name2label["chair"], name2label["table"],
                      name2label["clutter"]}

    out = tmp_path / "S3DIS"
    block_root = main(["--in_dir", str(tmp_path), "--out_dir", str(out),
                       "--mode", "s3dis_raw", "--min_pts", "5"])
    files = os.listdir(os.path.join(block_root, "data"))
    assert files and files[0].startswith("Area_1_office_1_block")


def test_min_pts_filter():
    rng = np.random.default_rng(3)
    room = _make_room(rng, classes=[2], extent=(0.5, 0.5), pts_per_class=80)
    assert split_room_to_blocks(room, min_pts=100) == []
    assert len(split_room_to_blocks(room, min_pts=10)) == 1
