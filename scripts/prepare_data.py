#!/usr/bin/env python
"""Room -> block preprocessing for S3DIS / ScanNet style datasets.

The reference defers data preparation to the external attMPTI repo
(/root/reference/README.md:19-31): rooms are split into 1m x 1m xy blocks
with stride 1.0 and written as ``blocks_bs1.0_s1.0/data/<room>_blockN.npy``
float arrays of shape [P, 7] = [x y z r g b label].  This script is a
self-contained equivalent so a user of this framework does not need the
external repo:

  * ``--mode rooms``      consume room-level ``.npy``/``.txt`` files that
                          already hold [x y z r g b label] rows.
  * ``--mode s3dis_raw``  consume the Stanford S3DIS dump
                          (``Area_*/<room>/Annotations/<class>_*.txt``,
                          one xyzrgb text file per object instance) and
                          derive labels from the 13-class name map.

Output layout (consumed by r3dfsseg_tpu.data.catalogs / sampler):

    <out>/blocks_bs{B}_s{S}/data/<room>_block<N>.npy   float32 [P, 7]
    <out>/meta/<dataset>_classnames.txt

Block semantics follow the attMPTI/PointNet indoor recipe: shift the room
to its xyz minimum, tile the xy extent with ``block_size`` windows at
``stride`` spacing, keep every point whose xy falls inside the window, and
drop blocks with fewer than ``--min_pts`` points (the class2scans catalog
additionally requires max(5% of points, 100) per class; see
r3dfsseg_tpu/data/catalogs.py:30).
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r3dfsseg_tpu.data.catalogs import S3DIS_CLASSNAMES, SCANNET_CLASSNAMES


def split_room_to_blocks(
    points: np.ndarray,
    block_size: float = 1.0,
    stride: float = 1.0,
    min_pts: int = 100,
) -> list[np.ndarray]:
    """Split one room's [P, 7] array into xy blocks.

    Points are shifted so the room minimum sits at the origin (matching the
    reference blocks, whose coordinates start near 0).  Returns the list of
    per-block [Pi, 7] arrays, row order preserved within a block.
    """
    pts = np.asarray(points, np.float32)
    if pts.ndim != 2 or pts.shape[1] < 7:
        raise ValueError(f"room array must be [P, >=7], got {pts.shape}")
    pts = pts.copy()
    pts[:, :3] -= pts[:, :3].min(axis=0)

    limit = pts[:, :2].max(axis=0)
    nx = max(int(np.ceil((limit[0] - block_size) / stride)) + 1, 1)
    ny = max(int(np.ceil((limit[1] - block_size) / stride)) + 1, 1)

    blocks: list[np.ndarray] = []
    for ix in range(nx):
        for iy in range(ny):
            xbeg, ybeg = ix * stride, iy * stride
            m = ((pts[:, 0] >= xbeg) & (pts[:, 0] <= xbeg + block_size)
                 & (pts[:, 1] >= ybeg) & (pts[:, 1] <= ybeg + block_size))
            if int(m.sum()) < min_pts:
                continue
            blocks.append(pts[m])
    return blocks


def load_room_file(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    return np.loadtxt(path)


def load_s3dis_raw_room(room_dir: str, name2label: dict[str, int]) -> np.ndarray:
    """Assemble one room from Stanford ``Annotations/<class>_<i>.txt`` files.

    Each annotation file holds ``x y z r g b`` rows for one object instance;
    the class comes from the filename prefix.  Unknown prefixes map to
    'clutter' (class 12), mirroring the attMPTI collection step.
    """
    parts = []
    ann = sorted(glob.glob(os.path.join(room_dir, "Annotations", "*.txt")))
    if not ann:
        raise FileNotFoundError(f"no Annotations/*.txt under {room_dir}")
    clutter = name2label.get("clutter", len(name2label) - 1)
    for f in ann:
        cls = os.path.basename(f).split("_")[0]
        label = name2label.get(cls, clutter)
        xyzrgb = np.loadtxt(f)
        if xyzrgb.ndim == 1:
            xyzrgb = xyzrgb[None]
        lab = np.full((xyzrgb.shape[0], 1), label, xyzrgb.dtype)
        parts.append(np.concatenate([xyzrgb[:, :6], lab], axis=1))
    return np.concatenate(parts, axis=0)


def _iter_rooms(args) -> list[tuple[str, str]]:
    """Yield (room_name, source_path_or_dir) pairs for the chosen mode."""
    if args.mode == "rooms":
        files = sorted(glob.glob(os.path.join(args.in_dir, "*.npy"))
                       + glob.glob(os.path.join(args.in_dir, "*.txt")))
        return [(os.path.splitext(os.path.basename(f))[0], f) for f in files]
    # s3dis_raw: Area_*/<room>/ directories containing Annotations/
    rooms = []
    for area in sorted(glob.glob(os.path.join(args.in_dir, "Area_*"))):
        for room in sorted(os.listdir(area)):
            rd = os.path.join(area, room)
            if os.path.isdir(os.path.join(rd, "Annotations")):
                rooms.append((f"{os.path.basename(area)}_{room}", rd))
    return rooms


def main(argv=None) -> str:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in_dir", required=True,
                    help="room .npy/.txt dir, or the raw S3DIS root")
    ap.add_argument("--out_dir", required=True,
                    help="dataset root; blocks land in "
                         "<out_dir>/blocks_bs{B}_s{S}/data")
    ap.add_argument("--dataset", choices=["s3dis", "scannet"], default="s3dis")
    ap.add_argument("--mode", choices=["rooms", "s3dis_raw"], default="rooms")
    ap.add_argument("--block_size", type=float, default=1.0)
    ap.add_argument("--stride", type=float, default=1.0)
    ap.add_argument("--min_pts", type=int, default=100)
    ap.add_argument("--rgb_scale", type=float, default=1.0,
                    help="multiply r,g,b by this (use 255 for 0-1 inputs; "
                         "blocks store 0-255 colours like the reference — "
                         "the sampler divides by 255, sampler.py:170)")
    args = ap.parse_args(argv)

    names = S3DIS_CLASSNAMES if args.dataset == "s3dis" else SCANNET_CLASSNAMES
    name2label = {n: i for i, n in enumerate(names)}

    tag = (f"blocks_bs{args.block_size:g}_s{args.stride:g}"
           if args.block_size != 1.0 or args.stride != 1.0
           else "blocks_bs1_s1")
    block_root = os.path.join(args.out_dir, tag)
    data_dir = os.path.join(block_root, "data")
    os.makedirs(data_dir, exist_ok=True)
    meta_dir = os.path.join(args.out_dir, "meta")
    os.makedirs(meta_dir, exist_ok=True)
    with open(os.path.join(meta_dir, f"{args.dataset}_classnames.txt"), "w") as f:
        f.write("\n".join(names) + "\n")

    n_rooms = n_blocks = 0
    for room_name, src in _iter_rooms(args):
        room = (load_s3dis_raw_room(src, name2label)
                if args.mode == "s3dis_raw" else load_room_file(src))
        room = np.asarray(room, np.float32)
        if args.rgb_scale != 1.0:
            room[:, 3:6] *= args.rgb_scale
        blocks = split_room_to_blocks(room, args.block_size, args.stride,
                                      args.min_pts)
        for i, blk in enumerate(blocks):
            np.save(os.path.join(data_dir, f"{room_name}_block_{i}.npy"), blk)
        n_rooms += 1
        n_blocks += len(blocks)
        print(f"{room_name}: {room.shape[0]} pts -> {len(blocks)} blocks")

    print(f"done: {n_rooms} rooms -> {n_blocks} blocks under {data_dir}")
    return block_root


if __name__ == "__main__":
    main()
