"""Static test-episode cache (h5), wire-compatible with the reference.

Directory naming and file schema match `MyTestDataset` /
`MyTestDataset_NoiseInMetaTest` (`/root/reference/dataloaders/loader.py:
1535-1659`) and `write_episode`/`read_episode` (loader.py:1687-1721), so a
test set materialised by the PyTorch reference can be evaluated verbatim by
this framework (removing episode-sampling RNG from parity comparisons).
"""
from __future__ import annotations

import glob
import os
from itertools import combinations
from typing import Optional

import h5py as h5
import numpy as np

from r3dfsseg_tpu.data.episodes import EpisodeSampler, NoisyEpisodeSampler
from r3dfsseg_tpu.models.episode import Episode


def write_episode_h5(path: str, ep: Episode):
    """Reference schema (loader.py:1687-1703).  Cluster fields are dummy
    zeros when the sampler didn't produce them."""
    zeros_s = np.zeros_like(np.asarray(ep.support_y), dtype=np.int32)
    zeros_q = np.zeros_like(np.asarray(ep.query_y), dtype=np.int32)
    with h5.File(path, "w") as f:
        f.create_dataset("support_ptclouds", data=np.asarray(ep.support_x),
                         dtype="float32")
        f.create_dataset("support_masks", data=np.asarray(ep.support_y),
                         dtype="int32")
        f.create_dataset("query_ptclouds", data=np.asarray(ep.query_x),
                         dtype="float32")
        f.create_dataset("query_labels", data=np.asarray(ep.query_y),
                         dtype="int64")
        f.create_dataset("sampled_classes",
                         data=np.asarray(ep.sampled_classes), dtype="int32")
        f.create_dataset("support_clusters", data=zeros_s, dtype="int32")
        f.create_dataset("query_clusters", data=zeros_q, dtype="int32")
        f.create_dataset("gt_support_masks",
                         data=np.asarray(ep.gt_support_y if ep.gt_support_y
                                         is not None else zeros_s),
                         dtype="int32")


def read_episode_h5(path: str) -> Episode:
    """Read either our files or reference-generated ones (loader.py:1708-1721).

    The reference collate keeps clouds as (…, n_points, attrs) in h5 and
    transposes to channels-first for torch; we stay channels-last.
    """
    with h5.File(path, "r") as f:
        return Episode(
            support_x=f["support_ptclouds"][:].astype(np.float32),
            support_y=f["support_masks"][:].astype(np.int32),
            query_x=f["query_ptclouds"][:].astype(np.float32),
            query_y=f["query_labels"][:].astype(np.int32),
            gt_support_y=(f["gt_support_masks"][:].astype(np.int32)
                          if "gt_support_masks" in f else None),
            sampled_classes=f["sampled_classes"][:].astype(np.int32),
        )


class StaticTestDataset:
    """Materialise-or-load the C(test_classes, n_way) x episodes_per_comb
    cache with the reference's directory naming (loader.py:1557-1563,
    1624-1631)."""

    def __init__(self, data_path: str, dataset_name: str, *, cvfold: int = 0,
                 num_episode_per_comb: int = 100, n_way: int = 2,
                 k_shot: int = 5, n_queries: int = 1, num_point: int = 2048,
                 pc_attribs: str = "xyzrgbXYZ", mode: str = "valid",
                 noise_ratio: float = 0.0, noise_type: Optional[str] = None,
                 noise_pair=None, seed: Optional[int] = None):
        noisy = noise_ratio and noise_ratio > 0
        if noisy:
            sampler = NoisyEpisodeSampler(
                data_path, dataset_name, cvfold=cvfold, n_way=n_way,
                k_shot=k_shot, n_queries=n_queries, mode="test",
                num_point=num_point, pc_attribs=pc_attribs,
                noise_ratio=noise_ratio, noise_type=noise_type,
                noise_pair=noise_pair, seed=seed)
            tag = "test_episodes" if mode == "test" else "episodes"
            dirname = ("NoiseTest_%s_%f_S_%d_N_%d_K_%d_%s_%d_pts_%d" % (
                noise_type, noise_ratio, cvfold, n_way, k_shot, tag,
                num_episode_per_comb, num_point))
            if noise_type == "pair":
                # the mapping changes the episodes: different dicts must
                # not share a cache (the reference never materialised pair
                # caches — its pair branch crashes — so no interop concern)
                pairs = "_".join(f"{a}-{b}"
                                 for a, b in sorted(noise_pair.items()))
                dirname += f"_pair_{pairs}"
        else:
            sampler = EpisodeSampler(
                data_path, dataset_name, cvfold=cvfold, n_way=n_way,
                k_shot=k_shot, n_queries=n_queries, mode="test",
                num_point=num_point, pc_attribs=pc_attribs, seed=seed)
            tag = "test_episodes" if mode == "test" else "episodes"
            dirname = ("S_%d_N_%d_K_%d_%s_%d_pts_%d" % (
                cvfold, n_way, k_shot, tag, num_episode_per_comb, num_point))

        self.classes = sampler.classes
        self.root = os.path.join(data_path, dirname)
        n_combs = sum(1 for _ in combinations(self.classes.tolist(), n_way))
        expected = n_combs * num_episode_per_comb
        existing = (sorted(glob.glob(os.path.join(self.root, "*.h5")),
                           key=lambda p: int(os.path.basename(p)[:-3]))
                    if os.path.exists(self.root) else [])
        if len(existing) == expected:
            self.file_names = existing
        else:
            # dir absent, empty, or truncated by a crashed materialisation
            # -> regenerate the full set (reference-written caches always
            # hold exactly n_combs * episodes files, so they load verbatim
            # through the branch above)
            if existing:
                import warnings
                warnings.warn(
                    f"episode cache {self.root} holds {len(existing)} of "
                    f"{expected} files — regenerating")
            os.makedirs(self.root, exist_ok=True)
            self.file_names = []
            idx = 0
            for comb in combinations(self.classes.tolist(), n_way):
                for _ in range(num_episode_per_comb):
                    ep = sampler.sample(list(comb))
                    out = os.path.join(self.root, f"{idx}.h5")
                    write_episode_h5(out, ep)
                    self.file_names.append(out)
                    idx += 1

    def __len__(self):
        return len(self.file_names)

    def __getitem__(self, i: int) -> Episode:
        return read_episode_h5(self.file_names[i])
