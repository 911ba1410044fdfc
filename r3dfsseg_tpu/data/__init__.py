"""Host-side data pipeline: dataset catalogs, episode samplers (clean and
noise-injecting), augmentation, the h5 episode cache, and a prefetching
episode loader that feeds the device."""
from r3dfsseg_tpu.data.catalogs import S3DISCatalog, ScanNetCatalog, get_catalog  # noqa: F401
from r3dfsseg_tpu.data.sampler import sample_scan, augment_pointcloud  # noqa: F401
from r3dfsseg_tpu.data.episodes import EpisodeSampler, NoisyEpisodeSampler, cut_out  # noqa: F401
from r3dfsseg_tpu.data.cache import StaticTestDataset, write_episode_h5, read_episode_h5  # noqa: F401
from r3dfsseg_tpu.data.loader import EpisodeLoader  # noqa: F401
