"""Datasets (PandaSet, synthetic, packed) and the host input pipeline."""

from lmsu_tpu.data.packed import (PackedDataset, create_packed_datasets,
                                  write_pack)
from lmsu_tpu.data.pandaset import (PandaSetDataset, create_pandaset_datasets,
                                    list_scenes, split_scenes)
from lmsu_tpu.data.pipeline import Batcher, PrefetchLoader, make_loader
from lmsu_tpu.data.rasterize import (DRIVABLE_RAW_IDS, rasterize_bev,
                                     remap_semantic)
from lmsu_tpu.data.synthetic import (SyntheticMultiModalDataset,
                                     create_synthetic_datasets)


def create_datasets(config, verbose: bool = False):
    """Dataset factory switching on DataConfig.dataset — the rebuild of the
    reference's deleted data_interface.create_dataloaders (SURVEY.md §2.26)."""
    if config.dataset == "pandaset":
        return create_pandaset_datasets(config, verbose=verbose)
    if config.dataset == "synthetic":
        return create_synthetic_datasets(config)
    if config.dataset == "packed":
        return create_packed_datasets(config)
    raise ValueError(f"Unknown dataset: {config.dataset}")


__all__ = [
    "PandaSetDataset", "create_pandaset_datasets", "list_scenes",
    "split_scenes", "Batcher", "PrefetchLoader", "make_loader",
    "rasterize_bev", "remap_semantic", "DRIVABLE_RAW_IDS",
    "SyntheticMultiModalDataset", "create_synthetic_datasets",
    "PackedDataset", "create_packed_datasets", "write_pack",
    "create_datasets",
]
