"""Dataset construction from the catalog (reference data/build.py:17-58
build_dataset + paths_catalog indirection)."""

from __future__ import annotations

import importlib.util
import logging


def _load_paths_catalog(cfg):
    spec = importlib.util.spec_from_file_location(
        "paa_tpu_paths_catalog", cfg.PATHS_CATALOG
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_dataset(cfg, dataset_names, is_train=True):
    """Build (and for multiple names, concatenate) datasets."""
    from .coco import COCODataset
    from .voc import PascalVOCDataset

    paths_catalog = _load_paths_catalog(cfg)
    factories = {
        "COCODataset": COCODataset,
        "PascalVOCDataset": PascalVOCDataset,
    }
    datasets = []
    for name in dataset_names:
        data = paths_catalog.DatasetCatalog.get(name)
        factory = factories[data["factory"]]
        args = data["args"]
        if data["factory"] == "COCODataset":
            args["remove_images_without_annotations"] = is_train
            args["with_masks"] = cfg.MODEL.MASK_ON and is_train
            args["with_keypoints"] = cfg.MODEL.KEYPOINT_ON and is_train
        elif data["factory"] == "PascalVOCDataset":
            args["use_difficult"] = not is_train
        datasets.append(factory(**args))

    if len(datasets) == 1:
        return datasets[0]
    if not is_train:
        return datasets
    from .concat import ConcatDataset

    return ConcatDataset(datasets)
