"""Paths catalog serving SYNTHETIC COCO datasets for on-chip dress
rehearsals of the training/eval CLIs (VERDICT r4 item 5: run
tools/train_net.py as a SYSTEM — threaded loader + device steps +
checkpointing + MetricLogger — without real COCO data on the box).

Use it as a drop-in PATHS_CATALOG override; dataset names encode the
image count:

    python tools/train_net.py --config-file configs/paa/paa_R_50_FPN_1x.yaml \
        PATHS_CATALOG tools/synth_catalog.py \
        DATASETS.TRAIN '("synth_coco_512",)' DATASETS.TEST '("synth_coco_64",)' \
        MODEL.WEIGHT '' SOLVER.MAX_ITER 200 ...

Images are generated once per (count) under $PAA_TPU_SYNTH_DIR (default
/tmp/paa_synth_data) by tools/bench_loader.py's generator (natural-ish
low-frequency JPEGs — random noise is atypically slow to decode — plus
a valid COCO instances json). Mirrors the role of the reference's
paths_catalog.py DatasetCatalog indirection
(paa_core/config/paths_catalog.py:12-30) for environments without
datasets.
"""

import importlib.util
import os
import re

_TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))


def _synth_dataset(root, n_images):
    spec = importlib.util.spec_from_file_location(
        "paa_tpu_bench_loader", os.path.join(_TOOLS_DIR, "bench_loader.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.synth_dataset(root, n_images)


class DatasetCatalog:
    DATA_DIR = os.environ.get("PAA_TPU_SYNTH_DIR", "/tmp/paa_synth_data")

    @staticmethod
    def get(name):
        m = re.fullmatch(r"synth_coco_(\d+)", name)
        if not m:
            raise RuntimeError(f"Dataset not available: {name}")
        n = int(m.group(1))
        ann_file, img_dir = _synth_dataset(DatasetCatalog.DATA_DIR, n)
        return dict(
            factory="COCODataset",
            args=dict(root=img_dir, ann_file=ann_file),
        )
