"""All shipped YAML configs merge cleanly into the defaults and (for the
dense heads) build a model — the analogue of reference tests/test_configs
+ test_detectors' build-everything sweep, here including the PAA/ATSS/
FCOS configs the reference forgot to cover (SURVEY.md section 4 gap)."""

import glob
import os

import pytest

from paa_tpu.config import get_cfg

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_CONFIGS = sorted(
    glob.glob(os.path.join(CONFIG_ROOT, "**", "*.yaml"), recursive=True)
)


@pytest.mark.parametrize(
    "path", ALL_CONFIGS, ids=[os.path.basename(p) for p in ALL_CONFIGS]
)
def test_config_merges(path):
    cfg = get_cfg()
    cfg.merge_from_file(path)
    cfg.freeze()


def test_all_head_configs_build():
    import jax

    from paa_tpu.modeling import build_detection_model

    heads = [
        "configs/paa/paa_R_50_FPN_1x.yaml",
        "configs/atss/atss_R_50_FPN_1x.yaml",
        "configs/fcos/fcos_R_50_FPN_1x.yaml",
        "configs/retinanet/retinanet_R_50_FPN_1x.yaml",
    ]
    for rel in heads:
        cfg = get_cfg()
        cfg.merge_from_file(os.path.join(CONFIG_ROOT, "..", rel))
        model = build_detection_model(cfg)
        # build params lazily (tiny shape) to validate the module wiring
        model.init(jax.random.PRNGKey(0), (64, 64))


def test_faster_rcnn_config_builds():
    import jax

    from paa_tpu.modeling.two_stage import build_faster_rcnn

    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(CONFIG_ROOT, "e2e_faster_rcnn_R_50_FPN_1x.yaml")
    )
    model = build_faster_rcnn(cfg)
    model.init(jax.random.PRNGKey(0), (64, 64))


def test_all_dataset_names_in_catalog():
    """Every DATASETS.TRAIN/TEST name in every shipped YAML resolves
    through DatasetCatalog (reference paths_catalog indirection)."""
    import re

    from paa_tpu.config.paths_catalog import DatasetCatalog

    names = set()
    for path in ALL_CONFIGS:
        for line in open(path):
            s = line.strip()
            if s.startswith("TRAIN:") or s.startswith("TEST:"):
                names.update(re.findall(r'"([a-z0-9_]+)"', s))
    for name in sorted(names):
        if name == "bbox":  # TEST.EXPECTED_RESULTS metric tag
            continue
        d = DatasetCatalog.get(name)
        assert d["factory"] in ("COCODataset", "PascalVOCDataset")


# one representative per newly-covered model family (gn/Xconv heads,
# C4 mask, FBNet dsmask, P5 retinanet, improved FCOS, ATSS iou-pred,
# single-level RPN-only, VOC R-CNN)
REPRESENTATIVE_BUILDS = [
    "gn_baselines/scratch_e2e_mask_rcnn_R_50_FPN_Xconv1fc_3x_gn.yaml",
    "e2e_mask_rcnn_R_50_C4_1x.yaml",
    "e2e_mask_rcnn_fbnet_xirb16d_dsmask.yaml",
    "retinanet/retinanet_R-50-FPN_P5_1x.yaml",
    "fcos/fcos_imprv_R_50_FPN_1x.yaml",
    "atss/ret_iou_R_50_FPN_1.5x.yaml",
    "rpn_R_50_C4_1x.yaml",
    "pascal_voc/e2e_faster_rcnn_R_50_C4_1x_1_gpu_voc.yaml",
]


@pytest.mark.slow
@pytest.mark.parametrize(
    "rel", REPRESENTATIVE_BUILDS, ids=[os.path.basename(p) for p in
                                       REPRESENTATIVE_BUILDS]
)
def test_representative_config_builds(rel):
    import jax

    from paa_tpu.modeling import build_detection_model

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIG_ROOT, rel))
    model = build_detection_model(cfg)
    model.init(jax.random.PRNGKey(0), (64, 96))
