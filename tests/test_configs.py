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
