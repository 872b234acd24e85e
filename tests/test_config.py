import pytest

from paa_tpu.config import get_cfg


def test_defaults_present():
    cfg = get_cfg()
    assert cfg.MODEL.PAA.NUM_CLASSES == 81
    assert cfg.MODEL.PAA.TOPK == 9
    assert cfg.MODEL.PAA.ANCHOR_STRIDES == (8, 16, 32, 64, 128)
    assert cfg.SOLVER.MOMENTUM == 0.9


def test_merge_from_list_with_coercion():
    cfg = get_cfg()
    cfg.merge_from_list(
        ["MODEL.PAA.TOPK", "12", "SOLVER.BASE_LR", "0.02",
         "MODEL.PAA.ANCHOR_SIZES", "(32, 64)"]
    )
    assert cfg.MODEL.PAA.TOPK == 12
    assert cfg.SOLVER.BASE_LR == 0.02
    assert cfg.MODEL.PAA.ANCHOR_SIZES == (32, 64)


def test_merge_from_file(tmp_path):
    yaml_text = """
MODEL:
  PAA_ON: True
  RPN_ONLY: True
  BACKBONE:
    CONV_BODY: "R-50-FPN-RETINANET"
  PAA:
    ANCHOR_SIZES: (64, 128, 256, 512, 1024)
    INFERENCE_SCORE_VOTING: True
SOLVER:
  BASE_LR: 0.01
  STEPS: (60000, 80000)
  WARMUP_METHOD: "constant"
"""
    f = tmp_path / "cfg.yaml"
    f.write_text(yaml_text)
    cfg = get_cfg()
    cfg.merge_from_file(str(f))
    assert cfg.MODEL.PAA_ON is True
    assert cfg.MODEL.BACKBONE.CONV_BODY == "R-50-FPN-RETINANET"
    assert cfg.SOLVER.STEPS == (60000, 80000)
    assert cfg.MODEL.PAA.INFERENCE_SCORE_VOTING is True


def test_freeze_blocks_writes():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.PAA.TOPK = 3
    cfg.defrost()
    cfg.MODEL.PAA.TOPK = 3
    assert cfg.MODEL.PAA.TOPK == 3


def test_unknown_key_rejected():
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["MODEL.NOPE", "1"])


def test_clone_is_independent():
    cfg = get_cfg()
    cfg2 = cfg.clone()
    cfg2.MODEL.PAA.TOPK = 99
    assert cfg.MODEL.PAA.TOPK == 9
