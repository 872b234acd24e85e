"""Serving export roundtrip: the serialized StableHLO artifact must
reproduce the live model's detections exactly, loadable without model
code (paa_tpu/serving.py)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from paa_tpu.config import get_cfg
from paa_tpu.modeling import build_detection_model
from paa_tpu.serving import export_inference, load_exported, save_exported


def _small_cfg():
    cfg = get_cfg()
    cfg.MODEL.PAA_ON = True
    cfg.MODEL.RPN_ONLY = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = False
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 64
    cfg.MODEL.PAA.PRE_NMS_TOP_N = 50
    cfg.TEST.DETECTIONS_PER_IMG = 10
    cfg.freeze()
    return cfg


def test_export_roundtrip(tmp_path):
    cfg = _small_cfg()
    model = build_detection_model(cfg)
    hw = (64, 96)
    variables = model.init(jax.random.PRNGKey(0), hw)

    exported, meta = export_inference(model, variables, 2, hw)
    path = str(tmp_path / "model.paax")
    save_exported(path, exported, meta)
    assert os.path.getsize(path) > 0

    call, meta2 = load_exported(path)
    assert meta2["input_shape"] == [2, 64, 96, 3]

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.uniform(-2, 2, (2, *hw, 3)).astype(np.float32)
    )
    sizes = jnp.asarray([[64.0, 96.0], [60.0, 90.0]], jnp.float32)

    live = model.make_eval_fn(variables)(images, sizes)
    served = call(images, sizes)
    assert set(served) >= {"boxes", "scores", "labels", "valid"}
    for k in ("boxes", "scores", "labels", "valid"):
        np.testing.assert_allclose(
            np.asarray(live[k]), np.asarray(served[k]), atol=1e-5,
            err_msg=k,
        )


def test_export_cli(tmp_path):
    """tools/export_model.py end-to-end on a tiny override config."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    import export_model

    cfg_root = os.path.join(
        os.path.dirname(__file__), "..", "configs"
    )
    out = str(tmp_path / "m.paax")
    argv = sys.argv
    sys.argv = [
        "export_model.py",
        "--config-file",
        os.path.join(cfg_root, "paa", "paa_R_50_FPN_1x.yaml"),
        "--output", out,
        "--batch", "1", "--height", "64", "--width", "96",
        "MODEL.RESNETS.BACKBONE_OUT_CHANNELS", "64",
        "MODEL.PAA.PRE_NMS_TOP_N", "50",
        "TEST.DETECTIONS_PER_IMG", "10",
    ]
    try:
        export_model.main()
    finally:
        sys.argv = argv
    call, meta = load_exported(out)
    assert meta["config_file"] == "paa_R_50_FPN_1x.yaml"
    det = call(
        jnp.zeros((1, 64, 96, 3)), jnp.asarray([[64.0, 96.0]])
    )
    assert np.asarray(det["boxes"]).shape == (1, 10, 4)
