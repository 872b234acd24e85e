"""Dry-run of the AP-gate runbook (tools/reproduce_ap.py) on synthetic
data: the day COCO minival + released weights are mounted, the gate must
work on the first try, so every mechanism it chains — torch-.pth
import, dataset resolution, bucketed eval, COCO AP, the
expected-results assertion, and the exit codes — is executed here
end-to-end against a tiny on-disk COCO dataset and a randomized
reference-format torch checkpoint.

Gate semantics under test (reference coco_eval.py:403 +
/root/reference/README.md:42): exit 0 when AP falls inside
expected +/- tol, exit 1 when outside, exit 2 on missing inputs.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

import ref_torch

pytestmark = pytest.mark.slow

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "reproduce_ap", os.path.join(TOOLS, "reproduce_ap.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tiny_coco80(tmp_path_factory):
    """Synthetic COCO with the real 80-category layout (non-contiguous
    json ids, as in actual COCO) so the production config's
    NUM_CLASSES=81 applies unchanged."""
    import cv2

    root = tmp_path_factory.mktemp("coco_ap_gate")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(7)
    # real-COCO-style sparse category ids (1..90 with gaps)
    cat_ids = [i for i in range(1, 91) if i not in
               (12, 26, 29, 30, 45, 66, 68, 69, 71, 83)]
    assert len(cat_ids) == 80
    images, annotations = [], []
    ann_id = 1
    for i in range(4):
        w, h = (96, 64) if i % 2 == 0 else (64, 96)
        name = f"img{i}.jpg"
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        x, y, bw, bh = 8, 8, 28, 22
        arr[y:y + bh, x:x + bw] = 255
        cv2.imwrite(str(img_dir / name), arr)
        images.append(dict(id=i + 1, file_name=name, width=w, height=h))
        annotations.append(
            dict(id=ann_id, image_id=i + 1, bbox=[x, y, bw, bh],
                 area=bw * bh, category_id=cat_ids[i * 7], iscrowd=0)
        )
        ann_id += 1
    categories = [dict(id=c, name=f"cat{c}") for c in cat_ids]
    ann_file = root / "instances.json"
    ann_file.write_text(json.dumps(dict(
        images=images, annotations=annotations, categories=categories
    )))
    return str(ann_file), str(img_dir)


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    """Randomized reference-model state dict saved the way released
    checkpoints are shipped ({'model': state_dict} torch pickle)."""
    import torch

    model, _ = ref_torch.build_reference_model()
    state = ref_torch.randomize_state_dict(model, seed=5)
    path = tmp_path_factory.mktemp("weights") / "PAA_R_50_FPN_1x.pth"
    torch.save(
        {"model": {k: torch.as_tensor(v) for k, v in state.items()}},
        str(path),
    )
    return str(path)


# small-image overrides: the gate itself is config-agnostic; tiny
# buckets keep the CPU compile tractable
OPTS = [
    "INPUT.MIN_SIZE_TEST", "64",
    "INPUT.MAX_SIZE_TEST", "96",
    "TPU.TEST_BUCKETS", "((64, 96), (96, 64))",
    "TEST.IMS_PER_BATCH", "2",
]


def _run_main(mod, argv):
    old = sys.argv
    sys.argv = ["reproduce_ap.py"] + argv
    try:
        return mod.main()
    finally:
        sys.argv = old


@pytest.mark.skipif(
    not ref_torch.reference_available(), reason="reference not present"
)
def test_gate_pass_fail_and_setup_errors(tiny_coco80, torch_ckpt,
                                         tmp_path):
    ann_file, img_dir = tiny_coco80
    mod = _load_tool()

    # ---- exit 2: missing weights --------------------------------------
    rc = _run_main(mod, [
        "--weights", str(tmp_path / "nope.pth"),
        "--ann-file", ann_file, "--img-dir", img_dir,
        "--output-dir", str(tmp_path / "o2"), *OPTS,
    ])
    assert rc == 2

    # ---- exit 2: --ann-file without --img-dir -------------------------
    rc = _run_main(mod, [
        "--weights", torch_ckpt, "--ann-file", ann_file,
        "--output-dir", str(tmp_path / "o2b"), *OPTS,
    ])
    assert rc == 2

    # ---- exit 1: the real 40.4 gate must FAIL on random weights -------
    rc = _run_main(mod, [
        "--weights", torch_ckpt,
        "--ann-file", ann_file, "--img-dir", img_dir,
        "--output-dir", str(tmp_path / "o1"), *OPTS,
    ])
    assert rc == 1

    # ---- exit 0: same run with a tolerance that admits the random AP --
    out0 = tmp_path / "o0"
    rc = _run_main(mod, [
        "--weights", torch_ckpt,
        "--ann-file", ann_file, "--img-dir", img_dir,
        "--expected", "0.0", "--tol", "1.5",
        "--output-dir", str(out0), *OPTS,
    ])
    assert rc == 0
    # eval artifacts written through the production inference path
    results_json = out0 / "inference" / "custom" / "coco_results.json"
    assert results_json.exists()
    results = json.loads(results_json.read_text())
    assert "AP" in results


@pytest.mark.skipif(
    not ref_torch.reference_available(), reason="reference not present"
)
def test_gate_resolves_catalog_data_dir(tiny_coco80, torch_ckpt,
                                        tmp_path, monkeypatch):
    """--data must route through the DatasetCatalog exactly as a mounted
    COCO tree would: build the minival directory layout and run the
    default cfg.DATASETS.TEST resolution."""
    ann_file, img_dir = tiny_coco80
    data_root = tmp_path / "datasets"
    coco = data_root / "coco"
    (coco / "annotations").mkdir(parents=True)
    # the production config evaluates coco_2017_val (the 5k val2017
    # split — the minival-equivalent the README's 40.4 refers to)
    os.symlink(img_dir, str(coco / "val2017"))
    os.symlink(
        ann_file, str(coco / "annotations" / "instances_val2017.json")
    )
    monkeypatch.delenv("PAA_TPU_DATA_DIR", raising=False)

    mod = _load_tool()
    rc = _run_main(mod, [
        "--weights", torch_ckpt, "--data", str(data_root),
        "--expected", "0.0", "--tol", "1.5",
        "--output-dir", str(tmp_path / "out"), *OPTS,
    ])
    assert rc == 0
    assert (tmp_path / "out" / "inference" / "coco_2017_val"
            / "coco_results.json").exists()
