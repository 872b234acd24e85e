"""On-device uint8 normalization (ops/image_norm.py, TPU.DEVICE_NORMALIZE).

The input contract change of round 5: the loader ships RAW padded uint8
batches (4x less host->device traffic — on the tunneled bench host,
float32 H2D was 20.8 s of a 24 s TTA batch) and every jitted entry
point (train step / eval fn / TTA fn) normalizes + re-zeroes padding on
device, dispatching on images.dtype at trace time. These tests pin the
BIT-EXACT equivalence against the host-normalized float32 path, which
itself matches the reference's Normalize-then-zero-pad order
(paa_core/data/transforms/transforms.py Normalize,
structures/image_list.py:54-61 to_image_list).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paa_tpu.config import get_cfg
from paa_tpu.data.loader import make_batch
from paa_tpu.modeling import build_detection_model
from paa_tpu.ops.image_norm import device_normalize, maybe_device_normalize

MEAN = [102.9801, 115.9465, 122.7717]
STD = [1.0, 1.0, 1.0]


def _samples(rng, sizes):
    return [
        {
            "image": rng.randint(0, 256, (h, w, 3), np.uint8),
            "boxes": np.zeros((0, 4), np.float32),
            "labels": np.zeros((0,), np.int64),
            "image_id": i + 1,
            "orig_size": (h, w),
        }
        for i, (h, w) in enumerate(sizes)
    ]


def test_device_normalize_bit_exact_vs_host_path():
    rng = np.random.RandomState(0)
    samples = _samples(rng, [(37, 51), (64, 64), (20, 33)])
    host = make_batch(samples, (64, 64), max_gt=4, normalize=(MEAN, STD))
    dev = make_batch(
        samples, (64, 64), max_gt=4, device_normalize=True
    )
    assert dev["images"].dtype == np.uint8
    out = np.asarray(
        device_normalize(
            jnp.asarray(dev["images"]),
            jnp.asarray(dev["image_sizes"]),
            MEAN, STD,
        )
    )
    np.testing.assert_array_equal(out, host["images"])


def test_device_normalize_nonunit_std_bit_exact():
    rng = np.random.RandomState(1)
    std = [57.375, 57.12, 58.395]
    samples = _samples(rng, [(16, 24), (24, 16)])
    host = make_batch(samples, (24, 24), max_gt=4, normalize=(MEAN, std))
    dev = make_batch(samples, (24, 24), max_gt=4, device_normalize=True)
    out = np.asarray(
        device_normalize(
            jnp.asarray(dev["images"]),
            jnp.asarray(dev["image_sizes"]),
            MEAN, std,
        )
    )
    np.testing.assert_array_equal(out, host["images"])


def test_padding_is_rezeroed_not_minus_mean():
    img = np.full((4, 4, 3), 255, np.uint8)
    batch = np.zeros((1, 8, 8, 3), np.uint8)
    batch[0, :4, :4] = img
    out = np.asarray(
        device_normalize(
            jnp.asarray(batch),
            jnp.asarray([[4.0, 4.0]], np.float32),
            MEAN, STD,
        )
    )
    assert np.all(out[0, 4:] == 0.0) and np.all(out[0, :, 4:] == 0.0)
    np.testing.assert_allclose(
        out[0, 0, 0], 255.0 - np.asarray(MEAN, np.float32)
    )


def test_float32_passthrough():
    x = jnp.ones((1, 4, 4, 3), jnp.float32)
    assert maybe_device_normalize(x, None, MEAN, STD) is x


def _tiny_cfg():
    cfg = get_cfg()
    cfg.MODEL.PAA_ON = True
    cfg.MODEL.RPN_ONLY = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = False
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 64
    cfg.MODEL.PAA.PRE_NMS_TOP_N = 50
    cfg.TEST.DETECTIONS_PER_IMG = 10
    cfg.TEST.IMS_PER_BATCH = 2
    cfg.freeze()
    return cfg


def test_eval_fn_uint8_equals_host_normalized_f32():
    cfg = _tiny_cfg()
    model = build_detection_model(cfg)
    hw = (64, 96)
    variables = model.init(jax.random.PRNGKey(0), hw)

    rng = np.random.RandomState(2)
    samples = _samples(rng, [(60, 96), (48, 72)])
    host = make_batch(
        samples, hw, max_gt=4,
        normalize=(cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD),
    )
    dev = make_batch(samples, hw, max_gt=4, device_normalize=True)

    fn = model.make_eval_fn(variables)
    det_f32 = jax.tree_util.tree_map(
        np.asarray,
        fn(jnp.asarray(host["images"]), jnp.asarray(host["image_sizes"])),
    )
    det_u8 = jax.tree_util.tree_map(
        np.asarray,
        fn(jnp.asarray(dev["images"]), jnp.asarray(dev["image_sizes"])),
    )
    for k in det_f32:
        np.testing.assert_array_equal(det_u8[k], det_f32[k], err_msg=k)


def test_train_step_uint8_equals_host_normalized_f32():
    cfg = _tiny_cfg()
    model = build_detection_model(cfg)
    hw = (64, 96)
    variables = model.init(jax.random.PRNGKey(0), hw)

    from paa_tpu.engine.train_step import TrainState
    from paa_tpu.solver import make_optimizer

    params = variables["params"]
    tx, labels = make_optimizer(cfg, params)

    rng = np.random.RandomState(3)
    samples = _samples(rng, [(60, 96), (48, 72)])
    for s in samples:
        s["boxes"] = np.asarray(
            [[5.0, 8.0, 40.0, 30.0], [20.0, 12.0, 60.0, 44.0]], np.float32
        )
        s["labels"] = np.asarray([3, 7], np.int64)
    host = make_batch(
        samples, hw, max_gt=4,
        normalize=(cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD),
    )
    dev = make_batch(samples, hw, max_gt=4, device_normalize=True)

    step = jax.jit(model.make_bucket_train_step(hw))

    def run(batch):
        state = TrainState.create(model.module.apply, params, tx)
        new_state, metrics = step(
            state,
            {
                k: jnp.asarray(batch[k])
                for k in model.train_batch_keys
            },
        )
        return new_state, metrics

    s_f32, m_f32 = run(host)
    s_u8, m_u8 = run(dev)
    for k in m_f32:
        np.testing.assert_array_equal(
            np.asarray(m_u8[k]), np.asarray(m_f32[k]), err_msg=k
        )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        s_u8.params,
        s_f32.params,
    )
