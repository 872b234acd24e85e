"""Shard-count invariance: one train step on the same global batch must
produce the same loss and the same updated parameters on a 1-device and
an 8-device data mesh.

This is the property that makes the global-sum loss formulation (plain
jnp.sum IS the cross-replica reduction under pjit; paa_loss.py) a faithful
replacement for the reference's per-GPU losses + DDP gradient averaging +
reduce_sum(#pos) normalization (paa_core/modeling/rpn/paa/loss.py:22-28,
317-322). The reference's math reduces to global_sum / max(total_pos,
num_gpus), so with total_pos >= num_shards the result is shard-count
independent.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from paa_tpu.config import get_cfg
from paa_tpu.engine import TrainState, jit_train_step, make_train_step
from paa_tpu.modeling import build_detection_model
from paa_tpu.modeling.paa_loss import PAALossConfig
from paa_tpu.solver import make_optimizer

HW = (64, 96)


def _setup():
    cfg = get_cfg()
    cfg.MODEL.PAA_ON = True
    cfg.MODEL.RPN_ONLY = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = False
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 64
    cfg.MODEL.PAA.NUM_CONVS = 1
    cfg.TPU.GMM_ITERS = 8
    model = build_detection_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), HW)
    params = variables["params"]
    tx, labels = make_optimizer(cfg, params)
    anchors, counts = model.anchors_for(HW)
    return cfg, model, params, tx, labels, anchors, counts


def _batch(b=8):
    rng = np.random.RandomState(0)
    return {
        "images": jnp.asarray(
            rng.uniform(-1, 1, (b, *HW, 3)).astype(np.float32)
        ),
        "gt_boxes": jnp.asarray(
            np.stack(
                [
                    np.array(
                        [[5 + i, 8, 40 + i, 50], [20, 15 + i, 70, 60]],
                        np.float32,
                    )
                    for i in range(b)
                ]
            )
        ),
        "gt_labels": jnp.asarray(
            np.tile(np.array([[3, 7]], np.int32), (b, 1))
        ),
    }


def test_train_step_shard_invariance():
    cfg, model, params, tx, labels, anchors, counts = _setup()
    batch = _batch(8)
    results = {}
    for n in (1, 8):
        # fresh copies: jit_train_step donates the state buffers
        params_n = jax.tree_util.tree_map(jnp.array, params)
        state = TrainState.create(model.module.apply, params_n, tx)
        step_fn = make_train_step(
            model.module.apply, anchors, counts,
            PAALossConfig.from_cfg(cfg),
            param_label_tree=labels, num_shards=n, donate=False,
        )
        mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
        step = jit_train_step(step_fn, mesh)
        new_state, metrics = step(state, batch)
        results[n] = (
            jax.tree_util.tree_map(np.asarray, new_state.params),
            {k: float(v) for k, v in metrics.items()},
        )

    p1, m1 = results[1]
    p8, m8 = results[8]
    assert m1["num_pos"] == m8["num_pos"]
    for k in m1:
        np.testing.assert_allclose(
            m1[k], m8[k], rtol=1e-4, atol=1e-6, err_msg=f"metric {k}"
        )

    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(p8))
    # tree_leaves_with_path returns list of (path, leaf); compare pairwise
    flat8 = {jax.tree_util.keystr(kp): v
             for kp, v in jax.tree_util.tree_leaves_with_path(p8)}
    for kp, v1 in flat1:
        key = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(
            v1, flat8[key], rtol=1e-4, atol=1e-6,
            err_msg=f"param {key} differs between 1- and 8-device meshes",
        )
