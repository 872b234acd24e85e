"""SyncBatchNorm (MODEL.USE_SYNCBN): global-batch statistics under a
sharded mesh (the reference's torch.nn.SyncBatchNorm conversion,
tools/train_net.py:35-38)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from paa_tpu.modeling.layers import SyncBatchNorm


def _init(rng, x):
    m = SyncBatchNorm(features=x.shape[-1])
    return m, m.init(rng, x)


def test_train_mode_uses_batch_stats_and_updates_running():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(2.0, 3.0, (8, 4, 4, 6)).astype(np.float32))
    m, variables = _init(jax.random.PRNGKey(0), x)

    y, mutated = m.apply(variables, x, mutable=["batch_stats"])
    # batch-normalized output: ~zero mean, unit var per channel
    ym = np.asarray(y).reshape(-1, 6)
    np.testing.assert_allclose(ym.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(ym.var(0), 1.0, atol=1e-2)
    # running stats moved toward the batch stats (momentum 0.9)
    new_mean = np.asarray(
        jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    )
    assert np.abs(new_mean).max() > 0.05


def test_eval_mode_uses_running_stats():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(0, 1, (4, 2, 2, 3)).astype(np.float32))
    m, variables = _init(jax.random.PRNGKey(0), x)
    # eval with identity running stats: y = (x - 0) / sqrt(1 + eps)
    y = m.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x) / np.sqrt(1 + 1e-5), rtol=1e-5
    )


def test_stats_are_global_across_shards():
    """pjit over an 8-device data-sharded batch must produce the same
    output as the unsharded computation — the 'sync' in SyncBN."""
    rng = np.random.RandomState(2)
    # per-shard distributions differ wildly: unsynced BN would diverge
    x_np = np.concatenate(
        [
            rng.normal(loc=i * 3.0, scale=i + 1.0, size=(1, 4, 4, 6))
            for i in range(8)
        ]
    ).astype(np.float32)
    x = jnp.asarray(x_np)
    m, variables = _init(jax.random.PRNGKey(0), x)

    y_ref, _ = m.apply(variables, x, mutable=["batch_stats"])

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def fwd(v, xx):
        return m.apply(v, xx, mutable=["batch_stats"])

    y_sharded, mutated = fwd(variables, xs)
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_ref), rtol=1e-4, atol=1e-4
    )


def test_syncbn_model_train_step():
    """USE_SYNCBN=True end-to-end: one train step updates batch_stats."""
    from paa_tpu.config import get_cfg
    from paa_tpu.engine import TrainState, jit_train_step
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.solver import make_optimizer
    from jax.sharding import Mesh

    cfg = get_cfg()
    cfg.MODEL.PAA_ON = True
    cfg.MODEL.RPN_ONLY = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = False
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 64
    cfg.MODEL.PAA.NUM_CONVS = 1
    cfg.MODEL.USE_SYNCBN = True
    cfg.TPU.GMM_ITERS = 4
    model = build_detection_model(cfg)
    hw = (64, 96)
    variables = model.init(jax.random.PRNGKey(0), hw)
    assert "batch_stats" in variables, "SyncBN stats collection missing"
    tx, labels = make_optimizer(cfg, variables["params"])
    state = TrainState.create(
        model.module.apply, variables["params"], tx,
        batch_stats=variables["batch_stats"],
    )
    step_fn = model.make_bucket_train_step(hw, param_label_tree=labels)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    step = jit_train_step(step_fn, mesh)
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(
            rng.uniform(-1, 1, (2, *hw, 3)).astype(np.float32)
        ),
        "gt_boxes": jnp.asarray(
            [[[5, 8, 40, 50], [20, 15, 60, 60]]] * 2, jnp.float32
        ),
        "gt_labels": jnp.asarray([[3, 7]] * 2, jnp.int32),
    }
    # snapshot before stepping: jit_train_step donates the state buffers
    before = np.asarray(
        jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    ).copy()
    new_state, metrics = step(state, batch)
    assert all(np.isfinite(float(v)) for v in metrics.values())
    after = np.asarray(
        jax.tree_util.tree_leaves(new_state.batch_stats)[0]
    )
    assert not np.allclose(before, after)
