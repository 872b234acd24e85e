"""Training loop.

Mirrors reference paa_core/engine/trainer.py:38-121: iteration loop with
data/step timing, 20-iteration metric logging with ETA and lr, periodic
checkpointing. TPU redesign: the step is one jitted sharded program per
size bucket (engine/train_step.py); batches are device_put with the data
sharding; loss smoothing reads metrics with a one-step lag to avoid
forcing a device sync every iteration.
"""

from __future__ import annotations

import datetime
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import make_data_loader
from ..solver import make_optimizer
from ..utils.checkpoint import Checkpointer
from ..utils.metric_logger import MetricLogger
from .train_step import TrainState, jit_train_step, make_train_step


def _state_tree(state):
    tree = {"params": state.params, "opt_state": state.opt_state}
    if state.batch_stats is not None:
        tree["batch_stats"] = state.batch_stats
    return tree


def do_train(cfg, model, state, dataset, mesh, checkpointer=None,
             start_iter=0, logger=None, metric_hook=None):
    """Run the training loop.

    metric_hook: optional ``hook(iteration, metrics_dict)`` invoked with
        the one-step-lagged host floats each iteration (tests and the
        overfit gate read loss curves through this without forcing
        device syncs).
    """
    logger = logger or logging.getLogger("paa_tpu.trainer")
    logger.info("Start training")
    meters = MetricLogger()
    max_iter = cfg.SOLVER.MAX_ITER
    checkpoint_period = cfg.SOLVER.CHECKPOINT_PERIOD

    loader = make_data_loader(
        cfg, dataset, is_train=True, start_iter=start_iter
    )
    num_shards = mesh.devices.size

    from ..solver import param_labels

    labels = param_labels(
        state.params, cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT
    )

    # one compiled step per bucket shape; the model provides the step
    # body (dense single-shot heads and two-stage R-CNN expose the same
    # make_bucket_train_step protocol)
    steps = {}

    def get_step(hw):
        if hw not in steps:
            fn = model.make_bucket_train_step(
                hw, param_label_tree=labels, num_shards=num_shards
            )
            steps[hw] = jit_train_step(fn, mesh)
        return steps[hw]

    from jax.sharding import NamedSharding, PartitionSpec as P

    # see jit_train_step: avoid sharding annotations on 1-device meshes
    batch_sharding = (
        NamedSharding(mesh, P("data")) if mesh.devices.size > 1 else None
    )

    # jax.profiler capture window (SURVEY.md §5: the TPU-native
    # replacement for the reference's wall-clock-only Timer objects)
    profile_dir = getattr(cfg.TPU, "PROFILE_DIR", "")
    profile_start = start_iter + cfg.TPU.PROFILE_START
    profile_stop = profile_start + cfg.TPU.PROFILE_STEPS
    profiling = False

    start_time = time.time()
    end = time.time()
    prev_metrics = None
    iteration = start_iter
    for batch in loader:
        data_time = time.time() - end
        iteration += 1

        if profile_dir and iteration == profile_start and not profiling:
            jax.profiler.start_trace(profile_dir)
            profiling = True

        hw = batch["images"].shape[1:3]
        step_fn = get_step(hw)
        if jax.process_count() > 1:
            # each process loaded its slice of the global batch
            # (loader process sharding); assemble the global array
            device_batch = {
                k: jax.make_array_from_process_local_data(
                    batch_sharding, batch[k]
                )
                for k in model.train_batch_keys
                if k in batch
            }
        else:
            device_batch = {
                k: (
                    jax.device_put(batch[k], batch_sharding)
                    if batch_sharding is not None
                    else jnp.asarray(batch[k])
                )
                for k in model.train_batch_keys
                if k in batch
            }
        state, metrics = step_fn(state, device_batch)

        batch_time = time.time() - end
        end = time.time()
        meters.update(time=batch_time, data=data_time)
        if prev_metrics is not None:
            host_metrics = {k: float(v) for k, v in prev_metrics.items()}
            meters.update(**host_metrics)
            # per-step numeric guard (reference asserts non-NaN inside
            # the loss every step, rpn/paa/loss.py:307) — on the lagged
            # host copy, so it costs no extra device sync
            loss_val = host_metrics.get("loss")
            if loss_val is not None and not np.isfinite(loss_val):
                raise FloatingPointError(
                    f"non-finite training loss {loss_val} at iteration "
                    f"{iteration - 1}: {host_metrics}"
                )
            if metric_hook is not None:
                metric_hook(iteration - 1, host_metrics)
        prev_metrics = metrics

        if iteration % 20 == 0 or iteration == max_iter:
            eta_seconds = meters.meters["time"].global_avg * (
                max_iter - iteration
            )
            eta = str(datetime.timedelta(seconds=int(eta_seconds)))
            logger.info(
                f"eta: {eta}  iter: {iteration}  {meters}"
            )
        if profiling and iteration >= profile_stop:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            profiling = False
            logger.info(f"profiler trace written to {profile_dir}")
        if checkpointer and iteration % checkpoint_period == 0:
            checkpointer.save(
                f"model_{iteration:07d}",
                jax.device_get(_state_tree(state)),
                iteration=iteration,
            )
        if iteration >= max_iter:
            break

    if profiling:
        jax.profiler.stop_trace()
    if checkpointer:
        checkpointer.save(
            "model_final",
            jax.device_get(_state_tree(state)),
            iteration=iteration,
        )
    total = time.time() - start_time
    logger.info(
        f"Total training time: {datetime.timedelta(seconds=int(total))} "
        f"({total / max(max_iter - start_iter, 1):.4f} s/it)"
    )
    return state
