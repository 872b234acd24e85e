"""Utility tests: metric logger smoothing (reference
tests/test_metric_logger.py), checkpoint save/load roundtrip with pointer
file (reference tests/checkpoint.py), registry semantics."""
import os

import numpy as np
import pytest

from paa_tpu.utils.metric_logger import MetricLogger, SmoothedValue
from paa_tpu.utils.registry import Registry


def test_smoothed_value_window():
    v = SmoothedValue(window_size=4)
    for x in [1, 2, 3, 4, 5, 6]:
        v.update(x)
    # window holds [3,4,5,6]
    assert v.median == 4.5
    assert v.avg == 4.5
    assert v.global_avg == 21 / 6


def test_metric_logger():
    m = MetricLogger()
    for i in range(25):
        m.update(loss=float(i), other=1.0)
    assert m.loss.count == 25
    assert m.other.global_avg == 1.0
    s = str(m)
    assert "loss" in s and "other" in s
    with pytest.raises(AttributeError):
        m.nonexistent


def test_registry():
    r = Registry()

    @r.register("a")
    def fn_a():
        return 1

    r.register("b", lambda: 2)
    assert r["a"]() == 1
    assert r["b"]() == 2
    with pytest.raises(AssertionError):
        r.register("a", lambda: 3)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from paa_tpu.utils.checkpoint import Checkpointer

    ckpt = Checkpointer(str(tmp_path))
    tree = {
        "params": {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3)}},
        "opt_state": {"momentum": jnp.ones((2, 3))},
    }
    ckpt.save("model_0000005", tree, iteration=5)
    assert ckpt.has_checkpoint()
    assert ckpt.get_checkpoint_file() == "model_0000005"

    template = {
        "params": {"layer": {"kernel": jnp.zeros((2, 3))}},
        "opt_state": {"momentum": jnp.zeros((2, 3))},
    }
    restored, extra = ckpt.load(None, template)
    assert extra["iteration"] == 5
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["layer"]["kernel"]),
        np.arange(6.0).reshape(2, 3),
    )

    # fresh dir: no checkpoint -> (None, {})
    ckpt2 = Checkpointer(str(tmp_path / "empty"))
    restored2, extra2 = ckpt2.load(None, template)
    assert restored2 is None and extra2 == {}


def test_expected_results_check():
    from paa_tpu.evaluation.coco_eval import check_expected_results

    results = {"AP": 0.404}
    check_expected_results(results, [["bbox", "AP", 0.40, 0.005]], 4)
    with pytest.raises(AssertionError):
        check_expected_results(results, [["bbox", "AP", 0.30, 0.005]], 4)


def test_watcher_tb_scalars(tmp_path):
    """The eval-dir watcher mirrors reference test_net.py:140-143:
    '{dataset}_{metric}' TensorBoard scalars at the checkpoint's
    iteration (parsed from the model_<N> name)."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    import test_net as test_net_cli

    assert test_net_cli._ckpt_iteration("/x/model_0025000") == 25000
    assert test_net_cli._ckpt_iteration("/x/model_0025000.pth") == 25000
    assert test_net_cli._ckpt_iteration("/x/final") == 0

    out = tmp_path / "tb"
    test_net_cli._write_tb_scalars(
        str(out), ["coco_2017_val"], [{"AP": 0.404, "AP50": 0.58}], 25000
    )
    events = list(out.glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0
