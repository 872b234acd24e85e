"""Overfit-convergence gate (VERDICT r2 item 3): the TPU-native
analogue of the reference's quick_schedules + check_expected_results
regression (configs/quick_schedules/*, coco_eval.py:403).

Trains flagship PAA through the REAL pipeline (bucketed loader,
do_train, full inference + from-scratch COCOeval) on 8 synthetic
class-colored-rectangle images and asserts the loss collapses AND
self-eval AP reaches ~1.0 — proving the vectorized GMM assignment
actually LEARNS, not just runs. Deterministic (seeded everywhere).

Measured trajectory on the 8-CPU-device mesh (LR 0.02): loss
2.59 -> 1.18 @150 -> 0.80 @500 -> 0.16 @1500, AP50 0.19 -> 0.59 -> 1.0.
Wall clock ~35 min, hence the slow mark; tools/quick_overfit.py runs
the same gate from the CLI.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)


@pytest.mark.slow
def test_overfit_converges(tmp_path):
    from quick_overfit import run

    r = run(1500, str(tmp_path))
    assert r["first_loss"] > 1.5, r  # starts untrained
    assert r["final_loss"] < 0.35, r
    assert r["ap50"] >= 0.95, r
    assert r["ap"] >= 0.85, r
