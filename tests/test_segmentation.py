"""SegmentationMask container (reference
paa_core/structures/segmentation_mask.py + tests/test_segmentation_mask.py
consistency checks on the same two-polygon fixture)."""

import numpy as np
import pytest

from paa_tpu.structures.segmentation import (
    FLIP_LEFT_RIGHT,
    FLIP_TOP_BOTTOM,
    SegmentationMask,
)

POLY = [[
    [423.0, 306.5, 406.5, 277.0, 400.0, 271.5, 389.5, 277.0,
     387.5, 292.0, 384.5, 295.0, 374.5, 220.0, 378.5, 210.0,
     391.0, 200.5, 404.0, 199.5, 414.0, 203.5, 425.5, 221.0,
     438.5, 297.0, 423.0, 306.5],
    [100, 100, 200, 100, 200, 200, 100, 200],
]]
SIZE = (640, 480)  # (w, h)


@pytest.fixture(scope="module")
def P():
    return SegmentationMask(POLY, SIZE, "poly")


@pytest.fixture(scope="module")
def M(P):
    return P.convert("mask")


def _l1(a, b):
    return np.abs(
        a.get_mask_tensor().astype(np.float64)
        - b.get_mask_tensor().astype(np.float64)
    ).sum()


def test_convert_roundtrip(P, M):
    # poly -> mask -> poly -> mask stays close (reference tolerance 8169
    # on this fixture; contours discretize the diagonal edges)
    P_hat = P.convert("mask").convert("poly")
    assert _l1(P, P_hat) <= 8169.0
    assert M.get_mask_tensor().sum() > 0


def test_crop(P, M):
    box = [100, 100, 399, 399]  # xyxy
    diff = _l1(P.crop(box), M.crop(box))
    assert diff <= 1.0e4
    # reference crop semantics: exclusive max -> size 299x299 both
    assert P.crop(box).size == (299.0, 299.0)
    assert M.crop(box).size == (299, 299)


def test_resize(P, M):
    new_size = (320, 240)
    p2, m2 = P.resize(new_size), M.resize(new_size)
    assert p2.size == new_size and m2.size == new_size
    area_ratio = (
        p2.get_mask_tensor().astype(np.float64).sum()
        / P.get_mask_tensor().astype(np.float64).sum()
    )
    assert 0.2 < area_ratio < 0.3  # ~1/4 after half-scaling


def test_transpose(P, M):
    for method in (FLIP_LEFT_RIGHT, FLIP_TOP_BOTTOM):
        diff = _l1(P.transpose(method), M.transpose(method))
        assert diff <= 5.0e4
        # double flip is identity on masks
        mm = M.transpose(method).transpose(method)
        np.testing.assert_array_equal(
            mm.get_mask_tensor(), M.get_mask_tensor()
        )


def test_indexing_and_iter(P):
    both = SegmentationMask(POLY + POLY, SIZE, "poly")
    assert len(both) == 2
    assert len(both[0]) == 1
    assert len(both[[0, 1]]) == 2
    assert len(both[np.array([True, False])]) == 1
    assert sum(1 for _ in both) == 2
    m = both.convert("mask")
    assert m.instances.masks.shape == (2, 480, 640)
    assert len(m[np.array([1])]) == 1
