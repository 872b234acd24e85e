"""Anchor generation golden tests.

Cell-anchor goldens are the Shaoqing-Ren matlab values quoted in the
reference source (paa_core/modeling/rpn/anchor_generator.py:238-263).
"""

import numpy as np

from paa_tpu.config import get_cfg
from paa_tpu.modeling.anchors import (
    AnchorGenerator,
    expand_octave_sizes,
    generate_cell_anchors,
    grid_anchors,
    make_anchor_generator_paa,
)

# The classic matlab anchors, shifted by the reference's -0.5 base-window
# offset (_generate_anchors uses [1,1,s,s]-0.5 rather than Detectron's -1;
# anchor_generator.py:284), which is what the reference actually computes.
MATLAB_GOLDEN = np.array(
    [
        [-83.0, -39.0, 100.0, 56.0],
        [-175.0, -87.0, 192.0, 104.0],
        [-359.0, -183.0, 376.0, 200.0],
        [-55.0, -55.0, 72.0, 72.0],
        [-119.0, -119.0, 136.0, 136.0],
        [-247.0, -247.0, 264.0, 264.0],
        [-35.0, -79.0, 52.0, 96.0],
        [-79.0, -167.0, 96.0, 184.0],
        [-167.0, -343.0, 184.0, 360.0],
    ],
    dtype=np.float32,
) - 0.5


def test_cell_anchors_matlab_golden():
    anchors = generate_cell_anchors(
        stride=16, sizes=(128, 256, 512), aspect_ratios=(0.5, 1.0, 2.0)
    )
    np.testing.assert_allclose(anchors, MATLAB_GOLDEN, atol=1e-6)


def test_paa_cell_anchor_geometry():
    # PAA default: one square anchor per location of size 8*stride,
    # centered on (stride-1)/2.
    cell = generate_cell_anchors(stride=8, sizes=(64,), aspect_ratios=(1.0,))
    assert cell.shape == (1, 4)
    w = cell[0, 2] - cell[0, 0] + 1
    h = cell[0, 3] - cell[0, 1] + 1
    assert w == 64 and h == 64
    cx = (cell[0, 0] + cell[0, 2]) / 2
    assert cx == 4.0  # center of the [0.5, 8.5) base window


def test_grid_anchor_layout():
    cell = generate_cell_anchors(stride=8, sizes=(64,), aspect_ratios=(1.0,))
    anchors = grid_anchors((2, 3), 8, cell)
    assert anchors.shape == (6, 4)
    # Row-major over (y, x): second anchor shifted by stride in x.
    np.testing.assert_allclose(anchors[1] - anchors[0], [8, 0, 8, 0])
    np.testing.assert_allclose(anchors[3] - anchors[0], [0, 8, 0, 8])


def test_octave_expansion():
    sizes = expand_octave_sizes((32, 64), 2.0, 3)
    assert len(sizes) == 2
    np.testing.assert_allclose(
        sizes[0], (32, 32 * 2 ** (1 / 3), 32 * 2 ** (2 / 3)), rtol=1e-6
    )


def test_paa_generator_from_cfg():
    cfg = get_cfg()
    gen = make_anchor_generator_paa(cfg)
    # paa default: 5 levels, 1 anchor/location
    assert gen.num_anchors_per_location == 1
    # feature shapes for an 800x1216 padded input with strides 8..128
    shapes = [(100, 152), (50, 76), (25, 38), (13, 19), (7, 10)]
    flat, counts = gen(shapes)
    assert counts == [15200, 3800, 950, 247, 70]
    assert flat.shape == (sum(counts), 4)
    # caching returns the same object
    flat2, _ = gen(shapes)
    assert flat is flat2
