"""FBNet / ChamNet backbone family (reference
paa_core/modeling/backbone/fbnet*.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paa_tpu.modeling.fbnet import (
    FBNET_ARCHS,
    FBNetStages,
    FBNetTrunk,
    divisible_width,
    expanded_blocks,
    fbnet_out_channels,
    fbnet_trunk_stride,
)


def test_divisible_width_matches_reference_rule():
    # fbnet_builder._get_divisible_by(num, d, d) oracle values:
    # divisible passes through; else py2-round(num/d)*d; 0 -> d*d quirk
    assert divisible_width(96, 8) == 96
    assert divisible_width(100, 8) == 104   # round(12.5) = 13 in py2
    assert divisible_width(12, 8) == 16     # round(1.5) = 2 in py2
    assert divisible_width(13, 8) == 16
    assert divisible_width(3, 8) == 64      # round->0 'or min_val' quirk
    assert divisible_width(100, 1) == 100


def test_expansion_counts_match_reference_op_tables():
    # block counts per role must match the reference block_op_type rows
    d = FBNET_ARCHS["default"]
    assert len(expanded_blocks(d, "backbone")) == 1 + 2 + 3 + 7
    assert len(expanded_blocks(d, "rpn")) == 3
    assert len(expanded_blocks(d, "bbox")) == 4
    assert len(expanded_blocks(d, "mask")) == 5
    c = FBNET_ARCHS["cham_v1a"]
    assert len(expanded_blocks(c, "backbone")) == 1 + 2 + 5 + 12
    ops = [b[0] for b in expanded_blocks(c, "backbone")]
    assert ops[:1] == ["ir_k3"]
    assert ops[1:3] == ["ir_k7"] * 2
    assert ops[8:15] == ["ir_k5"] * 7  # stage 3 first group
    # strides: only the first repeat of each group strides
    strides = [b[3] for b in expanded_blocks(d, "backbone")]
    assert strides == [1, 2, 1, 2, 1, 1, 2, 1, 1, 1, 1, 1, 1]


@pytest.mark.parametrize("arch", sorted(FBNET_ARCHS))
def test_trunk_builds_and_strides(arch):
    trunk = FBNetTrunk(arch=arch)
    x = jnp.zeros((1, 64, 64, 3))
    variables = trunk.init(jax.random.PRNGKey(0), x)
    (y,) = trunk.apply(variables, x)
    s = fbnet_trunk_stride(arch)
    assert s == 16
    assert y.shape == (1, 64 // s, 64 // s,
                       fbnet_out_channels(arch, "backbone"))
    assert np.isfinite(np.asarray(y)).all()


def test_head_stages_build():
    # rpn/bbox stages run on trunk output (incl. upsampling mask heads)
    arch = "xirb16d_dsmask"
    trunk = FBNetTrunk(arch=arch)
    x = jnp.zeros((1, 64, 64, 3))
    tv = trunk.init(jax.random.PRNGKey(0), x)
    (feat,) = trunk.apply(tv, x)

    for role, expect_hw in [("rpn", 4), ("bbox", 2), ("mask", 8)]:
        stages = FBNetStages(
            blocks=tuple(expanded_blocks(FBNET_ARCHS[arch], role))
        )
        sv = stages.init(jax.random.PRNGKey(1), feat)
        out = stages.apply(sv, feat)
        assert out.shape[1] == expect_hw, (role, out.shape)
        assert out.shape[-1] == fbnet_out_channels(arch, role)


def test_width_scaling():
    y_ch = fbnet_out_channels("default", "backbone",
                              width_ratio=0.5, width_divisor=8)
    assert y_ch == divisible_width(int(96 * 0.5), 8)
    trunk = FBNetTrunk(arch="mobilenet_v2", width_ratio=0.5,
                       width_divisor=8)
    x = jnp.zeros((1, 32, 32, 3))
    v = trunk.init(jax.random.PRNGKey(0), x)
    (y,) = trunk.apply(v, x)
    assert y.shape[-1] == fbnet_out_channels(
        "mobilenet_v2", "backbone", 0.5, 8
    )
