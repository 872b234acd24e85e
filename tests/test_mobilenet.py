import numpy as np
import jax
import jax.numpy as jnp

from paa_tpu.modeling.mobilenet import MobileNetV2


def test_mnv2_feature_pyramid():
    m = MobileNetV2()
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    assert len(feats) == 4
    # strides 4, 8, 16, 32 with channels 24, 32, 96, 320
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]
    assert [f.shape[-1] for f in feats] == [24, 32, 96, 320]
    assert MobileNetV2.feature_channels() == (24, 32, 96, 320)
