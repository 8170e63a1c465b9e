"""BFP / HRFPN / NAS-FPN / CARAFE necks: shapes + semantic checks."""
import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.models.necks.extra_necks import (BFP, CARAFE, FPN_CARAFE, HRFPN,
                                             NASFPN)
from ld_tpu.utils.registry import NECKS

RNG = jax.random.PRNGKey(0)


def _pyramid(c=16, base=32, levels=5, channels=None):
    chs = channels or [c] * levels
    return tuple(
        jax.random.normal(jax.random.PRNGKey(i),
                          (1, base // 2**i, base // 2**i, chs[i]))
        for i in range(levels))


def test_bfp_identity_residual_shapes():
    inputs = _pyramid(c=16)
    neck = BFP(in_channels=16, num_levels=5, refine_level=2,
               refine_type='conv')
    vars_ = neck.init(RNG, inputs)
    outs = neck.apply(vars_, inputs)
    assert len(outs) == 5
    for o, x in zip(outs, inputs):
        assert o.shape == x.shape
    # residual structure: zero refine-conv weights -> bsf becomes 0 and
    # every output equals its input exactly
    z = jax.tree_util.tree_map(jnp.zeros_like, vars_)
    outs0 = neck.apply(z, inputs)
    np.testing.assert_allclose(np.asarray(outs0[2]), np.asarray(inputs[2]),
                               rtol=1e-5)


def test_bfp_non_local():
    inputs = _pyramid(c=8, base=16, levels=3)
    neck = BFP(in_channels=8, num_levels=3, refine_level=1,
               refine_type='non_local')
    vars_ = neck.init(RNG, inputs)
    outs = neck.apply(vars_, inputs)
    assert [o.shape for o in outs] == [x.shape for x in inputs]


def test_hrfpn_shapes():
    # HRNet-style inputs: same spatial pyramid, different channels
    inputs = _pyramid(base=32, levels=4, channels=[8, 16, 32, 64])
    neck = HRFPN(in_channels=(8, 16, 32, 64), out_channels=24, num_outs=5)
    vars_ = neck.init(RNG, inputs)
    outs = neck.apply(vars_, inputs)
    assert len(outs) == 5
    for i, o in enumerate(outs):
        assert o.shape == (1, 32 // 2**i, 32 // 2**i, 24)


def test_nasfpn_shapes():
    inputs = _pyramid(base=32, levels=3, channels=[32, 64, 128])
    neck = NASFPN(in_channels=(32, 64, 128), out_channels=16, num_outs=5,
                  stack_times=2)
    vars_ = neck.init(RNG, inputs)
    outs = neck.apply(vars_, inputs)
    assert len(outs) == 5
    for i, o in enumerate(outs):
        assert o.shape == (1, 32 // 2**i, 32 // 2**i, 16)


def test_carafe_upsamples_and_normalizes():
    x = jax.random.normal(RNG, (1, 8, 8, 12))
    up = CARAFE(channels=12, scale=2, up_kernel=5)
    vars_ = up.init(RNG, x)
    y = up.apply(vars_, x)
    assert y.shape == (1, 16, 16, 12)
    # softmax kernels => constant input is exactly preserved away from the
    # zero-padded border (k_up//2 = 2 input px -> 4 output px margin)
    const = jnp.ones((1, 8, 8, 12)) * 3.5
    yc = up.apply(vars_, const)
    np.testing.assert_allclose(np.asarray(yc)[:, 4:-4, 4:-4], 3.5,
                               rtol=1e-5)


def test_fpn_carafe_shapes():
    inputs = _pyramid(base=32, levels=4, channels=[16, 32, 64, 128])
    neck = FPN_CARAFE(in_channels=(16, 32, 64, 128), out_channels=16,
                      num_outs=5)
    vars_ = neck.init(RNG, inputs)
    outs = neck.apply(vars_, inputs)
    assert len(outs) == 5
    assert outs[0].shape == (1, 32, 32, 16)
    assert outs[4].shape == (1, 2, 2, 16)


def test_necks_registered():
    for name in ('BFP', 'HRFPN', 'NASFPN', 'FPN_CARAFE'):
        assert name in NECKS


def test_nasfcos_fpn_shapes():
    inputs = _pyramid(base=32, levels=3, channels=[32, 64, 128])
    from ld_tpu.models.necks.extra_necks import NASFCOS_FPN
    neck = NASFCOS_FPN(in_channels=(32, 64, 128), out_channels=16,
                       num_outs=5)
    vars_ = neck.init(RNG, inputs)
    outs = neck.apply(vars_, inputs)
    assert len(outs) == 5
    assert outs[0].shape == (1, 32, 32, 16)
    assert outs[4].shape == (1, 2, 2, 16)


def test_fpg_shapes():
    inputs = _pyramid(base=32, levels=4, channels=[16, 32, 64, 128])
    from ld_tpu.models.necks.extra_necks import FPG
    neck = FPG(in_channels=(16, 32, 64, 128), out_channels=16, num_outs=5,
               stack_times=2)
    vars_ = neck.init(RNG, inputs)
    outs = neck.apply(vars_, inputs)
    assert len(outs) == 5
    for i, o in enumerate(outs):
        assert o.shape == (1, 32 // 2**i, 32 // 2**i, 16)


def test_rfp_zero_gate_matches_fpn():
    inputs = _pyramid(base=32, levels=4, channels=[16, 32, 64, 128])
    from ld_tpu.models.necks.extra_necks import RFP
    neck = RFP(in_channels=(16, 32, 64, 128), out_channels=16, num_outs=5,
               rfp_steps=2)
    vars_ = neck.init(RNG, inputs)
    outs = neck.apply(vars_, inputs)
    assert len(outs) == 5
    # gate conv is zero-init: sigmoid(0)=0.5, so output mixes plain FPN and
    # refinement; both paths finite
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()
