"""DCNv2 behavioural tests."""
import numpy as np
import jax
import jax.numpy as jnp

from ld_tpu.ops.deform_conv import ModulatedDeformConv


def test_zero_offset_equals_half_conv():
    """At init (zero offsets, sigmoid(0)=0.5 masks) DCNv2 == 0.5 * conv."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 12, 8).astype(np.float32))
    m = ModulatedDeformConv(features=16, kernel_size=3, stride=1)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    w = v['params']['kernel'].reshape(3, 3, 8, 16)
    conv = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(out), 0.5 * np.asarray(conv),
                               rtol=1e-4, atol=1e-4)


def test_stride_and_grads():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    m = ModulatedDeformConv(features=8, stride=2)
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 4, 4, 8)
    g = jax.grad(lambda p: (m.apply({'params': p}, x)**2).sum())(v['params'])
    assert all(np.isfinite(np.asarray(t)).all()
               for t in jax.tree_util.tree_leaves(g))


def test_dcn_resnet_builds():
    from ld_tpu.models.backbones import ResNet
    m = ResNet(depth=50, dcn=dict(type='DCNv2', deform_groups=1),
               stage_with_dcn=(False, True, True, True))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    # DCN blocks carry a conv_offset parameter
    assert 'conv_offset' in v['params']['layer2_0']['conv2']
    assert 'conv_offset' not in v['params']['layer1_0']


def test_grouped_zero_offset_equals_half_grouped_conv():
    """ResNeXt-style grouped DCNv2 (conv groups, not deform groups): at
    init it must equal 0.5 * grouped conv — pins the grouped contraction
    and the grouped-HWIO kernel row layout the checkpoint converter
    emits for X-101-32x4d-DCN teachers (mmdet resnext.py conv2
    groups=32)."""
    rng = np.random.RandomState(2)
    G, cin, cout = 4, 16, 24
    x = jnp.asarray(rng.randn(2, 9, 11, cin).astype(np.float32))
    m = ModulatedDeformConv(features=cout, kernel_size=3, groups=G)
    v = m.init(jax.random.PRNGKey(0), x)
    assert v['params']['kernel'].shape == (9 * cin // G, cout)
    out = m.apply(v, x)
    w = v['params']['kernel'].reshape(3, 3, cin // G, cout)
    conv = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], feature_group_count=G,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(out), 0.5 * np.asarray(conv),
                               rtol=1e-4, atol=1e-4)


def test_grouped_dcn_resnext_builds():
    from ld_tpu.models.backbones import ResNeXt
    m = ResNeXt(depth=50, groups=32, base_width=4,
                dcn=dict(type='DCNv2', deform_groups=1),
                stage_with_dcn=(False, False, True, True))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    # stage-3 block width = 256*(4/64)*32 = 512, grouped kernel rows
    # = 9 * 512/32 = 144 (the published X-101-32x4d-DCN ckpt shape)
    assert v['params']['layer3_0']['conv2']['kernel'].shape == (144, 512)
