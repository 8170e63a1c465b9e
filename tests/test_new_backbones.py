"""RegNet / Res2Net / HRNet / Hourglass backbones: layout oracles + shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ld_tpu.models.backbones.hourglass import HourglassNet
from ld_tpu.models.backbones.hrnet import HRNet
from ld_tpu.models.backbones.regnet import (RegNet, adjust_width_group,
                                            generate_regnet,
                                            get_stages_from_blocks)
from ld_tpu.models.backbones.res2net import Res2Net
from ld_tpu.utils.registry import BACKBONES

RNG = jax.random.PRNGKey(0)


def test_regnet_width_schedule_oracle():
    # RegNetX-400MF published layout: widths (32, 64, 160, 384),
    # depths (1, 2, 7, 12), groups (16, 16, 16, 16).
    widths, num_stages = generate_regnet(24, 24.48, 2.54, 22)
    assert num_stages == 4
    stage_widths, stage_blocks = get_stages_from_blocks(widths)
    stage_widths, groups = adjust_width_group(
        stage_widths, [1.0] * 4, [16] * 4)
    assert stage_widths == [32, 64, 160, 384]
    assert stage_blocks == [1, 2, 7, 12]
    assert groups == [16, 16, 16, 16]
    # RegNetX-3.2GF: widths (96, 192, 432, 1008), depths (2, 6, 15, 2)
    widths, _ = generate_regnet(88, 26.31, 2.25, 25)
    sw, sb = get_stages_from_blocks(widths)
    sw, g = adjust_width_group(sw, [1.0] * 4, [48] * 4)
    assert sw == [96, 192, 432, 1008]
    assert sb == [2, 6, 15, 2]


def test_regnet_forward_shapes():
    net = BACKBONES.build(dict(type='RegNet', arch='regnetx_400mf'))
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = net.init(RNG, x)
    outs = net.apply(vars_, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 32), (1, 8, 8, 64), (1, 4, 4, 160), (1, 2, 2, 384)]


def test_res2net_forward_shapes_and_split():
    net = Res2Net(depth=50, num_stages=4, out_indices=(0, 1, 2, 3))
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = net.init(RNG, x)
    outs = net.apply(vars_, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024), (1, 2, 2, 2048)]
    # bottle2neck hierarchy exists: scales-1 = 3 conv branches in block 0
    p = vars_['params']['layer1_0']
    assert {'convs0', 'convs1', 'convs2'} <= set(p)
    assert 'convs3' not in p
    # 26w4s width: planes=64 -> width 26, conv1 out = 26*4
    assert p['conv1']['kernel'].shape[-1] == 104


def test_hrnet_forward_shapes():
    extra = dict(
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(1, ), num_channels=(16, )),
        stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(1, 1), num_channels=(8, 16)),
        stage3=dict(num_modules=1, num_branches=3, block='BASIC',
                    num_blocks=(1, 1, 1), num_channels=(8, 16, 32)),
        stage4=dict(num_modules=1, num_branches=4, block='BASIC',
                    num_blocks=(1, 1, 1, 1), num_channels=(8, 16, 32, 64)))
    net = HRNet(extra=extra)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = net.init(RNG, x)
    outs = net.apply(vars_, x)
    # 4 branches at strides 4/8/16/32 with the configured channels
    assert [o.shape for o in outs] == [
        (1, 16, 16, 8), (1, 8, 8, 16), (1, 4, 4, 32), (1, 2, 2, 64)]


def test_hrnet_fusion_mixes_branches():
    extra = dict(
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(1, ), num_channels=(8, )),
        stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(1, 1), num_channels=(8, 16)),
        stage3=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(1, 1), num_channels=(8, 16)),
        stage4=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(1, 1), num_channels=(8, 16)))
    net = HRNet(extra=extra)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    vars_ = net.init(RNG, x)
    o1 = net.apply(vars_, x)
    o2 = net.apply(vars_, x * 0)
    # both branches respond to input (fusion wired through)
    assert not np.allclose(np.asarray(o1[0]), np.asarray(o2[0]))
    assert not np.allclose(np.asarray(o1[1]), np.asarray(o2[1]))


def test_hourglass_shapes_and_stacks():
    net = HourglassNet(downsample_times=2, num_stacks=2,
                       stage_channels=(16, 16, 24),
                       stage_blocks=(1, 1, 1), feat_channel=16)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = net.init(RNG, x)
    outs = net.apply(vars_, x)
    assert len(outs) == 2
    for o in outs:
        assert o.shape == (1, 16, 16, 16)   # stride 4, feat_channel


def test_backbones_registered():
    for name in ('RegNet', 'Res2Net', 'HRNet', 'HourglassNet'):
        assert name in BACKBONES


def test_detectors_resnet_sac():
    net = BACKBONES.build(dict(type='DetectoRS_ResNet', depth=50,
                               num_stages=2, out_indices=(0, 1),
                               sac=dict(type='SAC'),
                               stage_with_sac=(False, True)))
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = net.init(RNG, x)
    # SAC layers exist only in stage 2 blocks
    p = vars_['params']
    assert 'switch' in p['layer2_0']['conv2']
    assert 'switch' not in p.get('layer1_0', {}).get('conv2', {})
    outs = net.apply(vars_, x)
    assert outs[1].shape == (1, 4, 4, 512)


def test_trident_resnet_branches():
    net = BACKBONES.build(dict(type='TridentResNet', depth=50,
                               num_stages=3, out_indices=(2, ),
                               strides=(1, 2, 2)))
    x = jax.random.normal(RNG, (2, 32, 32, 3))
    vars_ = net.init(RNG, x)
    outs = net.apply(vars_, x)
    # batch folds the 3 branches: 2 -> 6 (stride 16 on a 32-px input)
    assert outs[0].shape == (6, 2, 2, 1024)
    o = np.asarray(outs[0])
    # branches share weights but differ by dilation -> different outputs
    assert not np.allclose(o[:2], o[2:4])


def test_resnet_caffe_style_stride_on_conv1():
    """'caffe' style puts the stage stride on the 1x1 conv1 (reference
    resnet.py:303 Bottleneck.style); output shapes match 'pytorch' style but
    values differ because different pixels are sampled."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                    jnp.float32)
    outs = {}
    for style in ('pytorch', 'caffe'):
        net = BACKBONES.build(dict(type='ResNet', depth=50, num_stages=4,
                                   out_indices=(0, 1, 2, 3), style=style,
                                   norm_eval=False, frozen_stages=-1))
        variables = net.init(jax.random.PRNGKey(0), x)
        outs[style] = net.apply(variables, x, train=False,
                                mutable=False)
    for a, b in zip(outs['pytorch'], outs['caffe']):
        assert a.shape == b.shape
    # same param tree (weight shapes identical -> same converted checkpoints)
    assert any(
        float(jnp.abs(a - b).max()) > 1e-3
        for a, b in zip(outs['pytorch'], outs['caffe']))


def test_resnest_split_attention():
    """ResNeSt-50 (reference backbones/resnest.py): split-attention conv2
    (radix softmax), avg_down_stride pooling, V1d deep stem; backbone param
    count matches torch ResNeSt-50 minus its fc (~25.4M)."""
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    net = BACKBONES.build(dict(type='ResNeSt', depth=50, stem_channels=64,
                               radix=2, reduction_factor=4,
                               out_indices=(0, 1, 2, 3), norm_eval=False))
    v = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(v, x, train=False)
    assert [o.shape for o in outs] == [(1, 16, 16, 256), (1, 8, 8, 512),
                                       (1, 4, 4, 1024), (1, 2, 2, 2048)]
    n = sum(p.size for p in jax.tree_util.tree_leaves(v['params']))
    assert 25.0e6 < n < 26.0e6, n


def test_regnet_grouped_dcn_kernel_shape():
    """RegNet DCN stages keep the channel grouping inside the DCN conv2
    (r5 review finding: the converter emits grouped kernels from
    RegNetX-DCN checkpoints, so the model must too)."""
    net = BACKBONES.build(dict(
        type='RegNet', arch='regnetx_400mf',
        dcn=dict(type='DCNv2', deform_groups=1),
        stage_with_dcn=(False, True, True, True)))
    v = net.init(RNG, jnp.zeros((1, 64, 64, 3)))
    # stage 2: width 64, group_width 16 -> 4 conv groups -> grouped
    # kernel rows 9*64/4 = 144 (ungrouped would be 576)
    k = v['params']['layer2_0_conv2']['kernel']
    assert k.shape == (144, 64), k.shape
    out = net.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert out[1].shape[-1] == 64
