"""ResNet backbones (18/34/50/101/152) in flax, NHWC, TPU-first.

Capability parity with /root/reference/mmdet/models/backbones/resnet.py:303
('pytorch'-style blocks: stride on the 3x3 conv of a bottleneck), including
detection-specific semantics:

  * `norm_eval=True`: BatchNorm always uses running statistics (affine params
    still trainable) — expressed here as `use_running_average=True` with
    running stats living in the `batch_stats` collection.
  * `frozen_stages=k`: the stem and the first k stages receive no gradient.
    TPU-first: a `jax.lax.stop_gradient` on the activation at the freeze
    boundary — XLA then dead-code-eliminates the whole frozen backward
    segment, which the reference's `requires_grad_(False)` cannot do.
    The optimizer additionally masks those paths (see parallel/optim.py)
    so weight decay never touches them either.

Layout is NHWC throughout (TPU-native); convs are lowered to the MXU by XLA.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.utils.registry import BACKBONES


class BatchNorm(nn.Module):
    """BN with frozen running statistics (detection fine-tuning semantics)."""
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32
    zero_init: bool = False   # gamma=0 (zero_init_residual blocks)

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=self.use_running_average or not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            scale_init=(nn.initializers.zeros if self.zero_init
                        else nn.initializers.ones),
            name='bn')(x)


def _conv(features, kernel, stride=1, name=None, dtype=jnp.float32,
          conv_cfg=None):
    from ld_tpu.models.layers import make_conv
    return make_conv(conv_cfg, features, kernel, stride, use_bias=False,
                     name=name, dtype=dtype)


def _norm(norm_cfg, norm_eval, name, dtype, zero_init=False):
    from ld_tpu.models.layers import make_norm
    return make_norm(norm_cfg, use_running_average=norm_eval, name=name,
                     dtype=dtype, zero_init=zero_init)


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    downsample: bool = False
    norm_eval: bool = True
    avg_down: bool = False
    conv_cfg: dict = None
    norm_cfg: dict = None
    zero_init_final: bool = False   # zero_init_residual: gamma=0 last norm
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(self.filters, 3, self.stride, 'conv1', self.dtype,
                    self.conv_cfg)(x)
        out = _norm(self.norm_cfg, self.norm_eval, 'norm1',
                    self.dtype)(out, train)
        out = nn.relu(out)
        out = _conv(self.filters, 3, 1, 'conv2', self.dtype,
                    self.conv_cfg)(out)
        out = _norm(self.norm_cfg, self.norm_eval, 'norm2',
                    self.dtype, zero_init=self.zero_init_final)(out, train)
        if self.downsample:
            identity = _shortcut(x, self.filters, self.stride,
                                 self.avg_down, self.norm_eval, self.dtype,
                                 train, self.conv_cfg, self.norm_cfg)
        return nn.relu(out + identity)


def _shortcut(x, features, stride, avg_down, norm_eval, dtype, train,
              conv_cfg=None, norm_cfg=None):
    if avg_down and stride > 1:
        x = nn.avg_pool(x, (stride, stride), strides=(stride, stride))
        stride = 1
    x = _conv(features, 1, stride, 'downsample_conv', dtype, conv_cfg)(x)
    return _norm(norm_cfg, norm_eval, 'downsample_norm', dtype)(x, train)


class Bottleneck(nn.Module):
    filters: int  # bottleneck width; output is 4x
    stride: int = 1
    downsample: bool = False
    norm_eval: bool = True
    dilation: int = 1
    groups: int = 1          # >1 + base_width: ResNeXt cardinality
    base_width: int = 64
    avg_down: bool = False
    with_dcn: bool = False   # DCNv2 on the 3x3 (teacher backbones)
    with_sac: bool = False   # Switchable Atrous Conv (DetectoRS)
    dcn_deform_groups: int = 1
    style: str = 'pytorch'   # 'caffe': spatial stride on conv1, not conv2
    conv_cfg: dict = None
    norm_cfg: dict = None
    # stage plugins active in this block: tuple of plugin cfg dicts, each
    # with a 'position' in after_conv1/2/3 (reference resnet.py:109-118)
    plugins: tuple = ()
    zero_init_final: bool = False   # zero_init_residual: gamma=0 last norm
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    def _apply_plugins(self, out, position):
        from ld_tpu.models.backbones.plugins import build_plugin, _snake
        for i, p in enumerate(self.plugins or ()):
            if p['position'] == position:
                t = p['cfg']['type']
                name = _snake(t) + (f'_{i}' if i else '')
                out = build_plugin(p['cfg'], name=name)(out)
        return out

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        # ResNeXt widens the bottleneck by groups * base_width / 64
        width = int(self.filters * (self.base_width / 64.0)) * self.groups \
            if self.groups > 1 else self.filters
        # stride placement (reference resnet.py:303 `style`): 'pytorch' puts
        # the spatial stride on the 3x3 conv2, 'caffe' on the 1x1 conv1 —
        # Detectron-lineage weights (fcos_gfl caffe teachers) need the latter
        s1 = self.stride if self.style == 'caffe' else 1
        s2 = 1 if self.style == 'caffe' else self.stride
        out = _conv(width, 1, s1, 'conv1', self.dtype, self.conv_cfg)(x)
        out = _norm(self.norm_cfg, self.norm_eval, 'norm1',
                    self.dtype)(out, train)
        out = nn.relu(out)
        out = self._apply_plugins(out, 'after_conv1')
        if self.with_sac:
            out = SAConv(width, stride=s2, dtype=self.dtype,
                         name='conv2')(out)
        elif self.with_dcn:
            from ld_tpu.ops.deform_conv import ModulatedDeformConv
            out = ModulatedDeformConv(
                width, kernel_size=3, stride=s2,
                dilation=self.dilation,
                deform_groups=self.dcn_deform_groups,
                groups=self.groups,  # ResNeXt DCN conv2 stays grouped
                dtype=self.dtype, name='conv2')(out)
        else:
            from ld_tpu.models.layers import make_conv
            out = make_conv(self.conv_cfg, width, 3, s2,
                            padding=self.dilation, dilation=self.dilation,
                            groups=self.groups, use_bias=False,
                            name='conv2', dtype=self.dtype)(out)
        out = _norm(self.norm_cfg, self.norm_eval, 'norm2',
                    self.dtype)(out, train)
        out = nn.relu(out)
        out = self._apply_plugins(out, 'after_conv2')
        out = _conv(self.filters * self.expansion, 1, 1, 'conv3',
                    self.dtype, self.conv_cfg)(out)
        out = _norm(self.norm_cfg, self.norm_eval, 'norm3',
                    self.dtype, zero_init=self.zero_init_final)(out, train)
        out = self._apply_plugins(out, 'after_conv3')
        if self.downsample:
            identity = _shortcut(x, self.filters * self.expansion,
                                 self.stride, self.avg_down, self.norm_eval,
                                 self.dtype, train, self.conv_cfg,
                                 self.norm_cfg)
        return nn.relu(out + identity)


ARCH_SETTINGS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


@BACKBONES.register_module()
class ResNet(nn.Module):
    """ResNet returning the feature maps of `out_indices` stages (NHWC).

    `base_channels` scales the whole trunk (stem + stage widths), parity
    with /root/reference/mmdet/models/backbones/resnet.py:389 — used by
    miniature test models and slim deployments.
    """
    depth: int
    num_stages: int = 4
    base_channels: int = 64
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    frozen_stages: int = -1
    norm_eval: bool = True
    norm_cfg: dict = None       # dict(type='BN'|'SyncBN'|'GN', ...)
    conv_cfg: dict = None       # dict(type='ConvWS') for gn+ws recipes
    plugins: tuple = None       # stage plugins (gcnet/empirical_attention)
    style: str = 'pytorch'
    deep_stem: bool = False
    avg_down: bool = False
    groups: int = 1             # ResNeXt cardinality
    base_width: int = 64
    dcn: dict = None            # e.g. dict(type='DCNv2', deform_groups=1)
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    sac: dict = None            # dict() enables SAConv (DetectoRS)
    stage_with_sac: Tuple[bool, ...] = (False, False, False, False)
    zero_init_residual: bool = False   # gamma=0 on each block's last norm
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]

        # stem: 7x7/2 conv + BN + relu + 3x3/2 maxpool
        stem_eval = self.norm_eval or self.frozen_stages >= 0
        if self.deep_stem:
            for i, s in enumerate((2, 1, 1)):
                x = _conv(self.base_channels // 2 if i < 2
                          else self.base_channels, 3, s, f'stem_conv{i+1}',
                          self.dtype, self.conv_cfg)(x)
                x = _norm(self.norm_cfg, stem_eval,
                          f'stem_norm{i+1}', self.dtype)(x, train)
                x = nn.relu(x)
        else:
            if (self.conv_cfg or {}).get('type', 'Conv') == 'Conv':
                # space-to-depth stem: same params ('conv1/kernel',
                # (7,7,3,64)), ~1.5x faster full stem on TPU at detection
                # resolutions (layers.SpaceToDepthStem docstring)
                from ld_tpu.models.layers import SpaceToDepthStem
                x = SpaceToDepthStem(self.base_channels, dtype=self.dtype,
                                     name='conv1')(x)
            else:
                x = _conv(self.base_channels, 7, 2, 'conv1', self.dtype,
                          self.conv_cfg)(x)
            x = _norm(self.norm_cfg, stem_eval, 'norm1',
                      self.dtype)(x, train)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        # under an sp trace: pin the stem output to the spatial layout
        # (high-res stages are where spatial partitioning pays)
        from ld_tpu.utils.act_sharding import reshard_stage
        x = reshard_stage(x, -1)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        in_planes = self.base_channels
        for stage, num_blocks in enumerate(stage_blocks):
            planes = self.base_channels * 2**stage
            stride = self.strides[stage]
            dilation = self.dilations[stage]
            for b in range(num_blocks):
                s = stride if b == 0 else 1
                expansion = getattr(block_cls, 'expansion', 1)
                need_ds = (b == 0 and
                           (s != 1 or in_planes != planes * expansion))
                # frozen stages keep BN in eval mode even under
                # norm_eval=False (reference resnet.py _freeze_stages puts
                # them in .eval(): stats frozen, not just gradients)
                stage_frozen = stage + 1 <= self.frozen_stages
                kwargs = dict(filters=planes, stride=s, downsample=need_ds,
                              norm_eval=self.norm_eval or stage_frozen,
                              dtype=self.dtype,
                              avg_down=self.avg_down,
                              conv_cfg=self.conv_cfg,
                              norm_cfg=self.norm_cfg,
                              zero_init_final=self.zero_init_residual,
                              name=f'layer{stage+1}_{b}')
                if block_cls is Bottleneck:
                    kwargs['dilation'] = dilation
                    kwargs['groups'] = self.groups
                    kwargs['base_width'] = self.base_width
                    kwargs['style'] = self.style
                    if self.plugins:
                        # per-stage gating (reference `stages` tuple; a
                        # missing key means all stages, like the reference)
                        kwargs['plugins'] = tuple(
                            p for p in self.plugins
                            if p.get('stages', (True, ) * 4)[stage])
                    if self.dcn is not None and \
                            self.stage_with_dcn[stage]:
                        kwargs['with_dcn'] = True
                        kwargs['dcn_deform_groups'] = self.dcn.get(
                            'deform_groups', 1)
                    if getattr(self, 'sac', None) is not None and \
                            getattr(self, 'stage_with_sac',
                                    (False,) * 4)[stage]:
                        kwargs['with_sac'] = True
                x = block_cls(**kwargs)(x, train)
            in_planes = planes * getattr(block_cls, 'expansion', 1)
            # under an sp trace: stage outputs < gather_stage stay
            # spatially sharded, later ones gather to the batch-only
            # layout — one 'sp' all-gather at the last high-res boundary;
            # deep small maps + FPN + head then run data-parallel (see
            # utils/act_sharding.sp_stage_scope for the why)
            x = reshard_stage(x, stage)
            if stage + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                # exported copy is always batch-only under sp: the neck's
                # lateral convs may be fsdp/tp-sharded (act_sharding
                # .reshard_export docstring)
                from ld_tpu.utils.act_sharding import reshard_export
                outs.append(reshard_export(x, stage))
        return tuple(outs)

    def frozen_param_paths(self):
        """Path patterns of parameters that receive no updates (consumed by
        parallel/optim.frozen_mask; '*' patterns fnmatch full paths)."""
        paths = []
        if self.frozen_stages >= 0:
            paths += ['conv1', 'norm1', 'stem_conv1', 'stem_norm1',
                      'stem_conv2', 'stem_norm2', 'stem_conv3', 'stem_norm3']
        for stage in range(1, self.frozen_stages + 1):
            paths.append(f'layer{stage}_')
        if self.norm_cfg and self.norm_cfg.get('requires_grad') is False:
            # reference norm_cfg=dict(requires_grad=False) (caffe Detectron
            # backbones): every BN gamma/beta in the backbone is frozen
            paths.append('*/bn/*')
        return paths


@BACKBONES.register_module()
class ResNeXt(ResNet):
    """ResNeXt (grouped bottlenecks). Parity:
    /root/reference/mmdet/models/backbones/resnext.py (X-101-32x4d etc. used
    by the self-LD X101 row, README.md:148-149). Configure with
    `groups`/`base_width` (e.g. groups=32, base_width=4)."""
    groups: int = 32
    base_width: int = 4


@BACKBONES.register_module()
class ResNetV1d(ResNet):
    """ResNet-V1d (deep 3x3 stem + avg-down shortcuts). Parity:
    /root/reference/mmdet/models/backbones/resnet.py:652."""
    deep_stem: bool = True
    avg_down: bool = True


class SAConv(nn.Module):
    """Switchable Atrous Convolution (DetectoRS, mmcv ops/saconv.py):
    shared 3x3 weights evaluated at dilation 1 and dilation 3, blended by
    a per-position switch S = sigmoid(conv(avg5x5(x))); pre/post 1x1
    context convs add global context. S starts at 0.5 (zero-init switch).
    """
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = x.mean(axis=(1, 2), keepdims=True)
        x = x + nn.Conv(x.shape[-1], (1, 1), name='pre_context',
                        kernel_init=nn.initializers.zeros,
                        dtype=self.dtype)(g)
        avg = nn.avg_pool(x, (5, 5), strides=(1, 1), padding=[(2, 2)] * 2)
        switch = jax.nn.sigmoid(nn.Conv(
            1, (1, 1), kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name='switch',
            dtype=self.dtype)(avg))
        weight = self.param('kernel', nn.initializers.he_normal(),
                            (3, 3, x.shape[-1], self.features), self.dtype)
        dn = ('NHWC', 'HWIO', 'NHWC')
        s = (self.stride, self.stride)
        out1 = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), weight.astype(jnp.float32), s,
            [(1, 1)] * 2, rhs_dilation=(1, 1), dimension_numbers=dn)
        out3 = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), weight.astype(jnp.float32), s,
            [(3, 3)] * 2, rhs_dilation=(3, 3), dimension_numbers=dn)
        if self.stride > 1:
            switch = switch[:, ::self.stride, ::self.stride]
        out = switch * out1 + (1 - switch) * out3
        g2 = out.mean(axis=(1, 2), keepdims=True)
        out = out + nn.Conv(self.features, (1, 1), name='post_context',
                            kernel_init=nn.initializers.zeros,
                            dtype=self.dtype)(g2)
        return out.astype(x.dtype)


@BACKBONES.register_module()
class DetectoRS_ResNet(ResNet):
    """ResNet whose bottleneck 3x3s are Switchable Atrous Convs on the
    configured stages (detectors_resnet.py:205). Pair with the RFP neck
    for the DetectoRS recipe."""
    sac: dict = None
    stage_with_sac: Tuple[bool, ...] = (False, True, True, True)


class TridentBottleneck(nn.Module):
    """Bottleneck whose 3x3 runs per-branch dilations with SHARED weights;
    input/output carry the branch axis folded into batch (3B, H, W, C)."""
    filters: int
    dilations: Tuple[int, ...] = (1, 2, 3)
    stride: int = 1
    downsample: bool = False
    norm_eval: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nb = len(self.dilations)
        identity = x
        out = nn.Conv(self.filters, (1, 1), use_bias=False, name='conv1',
                      dtype=self.dtype)(x)
        out = BatchNorm(use_running_average=self.norm_eval, name='norm1',
                        dtype=self.dtype)(out, train)
        out = nn.relu(out)
        weight = self.param('conv2_kernel', nn.initializers.he_normal(),
                            (3, 3, self.filters, self.filters), self.dtype)
        chunks = jnp.split(out, nb, axis=0)
        dn = ('NHWC', 'HWIO', 'NHWC')
        outs = []
        for i, d in enumerate(self.dilations):
            outs.append(jax.lax.conv_general_dilated(
                chunks[i].astype(jnp.float32), weight.astype(jnp.float32),
                (self.stride, self.stride), [(d, d)] * 2,
                rhs_dilation=(d, d), dimension_numbers=dn))
        out = jnp.concatenate(outs, axis=0).astype(x.dtype)
        out = BatchNorm(use_running_average=self.norm_eval, name='norm2',
                        dtype=self.dtype)(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.filters * 4, (1, 1), use_bias=False,
                      name='conv3', dtype=self.dtype)(out)
        out = BatchNorm(use_running_average=self.norm_eval, name='norm3',
                        dtype=self.dtype)(out, train)
        if self.downsample:
            identity = _shortcut(x, self.filters * 4, self.stride, False,
                                 self.norm_eval, self.dtype, train)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class TridentResNet(ResNet):
    """Trident ResNet (trident_resnet.py): the final stage runs three
    weight-SHARED branches at dilations (1, 2, 3). TPU re-design: branches
    fold into the batch axis (B -> 3B through the trident stage — exactly
    the reference's train-time concat) so every op stays dense; slice the
    `test_branch_idx` third at inference for the reference's single-branch
    test mode."""
    num_branch: int = 3
    test_branch_idx: int = 1
    trident_dilations: Tuple[int, ...] = (1, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, name='conv1', dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=self.norm_eval or self.frozen_stages >= 0, name='norm1',
                      dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        outs = []
        in_planes = 64
        last = len(stage_blocks) - 1
        for stage, num_blocks in enumerate(stage_blocks):
            planes = 64 * 2**stage
            stride = self.strides[stage]
            if stage == last:
                # enter the trident stage: replicate along batch
                x = jnp.tile(x, (self.num_branch, 1, 1, 1))
                for b in range(num_blocks):
                    s = stride if b == 0 else 1
                    need_ds = b == 0 and (s != 1 or
                                          in_planes != planes * 4)
                    x = TridentBottleneck(
                        planes, dilations=self.trident_dilations, stride=s,
                        downsample=need_ds, norm_eval=self.norm_eval,
                        dtype=self.dtype,
                        name=f'layer{stage+1}_{b}')(x, train)
            else:
                for b in range(num_blocks):
                    s = stride if b == 0 else 1
                    exp = getattr(block_cls, 'expansion', 1)
                    need_ds = b == 0 and (s != 1 or
                                          in_planes != planes * exp)
                    x = block_cls(planes, stride=s, downsample=need_ds,
                                  norm_eval=self.norm_eval,
                                  dtype=self.dtype,
                                  name=f'layer{stage+1}_{b}')(x, train)
            in_planes = planes * getattr(block_cls, 'expansion', 1)
            if stage + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)
