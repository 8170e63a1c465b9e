"""Numerical parity: a torch-built ResNet-18 (torchvision layout) converted
through `convert_torch_state_dict` must produce the SAME feature maps as the
ld_tpu flax backbone on identical inputs — validating the weight converter
AND the frozen-BN forward semantics bit-for-bit (within fp32 tolerance).

This is the strongest available stand-in for the AP-parity weight-reuse path
while no published checkpoints are mountable (zero egress).
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

import ld_tpu
from ld_tpu.models.backbones import ResNet
from ld_tpu.utils.checkpoint import convert_torch_state_dict


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))
        self.relu = tnn.ReLU()

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class TorchResNet18(tnn.Module):
    """torchvision-layout ResNet-18 trunk (through layer4)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        chans = [64, 64, 128, 256, 512]
        for s in range(1, 5):
            stride = 1 if s == 1 else 2
            setattr(self, f'layer{s}', tnn.Sequential(
                TorchBasicBlock(chans[s - 1], chans[s], stride),
                TorchBasicBlock(chans[s], chans[s])))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for s in range(1, 5):
            x = getattr(self, f'layer{s}')(x)
            outs.append(x)
        return outs


def test_backbone_matches_torch_after_conversion():
    torch.manual_seed(0)
    tmodel = TorchResNet18().eval()
    # randomize BN running stats so the frozen-BN path is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
          if 'num_batches' not in k}
    converted = convert_torch_state_dict(sd)
    assert converted['_unmapped'] == [], converted['_unmapped']
    # the converter scopes under 'backbone/' (detector layout); unwrap for a
    # bare backbone module
    variables = {'params': converted['params']['backbone'],
                 'batch_stats': converted['batch_stats']['backbone']}

    backbone = ResNet(depth=18, norm_eval=True)
    x = np.random.RandomState(0).randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        t_outs = tmodel(torch.from_numpy(x))
    j_outs = backbone.apply(variables, jnp.asarray(
        np.transpose(x, (0, 2, 3, 1))))
    assert len(j_outs) == len(t_outs)
    for lvl, (j, t) in enumerate(zip(j_outs, t_outs)):
        t_np = np.transpose(t.numpy(), (0, 2, 3, 1))
        diff = np.abs(np.asarray(j) - t_np)
        assert diff.max() < 2e-3, (lvl, float(diff.max()))
        # relative agreement on the bulk of activations
        denom = np.abs(t_np) + 1e-3
        assert np.median(diff / denom) < 1e-4, lvl


class TorchConvGN(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 3, 1, 1, bias=False)
        self.gn = tnn.GroupNorm(32, cout)
        self.relu = tnn.ReLU()

    def forward(self, x):
        return self.relu(self.gn(self.conv(x)))


class TorchFPNGFL(tnn.Module):
    """mmdet-layout FPN (start_level=1, on_output extras) + GFL head."""

    def __init__(self, in_chans=(64, 128, 256, 512), out=64, classes=4,
                 stacked=2, reg_max=16):
        super().__init__()
        self.lateral_convs = tnn.ModuleList(
            [tnn.Conv2d(c, out, 1) for c in in_chans[1:]])
        self.fpn_convs = tnn.ModuleList(
            [tnn.Conv2d(out, out, 3, 1, 1) for _ in in_chans[1:]] +
            [tnn.Conv2d(out, out, 3, 2, 1) for _ in range(2)])
        self.cls_convs = tnn.ModuleList(
            [TorchConvGN(out, out) for _ in range(stacked)])
        self.reg_convs = tnn.ModuleList(
            [TorchConvGN(out, out) for _ in range(stacked)])
        self.gfl_cls = tnn.Conv2d(out, classes, 3, 1, 1)
        self.gfl_reg = tnn.Conv2d(out, 4 * (reg_max + 1), 3, 1, 1)
        self.scale_vals = [1.0, 1.1, 0.9, 1.2, 0.8]

    def forward(self, feats):
        lats = [l(f) for l, f in zip(self.lateral_convs, feats[1:])]
        for i in range(len(lats) - 1, 0, -1):
            lats[i - 1] = lats[i - 1] + tnn.functional.interpolate(
                lats[i], size=lats[i - 1].shape[2:], mode='nearest')
        outs = [self.fpn_convs[i](lats[i]) for i in range(len(lats))]
        outs.append(self.fpn_convs[3](outs[-1]))
        outs.append(self.fpn_convs[4](outs[-1]))
        cls_outs, reg_outs = [], []
        for lvl, x in enumerate(outs):
            c, r = x, x
            for m in self.cls_convs:
                c = m(c)
            for m in self.reg_convs:
                r = m(r)
            cls_outs.append(self.gfl_cls(c))
            reg_outs.append(self.gfl_reg(r) * self.scale_vals[lvl])
        return cls_outs, reg_outs


def test_full_detector_matches_torch_after_conversion():
    from ld_tpu.models import build_detector
    torch.manual_seed(1)
    t_backbone = TorchResNet18().eval()
    t_neckhead = TorchFPNGFL().eval()
    with torch.no_grad():
        for m in list(t_backbone.modules()) + list(t_neckhead.modules()):
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)

    # assemble an mmdet-style state dict
    sd = {f'backbone.{k}': v.numpy()
          for k, v in t_backbone.state_dict().items()
          if 'num_batches' not in k}
    nh = t_neckhead.state_dict()
    for i in range(3):
        sd[f'neck.lateral_convs.{i}.conv.weight'] = \
            nh[f'lateral_convs.{i}.weight'].numpy()
        sd[f'neck.lateral_convs.{i}.conv.bias'] = \
            nh[f'lateral_convs.{i}.bias'].numpy()
    for i in range(5):
        sd[f'neck.fpn_convs.{i}.conv.weight'] = \
            nh[f'fpn_convs.{i}.weight'].numpy()
        sd[f'neck.fpn_convs.{i}.conv.bias'] = \
            nh[f'fpn_convs.{i}.bias'].numpy()
    for kind in ('cls', 'reg'):
        for i in range(2):
            sd[f'bbox_head.{kind}_convs.{i}.conv.weight'] = \
                nh[f'{kind}_convs.{i}.conv.weight'].numpy()
            sd[f'bbox_head.{kind}_convs.{i}.gn.weight'] = \
                nh[f'{kind}_convs.{i}.gn.weight'].numpy()
            sd[f'bbox_head.{kind}_convs.{i}.gn.bias'] = \
                nh[f'{kind}_convs.{i}.gn.bias'].numpy()
    for name in ('gfl_cls', 'gfl_reg'):
        sd[f'bbox_head.{name}.weight'] = nh[f'{name}.weight'].numpy()
        sd[f'bbox_head.{name}.bias'] = nh[f'{name}.bias'].numpy()
    for i, v in enumerate(t_neckhead.scale_vals):
        sd[f'bbox_head.scales.{i}.scale'] = np.float32(v)

    variables = convert_torch_state_dict(sd)
    assert variables.pop('_unmapped') == []

    det = build_detector(dict(
        type='GFL',
        backbone=dict(type='ResNet', depth=18, norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(type='GFLHead', num_classes=4, in_channels=64,
                       stacked_convs=2, feat_channels=64, reg_max=16),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=10)))

    x = np.random.RandomState(1).randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        t_feats = t_backbone(torch.from_numpy(x))
        t_cls, t_reg = t_neckhead(t_feats)
    j_cls, j_reg = det.apply(variables,
                             jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    for lvl in range(5):
        for j, t in ((j_cls[lvl], t_cls[lvl]), (j_reg[lvl], t_reg[lvl])):
            t_np = np.transpose(t.numpy(), (0, 2, 3, 1))
            diff = np.abs(np.asarray(j) - t_np)
            # ~30 conv layers of fp32 reassociation between XLA and oneDNN
            assert diff.max() < 5e-3, (lvl, float(diff.max()))
            denom = np.abs(t_np) + 1e-2
            assert np.median(diff / denom) < 2e-4, lvl
