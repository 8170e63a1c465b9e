"""Numerics-parity fixtures for the COCO AP target (VERDICT round-1 item 2).

Each test re-implements the reference's exact math (mmcv/mmdet pure-torch or
cv2 pieces) as an independent inline oracle and asserts the ld_tpu pipeline
matches — bit-for-bit for preprocessing, fp32-tight for coder math. With
these green, mounting real COCO in a later round is a pure data exercise:
every preprocessing/normalization/coder constant has a pinned fixture.

Oracles re-implemented from:
  * mmcv.imrescale / rescale_size  (reference Resize keep_ratio path,
    mmdet/datasets/pipelines/transforms.py:26,203)
  * mmcv.imnormalize_              (reference Normalize, transforms.py:547)
  * mmcv.impad_to_multiple         (reference Pad, transforms.py:476)
  * bbox2delta / delta2bbox        (mmdet/core/bbox/coder/
    delta_xywh_bbox_coder.py:88,134)
  * mmdet checkpoint layout        (.pth round-trip through
    tools/model_converters/mmdet2ldtpu.py)
"""
import os
import subprocess
import sys

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import torch

import ld_tpu
from ld_tpu.data.transforms import Normalize, Pad, Resize

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fixture_image(h, w, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3)).astype(np.uint8)


# ---------------------------------------------------------------- Resize ----
def _mmcv_imrescale(img, scale):
    """mmcv.imrescale keep-ratio math: scale_factor from (long, short) caps,
    new size = int(dim * factor + 0.5), cv2 INTER_LINEAR."""
    h, w = img.shape[:2]
    max_long_edge, max_short_edge = max(scale), min(scale)
    scale_factor = min(max_long_edge / max(h, w),
                       max_short_edge / min(h, w))
    new_w = int(w * float(scale_factor) + 0.5)
    new_h = int(h * float(scale_factor) + 0.5)
    return cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)


def test_resize_keep_ratio_matches_mmcv_bitwise():
    for (h, w) in [(427, 640), (480, 646), (1035, 1333), (500, 375),
                   (799, 1333), (333, 500)]:
        img = _fixture_image(h, w, seed=h)
        want = _mmcv_imrescale(img, (1333, 800))

        results = Resize(img_scale=(1333, 800), keep_ratio=True)(
            dict(img=img.copy()))
        got = results['img']
        assert got.shape == want.shape, (h, w, got.shape, want.shape)
        np.testing.assert_array_equal(got, want)
        # scale_factor contract: new/old per axis (reference
        # transforms.py:215-221 recomputes w_scale/h_scale from shapes)
        np.testing.assert_allclose(
            results['scale_factor'],
            [want.shape[1] / w, want.shape[0] / h,
             want.shape[1] / w, want.shape[0] / h], rtol=1e-6)


def test_resize_bbox_scaling_and_clip():
    img = _fixture_image(427, 640, seed=3)
    boxes = np.array([[10.5, 20.25, 639.5, 426.75],
                      [0.0, 0.0, 5.0, 5.0]], np.float32)
    results = Resize(img_scale=(1333, 800), keep_ratio=True)(
        dict(img=img.copy(), gt_bboxes=boxes.copy()))
    sf = results['scale_factor']
    want = boxes * sf
    nh, nw = results['img'].shape[:2]
    want[:, 0::2] = want[:, 0::2].clip(0, nw)
    want[:, 1::2] = want[:, 1::2].clip(0, nh)
    np.testing.assert_allclose(results['gt_bboxes'], want, rtol=1e-6)


# ------------------------------------------------------------- Normalize ----
def _mmcv_imnormalize(img, mean, std, to_rgb=True):
    """mmcv.imnormalize_: float64 mean/stdinv through cv2 ops on float32."""
    img = img.astype(np.float32).copy()
    mean = np.float64(np.asarray(mean, np.float32).reshape(1, -1))
    stdinv = 1.0 / np.float64(np.asarray(std, np.float32).reshape(1, -1))
    if to_rgb:
        cv2.cvtColor(img, cv2.COLOR_BGR2RGB, img)
    cv2.subtract(img, mean, img)
    cv2.multiply(img, stdinv, img)
    return img


def test_normalize_matches_mmcv_bitwise():
    # the COCO config constants (configs/_base_/datasets/coco_detection.py)
    mean = [123.675, 116.28, 103.53]
    std = [58.395, 57.12, 57.375]
    img = _fixture_image(67, 93, seed=7)
    want = _mmcv_imnormalize(img, mean, std, to_rgb=True)
    got = Normalize(mean, std, to_rgb=True)(
        dict(img=img.astype(np.float32)))['img']
    np.testing.assert_array_equal(got, want)

    # caffe-style (to_rgb=False, e.g. fcos teachers)
    want2 = _mmcv_imnormalize(img, [103.53, 116.28, 123.675],
                              [1.0, 1.0, 1.0], to_rgb=False)
    got2 = Normalize([103.53, 116.28, 123.675], [1.0, 1.0, 1.0],
                     to_rgb=False)(dict(img=img.astype(np.float32)))['img']
    np.testing.assert_array_equal(got2, want2)


# ------------------------------------------------------------------- Pad ----
def test_pad_to_multiple_matches_mmcv():
    img = _fixture_image(427, 646, seed=11).astype(np.float32)
    got = Pad(size_divisor=32)(dict(img=img.copy()))
    # mmcv.impad_to_multiple: ceil to multiple, constant 0 bottom/right
    th = int(np.ceil(427 / 32)) * 32
    tw = int(np.ceil(646 / 32)) * 32
    assert got['img'].shape == (th, tw, 3)
    np.testing.assert_array_equal(got['img'][:427, :646], img)
    assert float(np.abs(got['img'][427:]).max()) == 0.0
    assert float(np.abs(got['img'][:, 646:]).max()) == 0.0
    assert got['pad_shape'] == (th, tw, 3)


# -------------------------------------------------- DeltaXYWH coder math ----
def _torch_bbox2delta(proposals, gt, means, stds):
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]
    deltas = torch.stack([(gx - px) / pw, (gy - py) / ph,
                          torch.log(gw / pw), torch.log(gh / ph)], dim=-1)
    means = deltas.new_tensor(means).unsqueeze(0)
    stds = deltas.new_tensor(stds).unsqueeze(0)
    return deltas.sub_(means).div_(stds)


def _torch_delta2bbox(rois, deltas, means, stds, max_shape=None,
                      wh_ratio_clip=16 / 1000):
    means = deltas.new_tensor(means).view(1, -1)
    stds = deltas.new_tensor(stds).view(1, -1)
    denorm = deltas * stds + means
    dx, dy = denorm[..., 0], denorm[..., 1]
    max_ratio = abs(float(np.log(wh_ratio_clip)))
    dw = denorm[..., 2].clamp(-max_ratio, max_ratio)
    dh = denorm[..., 3].clamp(-max_ratio, max_ratio)
    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]
    gw = pw * dw.exp()
    gh = ph * dh.exp()
    gx = px + pw * dx
    gy = py + ph * dy
    out = torch.stack([gx - gw * 0.5, gy - gh * 0.5,
                       gx + gw * 0.5, gy + gh * 0.5], dim=-1)
    if max_shape is not None:
        out[..., 0::2] = out[..., 0::2].clamp(0, max_shape[1])
        out[..., 1::2] = out[..., 1::2].clamp(0, max_shape[0])
    return out


def test_delta_coder_matches_torch_reference():
    from ld_tpu.ops.coder import DeltaXYWHBBoxCoder
    rs = np.random.RandomState(0)
    n = 64
    x1y1 = rs.uniform(0, 200, (n, 2)).astype(np.float32)
    wh = rs.uniform(4, 120, (n, 2)).astype(np.float32)
    rois = np.concatenate([x1y1, x1y1 + wh], -1)
    g1 = rs.uniform(0, 200, (n, 2)).astype(np.float32)
    gwh = rs.uniform(4, 120, (n, 2)).astype(np.float32)
    gts = np.concatenate([g1, g1 + gwh], -1)
    deltas = rs.randn(n, 4).astype(np.float32) * 2

    for means, stds in [((0., 0., 0., 0.), (1., 1., 1., 1.)),
                        ((0., 0., 0., 0.), (0.1, 0.1, 0.2, 0.2)),
                        ((.01, -.01, .02, -.02), (.5, .5, 1., 1.))]:
        coder = DeltaXYWHBBoxCoder(target_means=means, target_stds=stds)
        want_e = _torch_bbox2delta(torch.from_numpy(rois),
                                   torch.from_numpy(gts),
                                   means, stds).numpy()
        got_e = np.asarray(coder.encode(jnp.asarray(rois),
                                        jnp.asarray(gts)))
        np.testing.assert_allclose(got_e, want_e, rtol=2e-5, atol=2e-5)

        want_d = _torch_delta2bbox(torch.from_numpy(rois),
                                   torch.from_numpy(deltas), means, stds,
                                   max_shape=(220, 220)).numpy()
        got_d = np.asarray(coder.decode(
            jnp.asarray(rois), jnp.asarray(deltas),
            max_shape=jnp.asarray([220., 220.])))
        np.testing.assert_allclose(got_d, want_d, rtol=2e-5, atol=2e-4)


# ------------------------------------------- .pth checkpoint round-trip ----
def test_pth_roundtrip_identical_head_outputs(tmp_path):
    """A .pth in mmdet key layout -> mmdet2ldtpu.py CLI -> .npz -> detector
    produces the same per-level head outputs as the torch model — the exact
    path a published GFL teacher checkpoint takes."""
    from tests.test_torch_parity import TorchResNet18, TorchFPNGFL
    from ld_tpu.models import build_detector
    from ld_tpu.utils.checkpoint import load_variables

    torch.manual_seed(5)
    t_backbone = TorchResNet18().eval()
    t_neckhead = TorchFPNGFL().eval()
    with torch.no_grad():
        for m in list(t_backbone.modules()) + list(t_neckhead.modules()):
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)

    sd = {f'backbone.{k}': v for k, v in t_backbone.state_dict().items()
          if 'num_batches' not in k}
    nh = t_neckhead.state_dict()
    for i in range(3):
        sd[f'neck.lateral_convs.{i}.conv.weight'] = \
            nh[f'lateral_convs.{i}.weight']
        sd[f'neck.lateral_convs.{i}.conv.bias'] = \
            nh[f'lateral_convs.{i}.bias']
    for i in range(5):
        sd[f'neck.fpn_convs.{i}.conv.weight'] = nh[f'fpn_convs.{i}.weight']
        sd[f'neck.fpn_convs.{i}.conv.bias'] = nh[f'fpn_convs.{i}.bias']
    for kind in ('cls', 'reg'):
        for i in range(2):
            sd[f'bbox_head.{kind}_convs.{i}.conv.weight'] = \
                nh[f'{kind}_convs.{i}.conv.weight']
            sd[f'bbox_head.{kind}_convs.{i}.gn.weight'] = \
                nh[f'{kind}_convs.{i}.gn.weight']
            sd[f'bbox_head.{kind}_convs.{i}.gn.bias'] = \
                nh[f'{kind}_convs.{i}.gn.bias']
    for name in ('gfl_cls', 'gfl_reg'):
        sd[f'bbox_head.{name}.weight'] = nh[f'{name}.weight']
        sd[f'bbox_head.{name}.bias'] = nh[f'{name}.bias']
    for i, v in enumerate(t_neckhead.scale_vals):
        sd[f'bbox_head.scales.{i}.scale'] = torch.tensor(v)

    pth = str(tmp_path / 'teacher.pth')
    npz = str(tmp_path / 'teacher.npz')
    torch.save({'state_dict': sd, 'meta': {'mmdet_version': '2.10.0'}}, pth)

    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, 'tools/model_converters/mmdet2ldtpu.py'),
         pth, npz],
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS='cpu'))
    assert proc.returncode == 0, proc.stderr[-2000:]

    variables = load_variables(npz)
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

    x = np.random.RandomState(2).randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        feats = []
        tx = torch.from_numpy(x)
        tx = t_backbone.relu(t_backbone.bn1(t_backbone.conv1(tx)))
        tx = t_backbone.maxpool(tx)
        for layer in (t_backbone.layer1, t_backbone.layer2,
                      t_backbone.layer3, t_backbone.layer4):
            tx = layer(tx)
            feats.append(tx)
        t_cls, t_reg = t_neckhead(feats)

    j_cls, j_reg = det.apply(variables,
                             jnp.asarray(x.transpose(0, 2, 3, 1)))
    for lvl in range(5):
        for t_out, j_out in ((t_cls[lvl], j_cls[lvl]),
                             (t_reg[lvl], j_reg[lvl])):
            want = t_out.numpy().transpose(0, 2, 3, 1)
            got = np.asarray(j_out)
            diff = np.abs(got - want)
            denom = np.abs(want) + 1e-3
            assert np.median(diff / denom) < 1e-4, lvl
            assert float(diff.max()) < 5e-3, (lvl, float(diff.max()))
