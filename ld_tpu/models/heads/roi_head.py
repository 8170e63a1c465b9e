"""Standard two-stage ROI head (bbox branch).

Parity: /root/reference/mmdet/models/roi_heads/standard_roi_head.py:10 +
bbox_heads/convfc_bbox_head.py (Shared2FCBBoxHead) +
roi_extractors/single_level_roi_extractor.py — proposal assignment (MaxIoU
0.5/0.5), 512-roi sampling at pos_fraction 0.25 with gt boxes added as
proposals, FPN-level-routed RoIAlign 7x7, 2 shared FCs, softmax CE +
class-specific delta regression.

TPU re-design: fixed proposal/roi counts with validity masks end-to-end; the
random sampler is the same masked randomized top-k used by the RPN head.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.ops import MaxIoUAssigner
from ld_tpu.ops.coder import build_coder
from ld_tpu.ops.nms import multiclass_nms
from ld_tpu.ops.roi_align import multi_level_roi_align
from ld_tpu.utils.registry import HEADS, LOSSES
from .rpn_head import randomized_topk_mask


class Shared2FCBBoxHeadNet(nn.Module):
    """ConvFC roi bbox head (reference roi_heads/bbox_heads/
    convfc_bbox_head.py ConvFCBBoxHead): `num_convs` shared 3x3 convs then
    `num_fcs` shared FCs, then cls/reg linears. Shared2FCBBoxHead = (0, 2),
    Shared4Conv1FCBBoxHead = (4, 1); the class name keeps the historical
    default for checkpoint-path stability. The plain `BBoxHead` of the C4
    configs = (0, 0) with `with_avg_pool=True` (reference
    roi_heads/bbox_heads/bbox_head.py:12): global-average-pooled roi
    features feed the cls/reg linears directly."""
    num_classes: int
    fc_dim: int = 1024
    roi_size: int = 7
    in_channels: int = 256
    reg_class_agnostic: bool = False
    num_convs: int = 0
    num_fcs: int = 2
    conv_dim: int = 256
    with_avg_pool: bool = False
    conv_cfg: dict = None    # dict(type='ConvWS') for the gn+ws recipe
    norm_cfg: dict = None    # dict(type='GN', num_groups=32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        """roi_feats (R, 7, 7, C) -> cls (R, num_classes+1), reg (R, 4[*C])."""
        from ld_tpu.models.layers import make_conv, make_norm
        x = roi_feats
        has_norm = self.norm_cfg is not None
        for i in range(self.num_convs):
            x = make_conv(self.conv_cfg, self.conv_dim, 3, 1,
                          use_bias=not has_norm, dtype=self.dtype,
                          name=f'conv{i+1}')(x)
            if has_norm:
                x = make_norm(self.norm_cfg, use_running_average=False,
                              name=f'conv{i+1}_norm',
                              dtype=self.dtype)(x, False)
            x = nn.relu(x)
        if self.with_avg_pool:
            x = x.mean(axis=(1, 2))
        else:
            x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                                 name=f'fc{i+1}')(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name='fc_cls')(x)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(reg_dim, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.001),
                       name='fc_reg')(x)
        return cls.astype(jnp.float32), reg.astype(jnp.float32)


ConvFCBBoxHeadNet = Shared2FCBBoxHeadNet


class DeformRoIPoolNet(nn.Module):
    """Offset (+ modulation) branch of deformable RoI pooling.

    Parity: mmcv DeformRoIPoolPack / ModulatedDeformRoIPoolPack (used by
    the reference's configs/dcn dpool/mdpool variants): a standard RoIAlign
    first pass feeds two FCs producing per-bin (dx, dy) offsets (zero-init
    -> starts exactly as plain RoIAlign); the modulated variant adds a
    sigmoid per-bin mask branch.
    """
    out_size: int = 7
    deform_fc_channels: int = 1024
    modulated: bool = False

    @nn.compact
    def __call__(self, roi_feats):
        r = roi_feats.shape[0]
        x = roi_feats.reshape(r, -1)
        o = nn.relu(nn.Dense(self.deform_fc_channels, name='offset_fc1')(x))
        o = nn.Dense(self.out_size * self.out_size * 2,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name='offset_fc2')(o)
        offsets = o.reshape(r, self.out_size, self.out_size, 2)
        mask = None
        if self.modulated:
            m = nn.relu(nn.Dense(self.deform_fc_channels,
                                 name='mask_fc1')(x))
            m = nn.Dense(self.out_size * self.out_size,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros, name='mask_fc2')(m)
            # zero-init -> sigmoid 0.5; mmcv starts at 0.5 modulation too
            mask = jax.nn.sigmoid(m).reshape(r, self.out_size,
                                             self.out_size, 1)
        return offsets, mask


class GroIENet(nn.Module):
    """GenericRoIExtractor aggregation net (GRoIE, arXiv:2004.13665).

    Parity: /root/reference/mmdet/models/roi_heads/roi_extractors/
    generic_roi_extractor.py + configs/groie/: RoIAlign from EVERY FPN
    level, optional shared pre-module per level (ConvModule), sum/concat
    aggregation, optional post-module (e.g. GeneralizedAttention '0100').
    """
    aggregation: str = 'sum'
    pre_cfg: dict = None
    post_cfg: dict = None

    def _sub(self, cfg, name):
        t = cfg.get('type', 'ConvModule')
        if t == 'ConvModule':
            k = cfg.get('kernel_size', 3)
            p = cfg.get('padding', k // 2)
            conv = nn.Conv(cfg.get('out_channels', 256), (k, k),
                           padding=[(p, p)] * 2, name=name)
            return lambda x: nn.relu(conv(x))
        from ld_tpu.models.backbones.plugins import build_plugin
        c = {kk: v for kk, v in cfg.items() if kk != 'in_channels'}
        mod = build_plugin(c, name=name)
        return mod

    @nn.compact
    def __call__(self, level_feats):
        """level_feats: list of (R, S, S, C) per-level roi features."""
        pre = self._sub(self.pre_cfg, 'pre') if self.pre_cfg else None
        outs = [pre(f) if pre else f for f in level_feats]
        if self.aggregation == 'concat':
            agg = jnp.concatenate(outs, axis=-1)
        else:
            agg = sum(outs)
        if self.post_cfg:
            agg = self._sub(self.post_cfg, 'post')(agg)
        return agg


def _convfc_shape(bbox_head: dict):
    """(num_convs, num_fcs) from the reference bbox_head type string or
    explicit ConvFCBBoxHead fields."""
    import re
    t = bbox_head.get('type', 'Shared2FCBBoxHead')
    if t == 'BBoxHead':   # plain head (C4 configs): no convs, no FCs
        return 0, 0
    if t == 'ConvFCBBoxHead':
        return (bbox_head.get('num_shared_convs', 0),
                bbox_head.get('num_shared_fcs', 2))
    m = re.match(r'Shared(\d+)Conv(\d+)FCBBoxHead', t)
    if m:
        return int(m.group(1)), int(m.group(2))
    m = re.match(r'Shared(\d+)FCBBoxHead', t)
    if m:
        return 0, int(m.group(1))
    return 0, 2


class ResLayerSharedNet(nn.Module):
    """Weight-shared res5 head of the C4 configs.

    Parity: /root/reference/mmdet/models/roi_heads/shared_heads/res_layer.py
    — one ResNet stage (default stage 3 = layer4: 512-width bottlenecks,
    stride 2) applied per-roi to the pooled C4 features; every roi shares
    the stage weights. Runs as one batched NHWC stage over the (R, S, S, C)
    roi batch — the per-roi loop of the reference collapses into the roi
    batch dimension, which is exactly what the MXU wants.
    """
    depth: int = 50
    stage: int = 3
    stride: int = 2
    dilation: int = 1
    style: str = 'caffe'
    norm_eval: bool = True
    norm_cfg: dict = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ld_tpu.models.backbones.resnet import ARCH_SETTINGS
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        num_blocks = stage_blocks[self.stage]
        planes = 64 * 2 ** self.stage
        expansion = getattr(block_cls, 'expansion', 1)
        bottleneck = expansion == 4   # BasicBlock has no dilation/style
        for b in range(num_blocks):
            s = self.stride if b == 0 else 1
            need_ds = b == 0 and (s != 1 or
                                  x.shape[-1] != planes * expansion)
            kw = dict(stride=s, downsample=need_ds,
                      norm_eval=self.norm_eval, norm_cfg=self.norm_cfg,
                      dtype=self.dtype)
            if bottleneck:
                kw.update(dilation=self.dilation, style=self.style)
            x = block_cls(planes, name=f'layer{self.stage + 1}_{b}',
                          **kw)(x, train)
        return x


@HEADS.register_module()
class StandardRoIHead:

    def __init__(self, bbox_roi_extractor=None, bbox_head=None,
                 mask_roi_extractor=None, mask_head=None, shared_head=None,
                 train_cfg=None, test_cfg=None, dtype=jnp.float32, **kwargs):
        bbox_head = dict(bbox_head or {})
        self.num_classes = bbox_head.get('num_classes', 80)
        self.reg_class_agnostic = bbox_head.get('reg_class_agnostic', False)
        # IoU-family roi regression (configs/faster_rcnn *giou/iou/
        # bounded_iou*): loss runs on DECODED boxes vs raw gt boxes
        # (reference bbox_head.py loss with reg_decoded_bbox=True)
        self.reg_decoded_bbox = bbox_head.get('reg_decoded_bbox', False)
        self.coder = build_coder(bbox_head.get('bbox_coder') or dict(
            type='DeltaXYWHBBoxCoder', target_means=[0., 0., 0., 0.],
            target_stds=[0.1, 0.1, 0.2, 0.2]))
        self.loss_cls_fn = LOSSES.build(bbox_head.get('loss_cls') or dict(
            type='CrossEntropyLoss', use_sigmoid=False, loss_weight=1.0))
        self.loss_bbox_fn = LOSSES.build(bbox_head.get('loss_bbox') or dict(
            type='L1Loss', loss_weight=1.0))
        # SingleRoIExtractor -> fused level-routed roi_align
        # (ops/roi_align.py); GenericRoIExtractor (GRoIE) -> all-level
        # extraction + GroIENet aggregation with learned pre/post modules
        ext = dict(bbox_roi_extractor or {})
        self.roi_size = ext.get('roi_layer', {}).get('output_size', 7)
        self.featmap_strides = tuple(ext.get('featmap_strides',
                                             (4, 8, 16, 32)))
        # extractor out_channels (C4 configs pool 1024-ch features with no
        # neck; the detector uses this for init when there is no neck)
        self.ext_channels = ext.get('out_channels')
        # weight-shared res5 head (C4 configs): applied to every extracted
        # roi feature batch before the bbox/mask nets
        self.shared_net = None
        self.shared_out_channels = None
        self.feat_size = self.roi_size
        if shared_head:
            sh = dict(shared_head)
            sh.pop('type', None)
            sh.pop('pretrained', None)
            sh_norm = sh.get('norm_cfg')
            self._shared_norm_frozen = \
                (sh_norm or {}).get('requires_grad', True) is False
            stage = sh.get('stage', 3)
            stride = sh.get('stride', 2)
            self.shared_net = ResLayerSharedNet(
                depth=sh.get('depth', 50), stage=stage, stride=stride,
                dilation=sh.get('dilation', 1),
                style=sh.get('style', 'caffe'),
                norm_eval=sh.get('norm_eval', True),
                norm_cfg=sh_norm, dtype=dtype)
            from ld_tpu.models.backbones.resnet import ARCH_SETTINGS
            block_cls, _ = ARCH_SETTINGS[sh.get('depth', 50)]
            self.shared_out_channels = \
                64 * 2 ** stage * getattr(block_cls, 'expansion', 1)
            self.feat_size = -(-self.roi_size // stride)
        self.groie = None
        if ext.get('type') == 'GenericRoIExtractor':
            self.groie = GroIENet(aggregation=ext.get('aggregation', 'sum'),
                                  pre_cfg=ext.get('pre_cfg'),
                                  post_cfg=ext.get('post_cfg'))
        # deformable RoI pooling (configs/dcn dpool/mdpool):
        # roi_layer type DeformRoIPoolPack / ModulatedDeformRoIPoolPack
        rl_type = ext.get('roi_layer', {}).get('type', 'RoIAlign')
        self.dpool = None
        if rl_type in ('DeformRoIPoolPack', 'ModulatedDeformRoIPoolPack'):
            self.dpool = DeformRoIPoolNet(
                out_size=self.roi_size,
                deform_fc_channels=ext.get('roi_layer', {}).get(
                    'deform_fc_channels', 1024),
                modulated=rl_type.startswith('Modulated'))
            self.dpool_gamma = ext.get('roi_layer', {}).get('gamma', 0.1)
        mext = dict(mask_roi_extractor or {})
        self.mask_groie = None
        if mext.get('type') == 'GenericRoIExtractor':
            self.mask_groie = GroIENet(
                aggregation=mext.get('aggregation', 'sum'),
                pre_cfg=mext.get('pre_cfg'), post_cfg=mext.get('post_cfg'))
        self.train_cfg = train_cfg or {}
        self.test_cfg = test_cfg or dict(
            score_thr=0.05, nms=dict(iou_threshold=0.5), max_per_img=100)
        a_cfg = dict(self.train_cfg.get('assigner', dict(
            type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.5,
            min_pos_iou=0.5)))
        a_cfg.pop('type', None)
        self.assigner = MaxIoUAssigner(**a_cfg)
        s_cfg = dict(self.train_cfg.get('sampler', dict(
            num=512, pos_fraction=0.25, add_gt_as_proposals=True)))
        self.num_samples = s_cfg.get('num', 512)
        self.pos_fraction = s_cfg.get('pos_fraction', 0.25)
        self.add_gt_as_proposals = s_cfg.get('add_gt_as_proposals', True)
        from ld_tpu.ops.samplers import build_sampler
        self.sampler = build_sampler(
            {**s_cfg, 'type': s_cfg.get('type', 'RandomSampler')},
            num=self.num_samples, pos_fraction=self.pos_fraction)
        # OHEM/ScoreHLR need per-candidate losses/scores from a preliminary
        # stop-gradient head pass (the reference's context._bbox_forward)
        self._hard_mining = type(self.sampler).__name__ in (
            'OHEMSampler', 'ScoreHLRSampler')
        n_convs, n_fcs = _convfc_shape(bbox_head)
        self.net = Shared2FCBBoxHeadNet(
            num_classes=self.num_classes, roi_size=self.feat_size,
            in_channels=bbox_head.get('in_channels', 256),
            fc_dim=bbox_head.get('fc_out_channels', 1024),
            num_convs=n_convs, num_fcs=n_fcs,
            conv_dim=bbox_head.get('conv_out_channels', 256),
            with_avg_pool=bbox_head.get('with_avg_pool', False),
            conv_cfg=bbox_head.get('conv_cfg'),
            norm_cfg=bbox_head.get('norm_cfg'),
            reg_class_agnostic=self.reg_class_agnostic, dtype=dtype)
        # optional mask branch (Mask R-CNN)
        self.mask_head = None
        if mask_head is not None:
            from .mask_head import FCNMaskHead
            mh = dict(mask_head)
            mh.pop('type', None)
            mh.setdefault('num_classes', self.num_classes)
            mext = dict(mask_roi_extractor or {})
            if mask_roi_extractor is None and self.shared_net is not None:
                # C4 (mask_roi_extractor=None): the mask branch pools at
                # the bbox extractor's size and shares res5 — its net sees
                # the post-shared-head spatial size
                self.mask_roi_size = self.roi_size
                mh.setdefault('roi_size', self.feat_size)
            else:
                self.mask_roi_size = mext.get('roi_layer',
                                              {}).get('output_size', 14)
                mh.setdefault('roi_size', self.mask_roi_size)
            self.mask_head = FCNMaskHead(dtype=dtype, **mh)

    # ---- training -------------------------------------------------------------
    def sample_rois(self, proposals, prop_valid, gt_bboxes, gt_labels,
                    gt_valid, rng, extras=None):
        """Assign + sample a fixed set of rois for ONE image.

        `extras` (optional dict) carries hard-mining inputs for
        OHEM/ScoreHLR samplers: per-candidate `loss`, fg `scores` (see
        forward_train). The 7th return is per-roi label weights
        (ScoreHLR's decayed negatives; ones otherwise).
        """
        if self.add_gt_as_proposals:
            proposals = jnp.concatenate([gt_bboxes, proposals])
            prop_valid = jnp.concatenate([gt_valid, prop_valid])
        res = self.assigner.assign(
            proposals, [proposals.shape[0]], gt_bboxes, gt_labels, gt_valid,
            prop_valid, num_classes=self.num_classes)
        from ld_tpu.ops.boxes import bbox_overlaps
        raw_iou = jnp.max(
            jnp.where(gt_valid[None, :],
                      bbox_overlaps(proposals, gt_bboxes), 0.0), -1)
        pos_sel, neg_sel, neg_w = self.sampler.sample(
            rng, res.pos_mask & prop_valid, (~res.pos_mask) & prop_valid,
            gt_inds=res.assigned_gt_inds, max_overlaps=raw_iou,
            boxes=proposals, **(extras or {}))

        sel = pos_sel | neg_sel
        # gather a fixed `num_samples` roi set (selected first, by key rank)
        rank_keys = jnp.where(pos_sel, 2.0, jnp.where(neg_sel, 1.0, 0.0)) + \
            jax.random.uniform(jax.random.fold_in(rng, 7),
                               sel.shape) * 0.5
        _, order = jax.lax.top_k(rank_keys,
                                 min(self.num_samples,
                                     rank_keys.shape[0]))
        rois = proposals[order]
        roi_valid = sel[order]
        roi_pos = pos_sel[order]
        safe = jnp.clip(res.assigned_gt_inds, 0)[order]
        labels = jnp.where(roi_pos, res.labels[order], self.num_classes)
        deltas = self._encode_roi_targets(rois, gt_bboxes[safe])
        w_full = jnp.ones_like(raw_iou) if neg_w is None else \
            jnp.where(pos_sel, 1.0, neg_w)
        return (rois, roi_valid, roi_pos, labels, deltas, safe,
                w_full[order])

    def _encode_roi_targets(self, rois, matched_gt):
        """Regression targets for sampled rois; SABL overrides to defer
        its (4-tuple) bucketing encode to the loss, avoiding a wasted
        per-roi encode here. With reg_decoded_bbox the raw gt boxes ARE
        the targets (the loss decodes the prediction instead)."""
        if getattr(self, 'reg_decoded_bbox', False):
            return matched_gt
        return self.coder.encode(rois, matched_gt)

    def _bbox_vars(self, variables):
        p = variables['params']
        return {'params': p['bbox'] if 'bbox' in p else p}

    def _mask_vars(self, variables):
        return {'params': variables['params']['mask']}

    def _apply_shared(self, variables, roi_feats):
        """Weight-shared res5 (C4 configs) over the roi feature batch.

        The running BN statistics live under the roi-head param tree (the
        shared head always runs norm_eval) — stop_gradient keeps them out
        of the backward graph, and frozen_param_paths keeps the optimizer
        off them."""
        if self.shared_net is None:
            return roi_feats
        sp = variables['params']['shared']
        sv = {'params': sp['params'],
              'batch_stats': jax.tree_util.tree_map(
                  jax.lax.stop_gradient, sp['batch_stats'])}
        return self.shared_net.apply(sv, roi_feats)

    def frozen_param_paths(self):
        """Optimizer freeze patterns contributed by this head (the shared
        res5's running stats are data, not weights; its BN affine params
        freeze too under norm_cfg requires_grad=False)."""
        if self.shared_net is None:
            return []
        paths = ['roi_head/shared/batch_stats']
        if getattr(self, '_shared_norm_frozen', False):
            paths.append('roi_head/shared/params/*/bn/*')
        return paths

    def _extract_rois(self, variables, img_feats, img_rois, img_valid,
                      mask=False):
        """Roi features for ONE image: level-routed (SingleRoIExtractor) or
        all-level GRoIE aggregation when the extractor cfg asks for it."""
        size = self.mask_roi_size if mask else self.roi_size
        groie = self.mask_groie if mask else self.groie
        if groie is None:
            first = multi_level_roi_align(img_feats, img_rois, img_valid,
                                          size, self.featmap_strides)
            if mask or self.dpool is None:
                return self._apply_shared(variables, first)
            # deformable RoI pooling: offsets from the first pass, then a
            # second offset-shifted (and optionally modulated) extraction
            from ld_tpu.ops.roi_align import multi_level_roi_align_offsets
            offsets, modmask = self.dpool.apply(
                {'params': variables['params']['dpool']}, first)
            out = multi_level_roi_align_offsets(
                img_feats, img_rois, img_valid, offsets, size,
                self.featmap_strides, gamma=self.dpool_gamma)
            if modmask is not None:
                out = out * modmask
            return out
        from ld_tpu.ops.roi_align import roi_align
        lvl_feats = [roi_align(img_feats[l], img_rois, size, 1.0 / s)
                     for l, s in enumerate(self.featmap_strides)]
        key = 'groie_mask' if mask else 'groie'
        out = groie.apply({'params': variables['params'][key]}, lvl_feats)
        return out * img_valid[:, None, None, None]

    def init_all_variables(self, rng, in_channels=256):
        """Full roi-head param tree (bbox [+ mask] [+ shared res5]
        [+ groie modules])."""
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        ext_c = self.ext_channels or in_channels
        head_c = self.shared_out_channels or ext_c
        params = {}
        if self.shared_net is not None:
            sv = self.shared_net.init(
                jax.random.fold_in(rng, 11),
                jnp.zeros((1, self.roi_size, self.roi_size, ext_c)))
            params['shared'] = dict(params=sv['params'],
                                    batch_stats=sv.get('batch_stats', {}))
        params['bbox'] = self.net.init(
            r1, jnp.zeros((1, self.feat_size, self.feat_size,
                           head_c)))['params']
        zeros = [jnp.zeros((1, self.roi_size, self.roi_size, ext_c))
                 ] * len(self.featmap_strides)
        if self.groie is not None:
            params['groie'] = self.groie.init(r3, zeros)['params']
        if getattr(self, 'dpool', None) is not None:
            params['dpool'] = self.dpool.init(
                jax.random.fold_in(rng, 7), zeros[0])['params']
        if self.mask_head is not None:
            msize = self.mask_head.roi_size if self.shared_net is not None \
                else self.mask_roi_size
            params['mask'] = self.mask_head.net.init(
                r2, jnp.zeros((1, msize, msize, head_c)))['params']
            if self.mask_groie is not None:
                mz = [jnp.zeros((1, self.mask_roi_size, self.mask_roi_size,
                                 ext_c))] * len(self.featmap_strides)
                params['groie_mask'] = self.mask_groie.init(
                    r4, mz)['params']
        return params

    def _bbox_losses(self, cls, reg, rois, labels, roi_valid, roi_pos,
                     deltas, roi_weights, roi_gt_inds):
        """Classification + regression losses over the sampled roi batch.
        PISARoIHead overrides this to apply ISR-P/CARL reweighting."""
        labels_f = labels.reshape(-1)
        validf = roi_valid.reshape(-1).astype(jnp.float32)
        posf = roi_pos.reshape(-1).astype(jnp.float32)
        avg = jnp.maximum(validf.sum(), 1.0)
        loss_cls = self.loss_cls_fn(
            cls, labels_f, weight=validf * roi_weights.reshape(-1),
            avg_factor=avg)
        reg_sel = self._select_reg(reg, labels_f)
        if self.reg_decoded_bbox:
            # deltas holds raw matched gt boxes here; decode predictions
            # onto the rois, and park invalid/negative rows AT the target
            # so degenerate padded rois cannot poison the IoU loss
            decoded = self.coder.decode(rois.reshape(-1, 4), reg_sel)
            tgt = deltas.reshape(-1, 4)
            pos_mask = posf[:, None] > 0
            decoded = jnp.where(pos_mask, decoded, tgt)
            loss_bbox = self.loss_bbox_fn(
                decoded, tgt, weight=posf, avg_factor=avg)
        else:
            loss_bbox = self.loss_bbox_fn(
                reg_sel, deltas.reshape(-1, 4),
                weight=jnp.repeat(posf[:, None], 4, 1),
                avg_factor=jnp.maximum(posf.sum(), 1.0) * 4.0)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    def _select_reg(self, reg, labels_f):
        if self.reg_class_agnostic:
            return reg
        reg = reg.reshape(-1, self.num_classes, 4)
        safe_lab = jnp.clip(labels_f, 0, self.num_classes - 1)
        return jnp.take_along_axis(
            reg, safe_lab[:, None, None].repeat(4, -1), axis=1)[:, 0]

    def forward_train(self, variables, feats, proposals, prop_valid, batch,
                      rng) -> Dict[str, jnp.ndarray]:
        """feats: list of (B, H, W, C); proposals (B, P, 4);
        variables: {'params': {'bbox': ..., 'mask': ...}} (mask optional)."""
        b = proposals.shape[0]
        rngs = jax.random.split(rng, b)

        def extract(img_feats, img_rois, img_valid):
            return self._extract_rois(variables, img_feats, img_rois,
                                      img_valid)

        extras = None
        if self._hard_mining:
            bbox_vars = self._bbox_vars(variables)

            def prelim(img_feats, gtb, gtl, gtv, props, pv):
                cand = jnp.concatenate([gtb, props]) \
                    if self.add_gt_as_proposals else props
                cv = jnp.concatenate([gtv, pv]) \
                    if self.add_gt_as_proposals else pv
                rf = extract(img_feats, cand, cv)
                cls, _ = self.net.apply(bbox_vars, rf)
                cls = jax.lax.stop_gradient(cls)
                res = self.assigner.assign(
                    cand, [cand.shape[0]], gtb, gtl, gtv, cv,
                    num_classes=self.num_classes)
                lab = jnp.where(res.pos_mask, res.labels, self.num_classes)
                logp = jax.nn.log_softmax(cls, -1)
                ce = -jnp.take_along_axis(logp, lab[:, None], 1)[:, 0]
                probs = jax.nn.softmax(cls, -1)[:, :self.num_classes]
                return ce, probs.max(-1)

            ce, sc = jax.vmap(prelim)(
                [f for f in feats[:len(self.featmap_strides)]],
                batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'],
                proposals, prop_valid)
            extras = dict(loss=ce, scores=sc)

        (rois, roi_valid, roi_pos, labels, deltas, roi_gt_inds,
         roi_weights) = jax.vmap(self.sample_rois)(
             proposals, prop_valid, batch['gt_bboxes'],
             batch['gt_labels'], batch['gt_valid'], rngs, extras)

        roi_feats = jax.vmap(extract)(
            [f for f in feats[:len(self.featmap_strides)]], rois, roi_valid)
        cls, reg = self.net.apply(
            self._bbox_vars(variables),
            roi_feats.reshape(-1, *roi_feats.shape[-3:]))
        losses = self._bbox_losses(cls, reg, rois, labels, roi_valid,
                                   roi_pos, deltas, roi_weights,
                                   roi_gt_inds)
        if self.mask_head is not None and 'gt_masks' in batch:
            mask_vars = self._mask_vars(variables)
            def mask_extract(img_feats, img_rois, img_valid):
                return self._extract_rois(variables, img_feats, img_rois,
                                          img_valid, mask=True)
            mask_feats = jax.vmap(mask_extract)(
                [f for f in feats[:len(self.featmap_strides)]], rois,
                roi_valid & roi_pos)
            def one_img(mf, r, rp, rl, rgi, gm):
                return self.mask_head.loss(mask_vars, mf, r, rp, rl, rgi,
                                           gm)
            loss_mask = jax.vmap(one_img)(
                mask_feats, rois, roi_pos, labels, roi_gt_inds,
                batch['gt_masks'])
            losses['loss_mask'] = loss_mask.mean()
        return losses

    # ---- inference ------------------------------------------------------------
    def simple_test(self, variables, feats, proposals, prop_valid, img_hw,
                    scale_factor=None, rescale=False, cfg=None,
                    with_masks=None):
        """Returns (dets, labels, valid) and, when the mask branch exists
        (with_masks defaulting to True then), a 4th element: per-detection
        sigmoid masks (B, max_per_img, 2*roi, 2*roi) in roi coordinates
        (paste-to-image happens on host; parity: FCNMaskHead.get_seg_masks)."""
        cfg = cfg or self.test_cfg
        if with_masks is None:
            with_masks = self.mask_head is not None

        bbox_vars = self._bbox_vars(variables)

        def per_image(img_feats, img_rois, img_valid, hw, sf):
            roi_feats = self._extract_rois(variables, img_feats, img_rois,
                                           img_valid)
            cls, reg = self.net.apply(bbox_vars, roi_feats)
            scores = jax.nn.softmax(cls, axis=-1)[:, :self.num_classes]
            scores = scores * img_valid[:, None]
            if self.reg_class_agnostic:
                boxes = self.coder.decode(img_rois, reg, max_shape=hw)
                boxes = jnp.broadcast_to(boxes[:, None, :],
                                         (boxes.shape[0], self.num_classes,
                                          4))
            else:
                reg = reg.reshape(-1, self.num_classes, 4)
                boxes = self.coder.decode(img_rois[:, None, :], reg,
                                          max_shape=hw)
            if rescale and sf is not None:
                boxes = boxes / sf[None, None, :]
            # class-specific boxes: flatten (R, C) pairs for the NMS
            flat_boxes = boxes.reshape(-1, 4)
            flat_scores = scores.reshape(-1)
            # multiclass_nms expects (N, C); rebuild a sparse layout
            return multiclass_nms(
                flat_boxes,
                jax.nn.one_hot(jnp.tile(jnp.arange(self.num_classes),
                                        scores.shape[0]),
                               self.num_classes) * flat_scores[:, None],
                cfg.get('score_thr', 0.05),
                cfg.get('nms', {}).get('iou_threshold', 0.5),
                max_per_img=cfg.get('max_per_img', 100),
                nms_cfg=cfg.get('nms', {}))

        if scale_factor is None:
            scale_factor = jnp.ones((proposals.shape[0], 4))
        dets, labels, valid = jax.vmap(per_image)(
            [f for f in feats[:len(self.featmap_strides)]], proposals,
            prop_valid, img_hw, scale_factor)
        if not with_masks or self.mask_head is None:
            return dets, labels, valid
        mask_vars = self._mask_vars(variables)

        def per_image_masks(img_feats, img_dets, img_labels, img_valid, sf):
            boxes = img_dets[:, :4]
            if rescale:  # mask rois need network-input coordinates
                boxes = boxes * sf[None, :]
            roi_feats = self._extract_rois(variables, img_feats, boxes,
                                           img_valid, mask=True)
            return self.mask_head.predict(mask_vars, roi_feats,
                                          img_labels)

        masks = jax.vmap(per_image_masks)(
            [f for f in feats[:len(self.featmap_strides)]], dets, labels,
            valid, scale_factor)
        return dets, labels, valid, masks


class SABLBBoxHeadNet(nn.Module):
    """SABL two-stage bbox head, side-aware tower included.

    Parity: /root/reference/mmdet/models/roi_heads/bbox_heads/sabl_head.py:55
    — cls branch (num_cls_fcs FCs over the flattened roi); reg branch:
    reg_pre_num 3x3 convs -> per-axis attention pooling (1x1 conv + sigmoid,
    normalized over the pooled axis) -> reg_post_num 1-D convs along the
    kept axis -> ConvTranspose upsample by reg_feat_up_ratio so each spatial
    position maps 1:1 onto a bucket (roi_size * ratio == num_buckets) ->
    shared per-position Dense predictors -> side-aware split (left half
    kept, right half flipped) giving (l, r) x-buckets then (t, d) y-buckets
    — the same side order as BucketingBBoxCoder.encode."""
    num_classes: int
    side_num: int
    fc_dim: int = 1024            # cls_out_channels
    conv_dim: int = 256           # reg_in_channels
    roi_size: int = 7
    reg_feat_up_ratio: int = 2
    reg_pre_num: int = 2
    reg_post_num: int = 1
    num_cls_fcs: int = 1
    num_reg_fcs: int = 0
    reg_offset_out_channels: int = 256
    reg_cls_out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    def _side_split(self, feat):
        # reference sabl_head.py:268 side_aware_split: left half as-is,
        # right half flipped so both sides index buckets inside-out
        up = self.roi_size * self.reg_feat_up_ratio
        l_end = int(np.ceil(up / 2))
        r_start = int(np.floor(up / 2))
        return jnp.concatenate(
            [feat[:, :l_end], feat[:, r_start:][:, ::-1]], axis=-1)

    @nn.compact
    def __call__(self, roi_feats):
        r = roi_feats.shape[0]
        c = roi_feats.reshape(r, -1)
        for i in range(self.num_cls_fcs):
            c = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                                 name=f'cls_fc{i + 1}')(c))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name='fc_cls')(c)

        g = roi_feats
        for i in range(self.reg_pre_num):
            g = nn.relu(nn.Conv(self.conv_dim, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name=f'reg_pre_conv{i}')(g))
        # attention pooling (reference attention_pool): fx pools over H
        # (per-column features), fy pools over W (per-row features)
        att_x = jax.nn.sigmoid(nn.Conv(
            1, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name='reg_conv_att_x')(g))
        att_y = jax.nn.sigmoid(nn.Conv(
            1, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name='reg_conv_att_y')(g))
        att_x = att_x / att_x.sum(axis=1, keepdims=True)
        att_y = att_y / att_y.sum(axis=2, keepdims=True)
        fx = (g * att_x).sum(axis=1)              # (R, W, C)
        fy = (g * att_y).sum(axis=2)              # (R, H, C)
        for i in range(self.reg_post_num):
            fx = nn.relu(nn.Conv(self.conv_dim, (3,), padding=[(1, 1)],
                                 dtype=self.dtype,
                                 name=f'reg_post_conv_x{i}')(fx))
            fy = nn.relu(nn.Conv(self.conv_dim, (3,), padding=[(1, 1)],
                                 dtype=self.dtype,
                                 name=f'reg_post_conv_y{i}')(fy))
        if self.reg_feat_up_ratio > 1:
            k = (self.reg_feat_up_ratio,)
            fx = nn.relu(nn.ConvTranspose(self.conv_dim, k, strides=k,
                                          dtype=self.dtype,
                                          name='upsample_x')(fx))
            fy = nn.relu(nn.ConvTranspose(self.conv_dim, k, strides=k,
                                          dtype=self.dtype,
                                          name='upsample_y')(fy))

        # per-position predictors, SHARED across the x and y axes
        # (reference reg_pred uses the same fc_reg_cls/fc_reg_offset)
        off_fcs = [nn.Dense(self.reg_offset_out_channels, dtype=self.dtype,
                            name=f'reg_offset_fc{i + 1}')
                   for i in range(self.num_reg_fcs)]
        cls_fcs = [nn.Dense(self.reg_cls_out_channels, dtype=self.dtype,
                            name=f'reg_cls_fc{i + 1}')
                   for i in range(self.num_reg_fcs)]
        fc_off = nn.Dense(1, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.001),
                          name='fc_reg_offset')
        fc_cls = nn.Dense(1, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          name='fc_reg_cls')

        def reg_pred(f):
            xo, xc = f, f
            for fc in off_fcs:
                xo = nn.relu(fc(xo))
            for fc in cls_fcs:
                xc = nn.relu(fc(xc))
            return fc_off(xo)[..., 0], fc_cls(xc)[..., 0]   # (R, up)

        off_x, cls_x = reg_pred(fx)
        off_y, cls_y = reg_pred(fy)
        bucket_off = jnp.concatenate(
            [self._side_split(off_x), self._side_split(off_y)], axis=-1)
        bucket_cls = jnp.concatenate(
            [self._side_split(cls_x), self._side_split(cls_y)], axis=-1)
        return (cls.astype(jnp.float32),
                (bucket_cls.astype(jnp.float32),
                 bucket_off.astype(jnp.float32)))


@HEADS.register_module()
class TridentRoIHead(StandardRoIHead):
    """Trident ROI head (reference trident_roi_head.py): the reference
    merges three branches' proposals here; in this stack the branch fold
    (B -> 3B) and test-branch slicing live in TridentFasterRCNN, so this
    head only carries the config knobs."""

    def __init__(self, num_branch=3, test_branch_idx=1, **kwargs):
        self.num_branch = num_branch
        self.test_branch_idx = test_branch_idx
        super().__init__(**kwargs)


@HEADS.register_module()
class SABLRoIHead(StandardRoIHead):
    """StandardRoIHead with the SABL bucketing bbox head (the reference
    expresses this as bbox_head type='SABLHead' inside StandardRoIHead —
    sabl_faster_rcnn/sabl_cascade configs)."""

    def __init__(self, bbox_roi_extractor=None, bbox_head=None, **kwargs):
        bbox_head = dict(bbox_head or {})
        coder_cfg = dict(bbox_head.get('bbox_coder') or dict(
            type='BucketingBBoxCoder', num_buckets=14, scale_factor=1.7))
        super().__init__(bbox_roi_extractor=bbox_roi_extractor,
                         bbox_head=bbox_head, **kwargs)
        if self._hard_mining:
            raise NotImplementedError(
                'OHEM/ScoreHLR hard mining is not wired into SABLRoIHead '
                '— use RandomSampler')
        self.coder = build_coder(coder_cfg)
        self.loss_bbox_cls_fn = LOSSES.build(
            bbox_head.get('loss_bbox_cls') or dict(
                type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0))
        self.loss_bbox_reg_fn = LOSSES.build(
            bbox_head.get('loss_bbox_reg') or dict(
                type='SmoothL1Loss', beta=0.1, loss_weight=1.0))
        self.net = SABLBBoxHeadNet(
            num_classes=self.num_classes, side_num=self.coder.side_num,
            fc_dim=bbox_head.get('cls_out_channels',
                                 bbox_head.get('fc_out_channels', 1024)),
            conv_dim=bbox_head.get('reg_in_channels',
                                   bbox_head.get('conv_out_channels', 256)),
            roi_size=self.roi_size,
            reg_feat_up_ratio=bbox_head.get('reg_feat_up_ratio', 2),
            reg_pre_num=bbox_head.get('reg_pre_num', 2),
            reg_post_num=bbox_head.get('reg_post_num', 1),
            num_cls_fcs=bbox_head.get('num_cls_fcs', 1),
            num_reg_fcs=bbox_head.get('num_reg_fcs', 0),
            reg_offset_out_channels=bbox_head.get(
                'reg_offset_out_channels', 256),
            reg_cls_out_channels=bbox_head.get('reg_cls_out_channels', 256))

    def _encode_roi_targets(self, rois, matched_gt):
        # bucketing encode happens in forward_train against the full roi
        # batch; the sampler carries the matched gt box through instead
        return matched_gt

    def forward_train(self, variables, feats, proposals, prop_valid, batch,
                      rng) -> Dict[str, jnp.ndarray]:
        b = proposals.shape[0]
        rngs = jax.random.split(rng, b)
        (rois, roi_valid, roi_pos, labels, gt_boxes, roi_gt_inds,
         roi_weights) = jax.vmap(self.sample_rois)(
             proposals, prop_valid, batch['gt_bboxes'],
             batch['gt_labels'], batch['gt_valid'], rngs, None)

        def extract(img_feats, img_rois, img_valid):
            return self._extract_rois(variables, img_feats, img_rois,
                                      img_valid)

        roi_feats = jax.vmap(extract)(
            [f for f in feats[:len(self.featmap_strides)]], rois, roi_valid)
        cls, (bucket_cls, bucket_off) = self.net.apply(
            self._bbox_vars(variables),
            roi_feats.reshape(-1, *roi_feats.shape[-3:]))
        labels_f = labels.reshape(-1)
        validf = roi_valid.reshape(-1).astype(jnp.float32)
        posf = roi_pos.reshape(-1).astype(jnp.float32)
        avg = jnp.maximum(validf.sum(), 1.0)
        loss_cls = self.loss_cls_fn(
            cls, labels_f, weight=validf * roi_weights.reshape(-1),
            avg_factor=avg)
        offs, off_w, lab1h, cls_w = self.coder.encode(
            rois.reshape(-1, 4), gt_boxes.reshape(-1, 4))
        n_pos = jnp.maximum(posf.sum(), 1.0)
        sn = self.coder.side_num
        # bucket classification: BCE against the one-hot nearest bucket,
        # near-miss neighbours ignored (cls_w), positives only
        loss_bucket_cls = self.loss_bbox_cls_fn(
            bucket_cls, lab1h,
            weight=cls_w * posf[:, None],
            avg_factor=n_pos * 4.0 * sn)
        # in-bucket offsets on the top-k nearest buckets
        loss_bucket_reg = self.loss_bbox_reg_fn(
            bucket_off, offs,
            weight=off_w * posf[:, None],
            avg_factor=n_pos * 4.0 * self.coder.offset_topk)
        losses = dict(loss_cls=loss_cls, loss_bbox_cls=loss_bucket_cls,
                      loss_bbox_reg=loss_bucket_reg)
        # optional mask branch (SABL + mask: the bucketing bbox head is
        # orthogonal to the mask machinery, same as StandardRoIHead)
        if self.mask_head is not None and 'gt_masks' in batch:
            mask_vars = self._mask_vars(variables)

            def mask_extract(img_feats, img_rois, img_valid):
                return self._extract_rois(variables, img_feats, img_rois,
                                          img_valid, mask=True)

            mask_feats = jax.vmap(mask_extract)(
                [f for f in feats[:len(self.featmap_strides)]], rois,
                roi_valid & roi_pos)

            def one_img(mf, r, rp, rl, rgi, gm):
                return self.mask_head.loss(mask_vars, mf, r, rp, rl, rgi,
                                           gm)

            losses['loss_mask'] = jax.vmap(one_img)(
                mask_feats, rois, roi_pos, labels, roi_gt_inds,
                batch['gt_masks']).mean()
        return losses

    def simple_test(self, variables, feats, proposals, prop_valid, img_hw,
                    scale_factor=None, rescale=False, cfg=None,
                    with_masks=None):
        cfg = cfg or self.test_cfg
        bbox_vars = self._bbox_vars(variables)

        def per_image(img_feats, img_rois, img_valid, hw, sf):
            roi_feats = self._extract_rois(variables, img_feats, img_rois,
                                           img_valid)
            cls, (bucket_cls, bucket_off) = self.net.apply(bbox_vars,
                                                           roi_feats)
            scores = jax.nn.softmax(cls, axis=-1)[:, :self.num_classes]
            boxes, conf = self.coder.decode(img_rois,
                                            (bucket_cls, bucket_off),
                                            max_shape=hw)
            # bucketing-guided rescoring (reference sabl_head get_bboxes)
            scores = scores * conf[:, None] * img_valid[:, None]
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            return multiclass_nms(
                boxes, scores, cfg.get('score_thr', 0.05),
                cfg.get('nms', {}).get('iou_threshold', 0.5),
                max_per_img=cfg.get('max_per_img', 100),
                nms_cfg=cfg.get('nms', {}))

        if scale_factor is None:
            scale_factor = jnp.ones((proposals.shape[0], 4))
        dets, labels, valid = jax.vmap(per_image)(
            [f for f in feats[:len(self.featmap_strides)]], proposals,
            prop_valid, img_hw, scale_factor)
        if with_masks is None:
            with_masks = self.mask_head is not None
        if not with_masks or self.mask_head is None:
            return dets, labels, valid
        mask_vars = self._mask_vars(variables)

        def per_image_masks(img_feats, img_dets, img_labels, img_valid, sf):
            boxes = img_dets[:, :4]
            if rescale:
                boxes = boxes * sf[None, :]
            roi_feats = self._extract_rois(variables, img_feats, boxes,
                                           img_valid, mask=True)
            return self.mask_head.predict(mask_vars, roi_feats, img_labels)

        masks = jax.vmap(per_image_masks)(
            [f for f in feats[:len(self.featmap_strides)]], dets, labels,
            valid, scale_factor)
        return dets, labels, valid, masks
