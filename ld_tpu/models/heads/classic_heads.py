"""Classic (non-distributional) FCOS and ATSS heads.

Parity: /root/reference/mmdet/models/dense_heads/fcos_head.py:629 and
atss_head.py:689 — the plain variants used across the inherited zoo (the LD
study's GFL-ized versions live in fcos_gfl_head.py / atss_gfl_head.py):

  * FCOSHead: towers + Scale on a 4-channel distance regression
    (exp or relu-normalized), centerness branch, IoU-family loss on decoded
    boxes, focal cls.
  * ATSSHead: anchor-based, DeltaXYWH regression with GIoU on decoded boxes
    weighted by centerness targets, centerness BCE, focal cls.

Both reuse the dense masked target machinery of their GFL counterparts —
only the regression parameterization differs.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.ops import anchor_center, distance2bbox
from ld_tpu.ops.coder import build_coder
from ld_tpu.ops.nms import multiclass_nms, topk_flat
from ld_tpu.utils.registry import HEADS, LOSSES
from .atss_gfl_head import ATSSGFLHead, ATSSGFLHeadNet, centerness_target
from .fcos_gfl_head import FCOSGFLHead, FCOSGFLHeadNet
from .gfl_head import ConvGNBlock, _CLS_BIAS_INIT, flatten_levels


class FCOSHeadNet(nn.Module):
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    centerness_on_reg: bool = False
    dcn_on_last_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        last = self.stacked_convs - 1
        cls_convs = [ConvGNBlock(
            self.feat_channels, dtype=self.dtype,
            with_dcn=self.dcn_on_last_conv and i == last,
            name=f'cls_conv{i}') for i in range(self.stacked_convs)]
        reg_convs = [ConvGNBlock(
            self.feat_channels, dtype=self.dtype,
            with_dcn=self.dcn_on_last_conv and i == last,
            name=f'reg_conv{i}') for i in range(self.stacked_convs)]
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(
                               _CLS_BIAS_INIT), name='conv_cls')
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_reg')
        conv_ctr = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_centerness')
        scales = self.param('scales', nn.initializers.ones,
                            (self.num_levels, ))
        cls_scores, bbox_preds, centernesses = [], [], []
        for lvl, x in enumerate(feats):
            c, r = x, x
            for conv in cls_convs:
                c = conv(c)
            for conv in reg_convs:
                r = conv(r)
            cls_scores.append(conv_cls(c).astype(jnp.float32))
            # exp parameterization keeps distances positive (fcos_head.py)
            bbox_preds.append(
                jnp.exp(jnp.clip(conv_reg(r).astype(jnp.float32) *
                                 scales[lvl], -10, 8)))
            centernesses.append(
                conv_ctr(r if self.centerness_on_reg else c).astype(
                    jnp.float32))
        return cls_scores, bbox_preds, centernesses


@HEADS.register_module()
class FCOSHead(FCOSGFLHead):
    """Plain FCOS: direct positive distances instead of distributions."""

    def __init__(self, num_classes, in_channels, loss_bbox=None, **kwargs):
        kwargs.setdefault('loss_bbox',
                          loss_bbox or dict(type='IoULoss', loss_weight=1.0))
        kwargs.pop('reg_max', None)
        super().__init__(num_classes, in_channels, **kwargs)

    def _build_net(self, dtype):
        return FCOSHeadNet(num_classes=self.num_classes,
                           feat_channels=self.feat_channels,
                           stacked_convs=self.stacked_convs,
                           num_levels=len(self.strides_cfg),
                           centerness_on_reg=getattr(self,
                                                     'centerness_on_reg',
                                                     False),
                           dcn_on_last_conv=getattr(
                               self, 'dcn_on_last_conv', False),
                           dtype=dtype)

    def _fcos_core(self, outputs, batch, featmap_sizes):
        cls_scores, bbox_preds, centernesses = outputs
        t = self.fcos_targets(featmap_sizes, batch['gt_bboxes'],
                              batch['gt_labels'], batch['gt_valid'])
        cls_flat = flatten_levels(cls_scores).astype(jnp.float32)
        dist_flat = flatten_levels(bbox_preds).astype(jnp.float32)
        ctr_flat = flatten_levels(centernesses).astype(jnp.float32)[..., 0]

        pos = t['pos']
        posf = pos.astype(jnp.float32)
        num_pos = jnp.maximum(posf.sum(), 1.0)
        loss_cls = self.loss_cls(cls_flat, t['labels'], avg_factor=num_pos)

        bt = t['bbox_targets']
        lr_min = jnp.minimum(bt[..., 0], bt[..., 2])
        lr_max = jnp.maximum(jnp.maximum(bt[..., 0], bt[..., 2]), 1e-6)
        tb_min = jnp.minimum(bt[..., 1], bt[..., 3])
        tb_max = jnp.maximum(jnp.maximum(bt[..., 1], bt[..., 3]), 1e-6)
        ctr_targets = jnp.where(
            pos, jnp.sqrt(jnp.clip((lr_min / lr_max) * (tb_min / tb_max),
                                   0.0)), 0.0)
        bbox_avg = jnp.maximum(ctr_targets.sum(), 1e-6)

        pts = t['points'][None]
        # plain FCOS: distances predicted in PIXELS (exp * scale)
        decoded = distance2bbox(pts, dist_flat * t['strides'][None, :, None])
        decoded_targets = distance2bbox(pts, bt)
        loss_bbox = self.loss_bbox(decoded.reshape(-1, 4),
                                   decoded_targets.reshape(-1, 4),
                                   weight=ctr_targets.reshape(-1),
                                   avg_factor=bbox_avg)
        bce = jnp.maximum(ctr_flat, 0) - ctr_flat * ctr_targets + \
            jnp.log1p(jnp.exp(-jnp.abs(ctr_flat)))
        loss_centerness = self.loss_centerness.loss_weight * (
            bce * posf).sum() / num_pos
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_centerness=loss_centerness, pos=pos, posf=posf,
                    cls_flat=cls_flat, pred_flat=dist_flat, targets=t,
                    num_pos=num_pos)

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        cfg = cfg or self.test_cfg
        cls_scores, bbox_preds, centernesses = outputs
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        points, strides, _, _ = self.point_geometry(featmap_sizes)
        nms_pre = cfg.get('nms_pre', 1000)
        lvl_sizes = [h * w for h, w in featmap_sizes]

        def per_image(cls_list, dist_list, ctr_list, hw, sf):
            boxes_all, scores_all = [], []
            lo = 0
            for lvl in range(len(featmap_sizes)):
                n_lvl = lvl_sizes[lvl]
                s = float(self.strides_cfg[lvl])
                scores = jax.nn.sigmoid(
                    cls_list[lvl].reshape(-1, self.cls_out_channels))
                ctr = jax.nn.sigmoid(ctr_list[lvl].reshape(-1))
                scores = scores * ctr[:, None]
                dist = dist_list[lvl].reshape(-1, 4) * s
                pts = points[lo:lo + n_lvl]
                if nms_pre > 0 and n_lvl > nms_pre:
                    _, topk = topk_flat(scores.max(-1), nms_pre)
                    scores, dist, pts = scores[topk], dist[topk], pts[topk]
                boxes_all.append(distance2bbox(pts, dist, max_shape=hw))
                scores_all.append(scores)
                lo += n_lvl
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            return multiclass_nms(boxes, scores, cfg.get('score_thr', 0.05),
                                  cfg.get('nms', {}).get('iou_threshold',
                                                         0.5),
                                  max_per_img=cfg.get('max_per_img', 100))

        b = cls_scores[0].shape[0]
        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)([c for c in cls_scores],
                                   [p for p in bbox_preds],
                                   [c for c in centernesses], img_hw,
                                   scale_factor)


class ATSSHeadNet(ATSSGFLHeadNet):
    """ATSS tower emitting 4 delta channels instead of distributions."""

    def setup(self):
        self.cls_convs = [ConvGNBlock(self.feat_channels, dtype=self.dtype,
                                      name=f'cls_conv{i}')
                          for i in range(self.stacked_convs)]
        self.reg_convs = [ConvGNBlock(self.feat_channels, dtype=self.dtype,
                                      name=f'reg_conv{i}')
                          for i in range(self.stacked_convs)]
        self.atss_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1)] * 2,
            dtype=self.dtype, kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(_CLS_BIAS_INIT),
            name='atss_cls')
        self.atss_reg = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2,
                                dtype=self.dtype,
                                kernel_init=nn.initializers.normal(0.01),
                                name='atss_reg')
        self.atss_centerness = nn.Conv(
            1, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name='atss_centerness')
        self.scales = self.param('scales', nn.initializers.ones,
                                 (self.num_levels, ))


@HEADS.register_module()
class ATSSHead(ATSSGFLHead):
    """Plain ATSS: DeltaXYWH regression on decoded boxes."""

    def __init__(self, num_classes, in_channels, bbox_coder=None, **kwargs):
        kwargs.pop('reg_max', None)
        super().__init__(num_classes, in_channels, **kwargs)
        self.coder = build_coder(bbox_coder or dict(
            type='DeltaXYWHBBoxCoder', target_means=[0.] * 4,
            target_stds=[0.1, 0.1, 0.2, 0.2]))

    def _build_net(self, dtype):
        return ATSSHeadNet(num_classes=self.num_classes,
                           feat_channels=self.feat_channels,
                           stacked_convs=self.stacked_convs, reg_max=0,
                           num_levels=self.num_levels, dtype=dtype)

    def _atss_core(self, outputs, t):
        cls_scores, bbox_preds, centernesses = outputs
        cls_flat = flatten_levels(cls_scores).astype(jnp.float32)
        reg_flat = flatten_levels(bbox_preds).astype(jnp.float32)
        ctr_flat = flatten_levels(centernesses).astype(jnp.float32)[..., 0]

        labels = t['labels']
        pos = t['pos_mask']
        posf = pos.astype(jnp.float32)
        label_weights = t['anchor_valid'].astype(jnp.float32)
        anchors = t['anchors']

        # batch-total clamp (reference reduce_mean(num_total_pos).clamp(min=1))
        num_total_samples = jnp.maximum(posf.sum(), 1.0)
        loss_cls = self.loss_cls(cls_flat, labels, weight=label_weights,
                                 avg_factor=num_total_samples)

        ctr_targets = centerness_target(anchors[None], t['bbox_targets'],
                                        pos)
        bbox_avg = jnp.maximum(ctr_targets.sum(), 1e-6)
        decoded = self.coder.decode(anchors[None], reg_flat)
        loss_bbox = self.loss_bbox(decoded.reshape(-1, 4),
                                   t['bbox_targets'].reshape(-1, 4),
                                   weight=ctr_targets.reshape(-1),
                                   avg_factor=bbox_avg)
        bce = jnp.maximum(ctr_flat, 0) - ctr_flat * ctr_targets + \
            jnp.log1p(jnp.exp(-jnp.abs(ctr_flat)))
        loss_centerness = self.loss_centerness.loss_weight * (
            bce * posf).sum() / num_total_samples
        weight_targets = jnp.where(
            pos, jax.lax.stop_gradient(jax.nn.sigmoid(cls_flat)).max(-1),
            0.0)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_centerness=loss_centerness, pos=pos, posf=posf,
                    label_weights=label_weights, pred_corners=None,
                    weight_targets=weight_targets,
                    num_total_samples=num_total_samples, cls_flat=cls_flat)

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        cfg = cfg or self.test_cfg
        cls_scores, bbox_preds, centernesses = outputs
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        nms_pre = cfg.get('nms_pre', 1000)

        def per_image(cls_list, reg_list, ctr_list, hw, sf):
            boxes_all, scores_all = [], []
            for lvl in range(self.num_levels):
                scores = jax.nn.sigmoid(
                    cls_list[lvl].reshape(-1, self.cls_out_channels))
                ctr = jax.nn.sigmoid(ctr_list[lvl].reshape(-1))
                scores = scores * ctr[:, None]
                reg = reg_list[lvl].reshape(-1, 4)
                anchors = mlvl_anchors[lvl]
                n = scores.shape[0]
                if nms_pre > 0 and n > nms_pre:
                    _, topk = topk_flat(scores.max(-1), nms_pre)
                    scores, reg, anchors = scores[topk], reg[topk], \
                        anchors[topk]
                boxes_all.append(self.coder.decode(anchors, reg,
                                                   max_shape=hw))
                scores_all.append(scores)
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            return multiclass_nms(boxes, scores, cfg.get('score_thr', 0.05),
                                  cfg.get('nms', {}).get('iou_threshold',
                                                         0.6),
                                  max_per_img=cfg.get('max_per_img', 100))

        b = cls_scores[0].shape[0]
        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)([c for c in cls_scores],
                                   [r for r in bbox_preds],
                                   [c for c in centernesses], img_hw,
                                   scale_factor)
