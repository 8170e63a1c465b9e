"""Plain RetinaNet head (delta regression, no distributions).

Parity: /root/reference/mmdet/models/dense_heads/retina_head.py — 4-conv
towers (no norm), A=9 anchors, FocalLoss cls + L1 on DeltaXYWH targets,
MaxIoU assignment. This is the classic head used across the inherited zoo
(the LD study's Retina variant is retina_gfl_head.py, already implemented).
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.ops import anchor_center
from ld_tpu.ops.coder import build_coder
from ld_tpu.ops.nms import multiclass_nms
from ld_tpu.utils.registry import HEADS, LOSSES
from .gfl_head import _CLS_BIAS_INIT
from .retina_gfl_head import RetinaGFLHead, flatten_levels_anchors


class RetinaHeadNet(nn.Module):
    num_classes: int
    num_anchors: int = 9
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        convs_c = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name=f'cls_conv{i}')
                   for i in range(self.stacked_convs)]
        convs_r = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name=f'reg_conv{i}')
                   for i in range(self.stacked_convs)]
        cls_out = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                          padding=[(1, 1)] * 2, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          bias_init=nn.initializers.constant(_CLS_BIAS_INIT),
                          name='retina_cls')
        reg_out = nn.Conv(self.num_anchors * 4, (3, 3),
                          padding=[(1, 1)] * 2, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          name='retina_reg')
        cls_scores, bbox_preds = [], []
        for x in feats:
            c, r = x, x
            for conv in convs_c:
                c = nn.relu(conv(c))
            for conv in convs_r:
                r = nn.relu(conv(r))
            cls_scores.append(cls_out(c).astype(jnp.float32))
            bbox_preds.append(reg_out(r).astype(jnp.float32))
        return cls_scores, bbox_preds


@HEADS.register_module()
class RetinaHead(RetinaGFLHead):
    """Delta-regression RetinaNet (reuses the Retina-GFL scaffolding)."""

    def __init__(self, num_classes, in_channels, bbox_coder=None,
                 loss_bbox=None, **kwargs):
        kwargs.setdefault('loss_bbox', loss_bbox or dict(type='L1Loss',
                                                         loss_weight=1.0))
        super().__init__(num_classes, in_channels, reg_decoded_bbox=False,
                         **kwargs)
        self.coder = build_coder(bbox_coder or dict(
            type='DeltaXYWHBBoxCoder', target_means=[0., 0., 0., 0.],
            target_stds=[1.0, 1.0, 1.0, 1.0]))

    def _build_net(self, dtype):
        self._dtype = dtype
        return RetinaHeadNet(num_classes=self.num_classes,
                             num_anchors=getattr(self, 'num_anchors', 9),
                             feat_channels=self.feat_channels,
                             stacked_convs=self.stacked_convs, dtype=dtype)

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        t = self.build_targets(featmap_sizes, batch['gt_bboxes'],
                               batch['gt_labels'], batch['gt_valid'],
                               batch['img_hw'])
        cls_flat = flatten_levels_anchors(outputs[0],
                                          self.cls_out_channels)
        reg_flat = flatten_levels_anchors(outputs[1], 4)
        labels = t['labels']
        posf = t['pos_mask'].astype(jnp.float32)
        label_weights = t['anchor_valid'].astype(jnp.float32)
        # batch-total clamp (reference AnchorHead num_total_pos semantics)
        num_total = jnp.maximum(posf.sum(), 1.0)
        loss_cls = self.loss_cls(cls_flat.astype(jnp.float32), labels,
                                 weight=label_weights,
                                 avg_factor=num_total)
        deltas = self.coder.encode(t['anchors'][None], t['bbox_targets'])
        loss_bbox = self.loss_bbox(
            reg_flat.reshape(-1, 4).astype(jnp.float32),
            deltas.reshape(-1, 4),
            weight=jnp.repeat(posf.reshape(-1, 1), 4, 1),
            avg_factor=num_total)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        cfg = cfg or self.test_cfg
        cls_scores, bbox_preds = outputs
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        nms_pre = cfg.get('nms_pre', 1000)
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)

        def per_image(cls_list, reg_list, hw, sf):
            boxes_all, scores_all = [], []
            for lvl in range(self.num_levels):
                scores = jax.nn.sigmoid(
                    cls_list[lvl].reshape(-1, self.cls_out_channels))
                reg = reg_list[lvl].reshape(-1, 4)
                anchors = mlvl_anchors[lvl]
                n = scores.shape[0]
                if nms_pre > 0 and n > nms_pre:
                    _, topk = jax.lax.top_k(scores.max(-1), nms_pre)
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
                                                         0.5),
                                  max_per_img=cfg.get('max_per_img', 100))

        b = cls_scores[0].shape[0]
        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)([c for c in cls_scores],
                                   [r for r in bbox_preds], img_hw,
                                   scale_factor)


class RetinaSepBNNet(nn.Module):
    """Towers with SHARED conv weights but per-FPN-level BN (reference
    retina_sepbn_head.py:32-72: `self.cls_convs[j][i].conv =
    self.cls_convs[0][i].conv` aliases the convs, norms stay distinct)."""
    num_classes: int
    num_ins: int = 5
    num_anchors: int = 9
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        from ld_tpu.models.backbones.resnet import BatchNorm
        convs_c = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                           use_bias=False, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name=f'cls_conv{i}')
                   for i in range(self.stacked_convs)]
        convs_r = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                           use_bias=False, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name=f'reg_conv{i}')
                   for i in range(self.stacked_convs)]
        cls_out = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                          padding=[(1, 1)] * 2, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          bias_init=nn.initializers.constant(_CLS_BIAS_INIT),
                          name='retina_cls')
        reg_out = nn.Conv(self.num_anchors * 4, (3, 3),
                          padding=[(1, 1)] * 2, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          name='retina_reg')
        # per-(level, depth) norms — sepbn trains with BN running stats ON
        # (NAS-FPN recipe), so use_running_average only outside train
        norms_c = [[BatchNorm(use_running_average=False, dtype=self.dtype,
                              name=f'cls_norm_l{l}_d{i}')
                    for i in range(self.stacked_convs)]
                   for l in range(self.num_ins)]
        norms_r = [[BatchNorm(use_running_average=False, dtype=self.dtype,
                              name=f'reg_norm_l{l}_d{i}')
                    for i in range(self.stacked_convs)]
                   for l in range(self.num_ins)]
        cls_scores, bbox_preds = [], []
        for l, x in enumerate(feats):
            c, r = x, x
            for i in range(self.stacked_convs):
                c = nn.relu(norms_c[l][i](convs_c[i](c), train))
                r = nn.relu(norms_r[l][i](convs_r[i](r), train))
            cls_scores.append(cls_out(c).astype(jnp.float32))
            bbox_preds.append(reg_out(r).astype(jnp.float32))
        return cls_scores, bbox_preds


@HEADS.register_module()
class RetinaSepBNHead(RetinaHead):
    """RetinaHead with shared convs + separate per-level BN (NAS-FPN).

    Parity: /root/reference/mmdet/models/dense_heads/retina_sepbn_head.py.
    """

    def __init__(self, num_classes, num_ins=5, in_channels=256, **kwargs):
        self.num_ins = num_ins
        super().__init__(num_classes, in_channels, **kwargs)

    def _build_net(self, dtype):
        self._dtype = dtype
        return RetinaSepBNNet(num_classes=self.num_classes,
                              num_ins=self.num_ins,
                              num_anchors=getattr(self, 'num_anchors', 9),
                              feat_channels=self.feat_channels,
                              stacked_convs=self.stacked_convs, dtype=dtype)
