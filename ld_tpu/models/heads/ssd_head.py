"""SSD head with hard-negative mining.

Parity: /root/reference/mmdet/models/dense_heads/ssd_head.py:265 — per-level
separate 3x3 cls/reg convs over heterogeneous-channel features, softmax CE
(background = class C) with 3:1 online hard-negative mining, SmoothL1 on
DeltaXYWH targets, MaxIoU assignment (0.5/0.5, every gt keeps its best
anchor).

TPU re-design: hard-negative mining selects the top-(3*num_pos) negative CE
losses with a rank threshold over the per-anchor loss vector — one sort per
image instead of `topk(nonzero(...))` gathers; num_pos stays a traced value.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.ops import AnchorGenerator, anchor_center
from ld_tpu.ops.coder import build_coder
from ld_tpu.ops.nms import multiclass_nms
from ld_tpu.utils.registry import ASSIGNERS, HEADS

from .gfl_head import GFLHead


class SSDAnchorGenerator(AnchorGenerator):
    """SSD anchor scheme: per-level min/max sizes from basesize_ratio_range,
    scales [1, sqrt(max/min)], ratios [1, r, 1/r, ...].

    Parity: /root/reference/mmdet/core/anchor/anchor_generator.py:350."""

    def __init__(self, strides, ratios, input_size=300,
                 basesize_ratio_range=(0.15, 0.9), **kwargs):
        self.input_size = input_size
        self.basesize_ratio_range = basesize_ratio_range
        num_levels = len(strides)
        min_ratio, max_ratio = (int(r * 100) for r in basesize_ratio_range)
        step = int(np.floor(max_ratio - min_ratio) / (num_levels - 2))
        min_sizes = []
        max_sizes = []
        for ratio in range(min_ratio, max_ratio + 1, step):
            min_sizes.append(int(input_size * ratio / 100))
            max_sizes.append(int(input_size * (ratio + step) / 100))
        # first-level sizes: the reference hard-codes them per
        # (input_size, ratio_range) recipe (anchor_generator.py:388-406)
        if input_size == 512 and basesize_ratio_range[0] == 0.1:
            first = (4, 10)       # SSD512 COCO
        elif input_size == 512 and basesize_ratio_range[0] == 0.15:
            first = (7, 15)       # SSD512 VOC
        elif basesize_ratio_range[0] == 0.15:
            first = (7, 15)       # SSD300 COCO
        else:
            first = (10, 20)      # SSD300 VOC
        min_sizes.insert(0, int(input_size * first[0] / 100))
        max_sizes.insert(0, int(input_size * first[1] / 100))

        self.strides = [(s, s) if not isinstance(s, (tuple, list)) else s
                        for s in strides]
        self.centers = [(s[0] / 2.0, s[1] / 2.0) for s in self.strides]
        self.base_sizes = min_sizes
        self.min_sizes = min_sizes
        self.max_sizes = max_sizes
        self.level_ratios = ratios
        self.base_anchors = [
            self._ssd_level_anchors(lvl) for lvl in range(num_levels)
        ]

    def _ssd_level_anchors(self, lvl):
        mn, mx = self.min_sizes[lvl], self.max_sizes[lvl]
        cx, cy = self.centers[lvl]
        scales = [1.0, float(np.sqrt(mx / mn))]
        ratios = [1.0]
        for r in self.level_ratios[lvl]:
            ratios += [1.0 / r, float(r)]
        anchors = []
        # first: min scale at every ratio? mmdet: anchors = scale-major for
        # ratio 1 (both scales), then other ratios at scale 1 only
        for s in scales:
            w = h = mn * s
            anchors.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
        for r in ratios[1:]:
            w = mn * np.sqrt(r)
            h = mn / np.sqrt(r)
            anchors.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
        return np.asarray(anchors, np.float32)


class LegacySSDAnchorGenerator(SSDAnchorGenerator):
    """mmdet-1.x SSD anchors: centers at (stride-1)/2 instead of stride/2.

    Parity: /root/reference/mmdet/core/anchor/anchor_generator.py:573
    (LegacySSDAnchorGenerator) — used by configs/legacy_1.x/ssd300_coco_v1.
    """

    def __init__(self, strides, ratios, input_size=300,
                 basesize_ratio_range=(0.15, 0.9), **kwargs):
        super().__init__(strides, ratios, input_size=input_size,
                         basesize_ratio_range=basesize_ratio_range,
                         **kwargs)
        self.centers = [((s[0] - 1) / 2.0, (s[1] - 1) / 2.0)
                        for s in self.strides]
        self.base_anchors = [
            self._ssd_level_anchors(lvl)
            for lvl in range(len(self.strides))
        ]


class SSDHeadNet(nn.Module):
    num_classes: int
    num_anchors: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cls_scores, bbox_preds = [], []
        for i, x in enumerate(feats):
            a = self.num_anchors[i]
            cls_scores.append(nn.Conv(
                a * (self.num_classes + 1), (3, 3), padding=[(1, 1)] * 2,
                dtype=self.dtype, name=f'cls_conv{i}')(x).astype(
                    jnp.float32))
            bbox_preds.append(nn.Conv(
                a * 4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                name=f'reg_conv{i}')(x).astype(jnp.float32))
        return cls_scores, bbox_preds


@HEADS.register_module()
class SSDHead:

    def __init__(self, num_classes=80, in_channels=(512, 1024, 512, 256,
                                                    256, 256),
                 anchor_generator=None, bbox_coder=None, train_cfg=None,
                 test_cfg=None, neg_pos_ratio=3, dtype=jnp.float32,
                 **kwargs):
        self.num_classes = num_classes
        ag = dict(anchor_generator or dict(
            strides=[8, 16, 32, 64, 100, 300],
            ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
            input_size=300, basesize_ratio_range=(0.15, 0.9)))
        ag_type = ag.pop('type', 'SSDAnchorGenerator')
        ag.pop('scale_major', None)
        ag_cls = (LegacySSDAnchorGenerator if ag_type.startswith('Legacy')
                  else SSDAnchorGenerator)
        self.anchor_generator = ag_cls(**ag)
        self.num_levels = self.anchor_generator.num_levels
        self.coder = build_coder(bbox_coder or dict(
            type='DeltaXYWHBBoxCoder', target_means=[0., 0., 0., 0.],
            target_stds=[0.1, 0.1, 0.2, 0.2]))
        self.train_cfg = train_cfg or {}
        self.test_cfg = test_cfg or dict(
            nms_pre=1000, score_thr=0.02,
            nms=dict(type='nms', iou_threshold=0.45), max_per_img=200)
        a_cfg = dict(self.train_cfg.get('assigner', dict(
            type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.5,
            min_pos_iou=0.0, gt_max_assign_all=False)))
        self.assigner = ASSIGNERS.build(a_cfg)
        self.neg_pos_ratio = self.train_cfg.get('neg_pos_ratio',
                                                neg_pos_ratio)
        self.smoothl1_beta = self.train_cfg.get('smoothl1_beta', 1.0)
        self.net = SSDHeadNet(
            num_classes=num_classes,
            num_anchors=self.anchor_generator.num_base_anchors, dtype=dtype)

    def _flatten(self, cls_scores, bbox_preds):
        b = cls_scores[0].shape[0]
        cls = jnp.concatenate([
            c.reshape(b, -1, self.num_classes + 1) for c in cls_scores], 1)
        reg = jnp.concatenate([r.reshape(b, -1, 4) for r in bbox_preds], 1)
        return cls, reg

    def _loss_pieces(self, outputs, batch, featmap_sizes):
        """Shared SSD loss machinery: assignment, per-anchor CE, hard
        negative mining weights and per-anchor smooth-L1. PISASSDHead
        reuses every piece and only reweights."""
        anchors = jnp.concatenate(
            self.anchor_generator.grid_anchors(featmap_sizes))
        num_lvl = self.anchor_generator.num_level_anchors(featmap_sizes)
        cls_flat, reg_flat = self._flatten(*outputs)

        def single(gtb, gtl, gtv):
            res = self.assigner.assign(anchors, num_lvl, gtb, gtl, gtv,
                                       num_classes=self.num_classes)
            safe = jnp.clip(res.assigned_gt_inds, 0)
            deltas = self.coder.encode(anchors, gtb[safe])
            return res.labels, res.pos_mask, deltas, res.assigned_gt_inds

        labels, pos, deltas, gt_inds = jax.vmap(single)(
            batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'])
        posf = pos.astype(jnp.float32)
        num_pos = jnp.maximum(posf.sum(), 1.0)

        logp = jax.nn.log_softmax(cls_flat, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        # hard negative mining: per image, keep the 3*num_pos highest-loss
        # negatives (rank threshold over a descending sort)
        neg_ce = jnp.where(pos, -jnp.inf, ce)
        order = jnp.argsort(-neg_ce, axis=1)
        rank = jnp.zeros_like(order).at[
            jnp.arange(order.shape[0])[:, None], order].set(
                jnp.broadcast_to(jnp.arange(order.shape[1])[None, :],
                                 order.shape))
        num_pos_img = posf.sum(axis=1, keepdims=True)
        neg_keep = (~pos) & (rank < self.neg_pos_ratio * num_pos_img)

        diff = jnp.abs(reg_flat - deltas)
        sl1 = jnp.where(diff < self.smoothl1_beta,
                        0.5 * diff * diff / self.smoothl1_beta,
                        diff - 0.5 * self.smoothl1_beta).sum(-1)
        return dict(anchors=anchors, cls_flat=cls_flat, reg_flat=reg_flat,
                    labels=labels, pos=pos, posf=posf, deltas=deltas,
                    gt_inds=gt_inds, num_pos=num_pos, ce=ce,
                    neg_keep=neg_keep, sl1=sl1)

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        t = self._loss_pieces(outputs, batch, featmap_sizes)
        cls_w = t['posf'] + t['neg_keep'].astype(jnp.float32)
        loss_cls = (t['ce'] * cls_w).sum() / t['num_pos']
        loss_bbox = (t['sl1'] * t['posf']).sum() / t['num_pos']
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        cfg = cfg or self.test_cfg
        cls_scores, bbox_preds = outputs
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        anchors = jnp.concatenate(
            self.anchor_generator.grid_anchors(featmap_sizes))

        def per_image(cls_list, reg_list, hw, sf):
            cls, reg = self._flatten([c[None] for c in cls_list],
                                     [r[None] for r in reg_list])
            scores = jax.nn.softmax(cls[0], axis=-1)[:, :self.num_classes]
            boxes = self.coder.decode(anchors, reg[0], max_shape=hw)
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            return multiclass_nms(boxes, scores, cfg.get('score_thr', 0.02),
                                  cfg.get('nms', {}).get('iou_threshold',
                                                         0.45),
                                  max_per_img=cfg.get('max_per_img', 200))

        b = cls_scores[0].shape[0]
        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)([c for c in cls_scores],
                                   [r for r in bbox_preds], img_hw,
                                   scale_factor)
