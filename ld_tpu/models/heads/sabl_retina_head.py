"""SABL RetinaNet head (side-aware boundary localization).

Parity: /root/reference/mmdet/models/dense_heads/sabl_retina_head.py —
single square anchor per cell classified with focal loss; box localization
split per side into bucket ESTIMATION (binary CE over side_num buckets,
avg_factor = N_pos*4*side_num) and bucket fine REGRESSION (SmoothL1 on the
top-k nearest buckets, avg_factor = N_pos*4*offset_topk); assignment via
ApproxMaxIoU (each square represented by its 9 octave/ratio approx anchors);
inference rescores with the bucketing confidence (top-1 + adjacent top-2
softmax mass, averaged over the 4 sides).
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.ops.anchors import AnchorGenerator
from ld_tpu.ops.coder import build_coder
from ld_tpu.ops.extra_assigners import ApproxMaxIoUAssigner
from ld_tpu.ops.nms import multiclass_nms
from ld_tpu.utils.registry import HEADS, LOSSES
from .gfl_head import _CLS_BIAS_INIT
from .retina_gfl_head import flatten_levels_anchors


class SABLRetinaHeadNet(nn.Module):
    num_classes: int
    side_num: int
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1)] * 2, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name=f'cls_conv{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1)] * 2, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name=f'reg_conv{i}')
                     for i in range(self.stacked_convs)]
        retina_cls = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             bias_init=nn.initializers.constant(
                                 _CLS_BIAS_INIT), name='retina_cls')
        bbox_cls = nn.Conv(self.side_num * 4, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='retina_bbox_cls')
        bbox_reg = nn.Conv(self.side_num * 4, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='retina_bbox_reg')
        cls_scores, cls_preds, reg_preds = [], [], []
        for x in feats:
            c, r = x, x
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            cls_scores.append(retina_cls(c).astype(jnp.float32))
            cls_preds.append(bbox_cls(r).astype(jnp.float32))
            reg_preds.append(bbox_reg(r).astype(jnp.float32))
        return cls_scores, cls_preds, reg_preds


@HEADS.register_module()
class SABLRetinaHead:

    def __init__(self, num_classes=80, in_channels=256, stacked_convs=4,
                 feat_channels=256, approx_anchor_generator=None,
                 square_anchor_generator=None, bbox_coder=None,
                 loss_cls=None, loss_bbox_cls=None, loss_bbox_reg=None,
                 train_cfg=None, test_cfg=None, norm_cfg=None,
                 dtype=jnp.float32, **kwargs):
        self.num_classes = num_classes
        self.cls_out_channels = num_classes
        aag = dict(approx_anchor_generator or dict(
            octave_base_scale=4, scales_per_octave=3,
            ratios=[0.5, 1.0, 2.0], strides=[8, 16, 32, 64, 128]))
        aag.pop('type', None)
        sag = dict(square_anchor_generator or dict(
            ratios=[1.0], scales=[4], strides=[8, 16, 32, 64, 128]))
        sag.pop('type', None)
        self.approx_gen = AnchorGenerator(**aag)
        self.square_gen = AnchorGenerator(**sag)
        self.approxs_per_loc = self.approx_gen.num_base_anchors[0]
        self.coder = build_coder(bbox_coder or dict(
            type='BucketingBBoxCoder', num_buckets=14, scale_factor=3.0))
        self.side_num = self.coder.side_num
        self.loss_cls = LOSSES.build(loss_cls or dict(
            type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0))
        self.loss_bbox_cls = LOSSES.build(loss_bbox_cls or dict(
            type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.5))
        self.loss_bbox_reg = LOSSES.build(loss_bbox_reg or dict(
            type='SmoothL1Loss', beta=1.0 / 9.0, loss_weight=1.5))
        self.train_cfg = train_cfg or {}
        self.test_cfg = test_cfg or dict(
            nms_pre=1000, score_thr=0.05,
            nms=dict(type='nms', iou_threshold=0.5), max_per_img=100)
        a_cfg = dict(self.train_cfg.get('assigner', dict(
            pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0)))
        a_cfg.pop('type', None)
        self.assigner = ApproxMaxIoUAssigner(**a_cfg)
        self.net = SABLRetinaHeadNet(
            num_classes=num_classes, side_num=self.side_num,
            feat_channels=feat_channels, stacked_convs=stacked_convs,
            dtype=dtype)

    def _geometry(self, featmap_sizes):
        squares = jnp.concatenate(
            self.square_gen.grid_anchors(featmap_sizes))
        approx_lvls = self.approx_gen.grid_anchors(featmap_sizes)
        approxs = jnp.concatenate([
            a.reshape(-1, self.approxs_per_loc, 4) for a in approx_lvls])
        num_lvl = self.square_gen.num_level_anchors(featmap_sizes)
        return squares, approxs, num_lvl

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_cls_preds, bbox_reg_preds = outputs
        squares, approxs, num_lvl = self._geometry(featmap_sizes)

        def single(gtb, gtl, gtv, hw):
            vf = jnp.concatenate(
                self.square_gen.valid_flags(featmap_sizes, hw))
            res = self.assigner.assign(squares, num_lvl, gtb, gtl, gtv, vf,
                                       num_classes=self.num_classes,
                                       approxs=approxs)
            safe = jnp.clip(res.assigned_gt_inds, 0)
            tgt = gtb[safe]
            offs, off_w, lab1h, cls_w = self.coder.encode(squares, tgt)
            posf = res.pos_mask.astype(jnp.float32)[:, None]
            return (res.labels, res.pos_mask, vf, offs,
                    off_w * posf, lab1h, cls_w * posf)

        (labels, pos, valid, offs, off_w, lab1h, cls_w) = jax.vmap(single)(
            batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'],
            batch['img_hw'])

        cls_flat = flatten_levels_anchors(cls_scores, self.cls_out_channels)
        bcls_flat = flatten_levels_anchors(bbox_cls_preds, self.side_num * 4)
        breg_flat = flatten_levels_anchors(bbox_reg_preds, self.side_num * 4)

        posf = pos.astype(jnp.float32)
        # batch-total clamp (reference sabl_retina_head num_total_pos)
        n_total = jnp.maximum(posf.sum(), 1.0)
        loss_cls = self.loss_cls(
            cls_flat.astype(jnp.float32), labels,
            weight=valid.astype(jnp.float32), avg_factor=n_total)
        loss_bbox_cls = self.loss_bbox_cls(
            bcls_flat.astype(jnp.float32), lab1h, weight=cls_w,
            avg_factor=n_total * 4 * self.side_num)
        loss_bbox_reg = self.loss_bbox_reg(
            breg_flat.astype(jnp.float32), offs, weight=off_w,
            avg_factor=n_total * 4 * self.coder.offset_topk)
        return dict(loss_cls=loss_cls, loss_bbox_cls=loss_bbox_cls,
                    loss_bbox_reg=loss_bbox_reg)

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        cfg = cfg or self.test_cfg
        cls_scores, bbox_cls_preds, bbox_reg_preds = outputs
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        mlvl_squares = self.square_gen.grid_anchors(featmap_sizes)
        nms_pre = cfg.get('nms_pre', 1000)

        def per_image(cls_list, bcls_list, breg_list, hw, sf):
            boxes_all, scores_all, conf_all = [], [], []
            for lvl in range(len(featmap_sizes)):
                scores = jax.nn.sigmoid(
                    cls_list[lvl].reshape(-1, self.cls_out_channels))
                bc = bcls_list[lvl].reshape(-1, self.side_num * 4)
                br = breg_list[lvl].reshape(-1, self.side_num * 4)
                sq = mlvl_squares[lvl]
                if nms_pre > 0 and scores.shape[0] > nms_pre:
                    _, topk = jax.lax.top_k(scores.max(-1), nms_pre)
                    scores, bc, br, sq = (scores[topk], bc[topk], br[topk],
                                          sq[topk])
                boxes, conf = self.coder.decode(sq, (bc, br), max_shape=hw)
                boxes_all.append(boxes)
                scores_all.append(scores)
                conf_all.append(conf)
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            conf = jnp.concatenate(conf_all)
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            scores = scores * conf[:, None]
            return multiclass_nms(
                boxes, scores, cfg.get('score_thr', 0.05),
                cfg.get('nms', {}).get('iou_threshold', 0.5),
                max_per_img=cfg.get('max_per_img', 100))

        b = cls_scores[0].shape[0]
        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)(
            [c for c in cls_scores], [c for c in bbox_cls_preds],
            [r for r in bbox_reg_preds], img_hw, scale_factor)
