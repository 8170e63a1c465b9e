"""YOLOv3 neck + head.

Parity: /root/reference/mmdet/models/necks/yolo_neck.py +
mmdet/models/dense_heads/yolo_head.py:577 + core YOLOAnchorGenerator /
YOLOBBoxCoder — per-level detection blocks (5 alternating 1x1/3x3 convs),
top-down 1x1+upsample+concat; head = 3x3 bridge + 1x1 to A*(5+C); decode:
sigmoid(xy) offsets within the cell, exp(wh) * anchor size; training:
responsible-anchor assignment (best-IoU anchor of the gt's cell) with a
neg-ignore IoU band, BCE objectness/cls/xy + MSE wh.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.ops.boxes import bbox_overlaps
from ld_tpu.ops.nms import multiclass_nms
from ld_tpu.utils.registry import HEADS, NECKS
from ld_tpu.models.backbones.darknet import ConvBNLeaky

DEFAULT_ANCHORS = (((116, 90), (156, 198), (373, 326)),
                   ((30, 61), (62, 45), (59, 119)),
                   ((10, 13), (16, 30), (33, 23)))


class DetectionBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.out_channels
        for i, (ch, k) in enumerate(((c, 1), (c * 2, 3), (c, 1), (c * 2, 3),
                                     (c, 1))):
            x = ConvBNLeaky(ch, k, dtype=self.dtype,
                            name=f'conv{i}')(x, train)
        return x


@NECKS.register_module()
class YOLOV3Neck(nn.Module):
    num_scales: int = 3
    in_channels: Sequence[int] = (1024, 512, 256)
    out_channels: Sequence[int] = (512, 256, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # feats ordered low->high resolution? backbone returns (s3, s4, s5);
        # the neck walks top-down starting at the deepest map
        feats = list(feats)[::-1]  # (1024, 512, 256 channels)
        outs = []
        x = DetectionBlock(self.out_channels[0], dtype=self.dtype,
                           name='detect0')(feats[0], train)
        outs.append(x)
        for i in range(1, self.num_scales):
            t = ConvBNLeaky(self.out_channels[i], 1, dtype=self.dtype,
                            name=f'lateral{i}')(x, train)
            b, h, w, c = t.shape
            t = jax.image.resize(t, (b, h * 2, w * 2, c), method='nearest')
            x = jnp.concatenate([t, feats[i]], axis=-1)
            x = DetectionBlock(self.out_channels[i], dtype=self.dtype,
                               name=f'detect{i}')(x, train)
            outs.append(x)
        return tuple(outs)  # deepest first (stride 32, 16, 8)


class YOLOV3HeadNet(nn.Module):
    num_classes: int
    in_channels: Sequence[int] = (512, 256, 128)
    num_anchors: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        preds = []
        for i, x in enumerate(feats):
            x = ConvBNLeaky(self.in_channels[i] * 2, 3, dtype=self.dtype,
                            name=f'bridge{i}')(x, train)
            p = nn.Conv(self.num_anchors * (5 + self.num_classes), (1, 1),
                        dtype=self.dtype, name=f'pred{i}')(x)
            preds.append(p.astype(jnp.float32))
        return (preds, )


@HEADS.register_module()
class YOLOV3Head:

    def __init__(self, num_classes=80, in_channels=(512, 256, 128),
                 anchor_generator=None, featmap_strides=(32, 16, 8),
                 ignore_iou_thr=0.5, train_cfg=None, test_cfg=None,
                 dtype=jnp.float32, **kwargs):
        self.num_classes = num_classes
        self.strides = tuple(featmap_strides)
        base = (anchor_generator or {}).get('base_sizes', DEFAULT_ANCHORS)
        self.anchor_sizes = tuple(tuple(tuple(a) for a in lvl)
                                  for lvl in base)
        self.num_anchors = len(self.anchor_sizes[0])
        self.ignore_iou_thr = ignore_iou_thr
        self.train_cfg = train_cfg or {}
        self.test_cfg = test_cfg or dict(
            nms_pre=1000, score_thr=0.05, conf_thr=0.005,
            nms=dict(type='nms', iou_threshold=0.45), max_per_img=100)
        self.net = YOLOV3HeadNet(num_classes=num_classes,
                                 in_channels=tuple(in_channels),
                                 num_anchors=self.num_anchors, dtype=dtype)

    # ---- decode ---------------------------------------------------------------
    def _decode_level(self, pred, lvl):
        """(H, W, A*(5+C)) -> boxes (H*W*A, 4), obj (N,), cls (N, C)."""
        h, w = pred.shape[:2]
        a = self.num_anchors
        stride = self.strides[lvl]
        p = pred.reshape(h, w, a, 5 + self.num_classes)
        gx = (jnp.arange(w, dtype=jnp.float32))[None, :, None]
        gy = (jnp.arange(h, dtype=jnp.float32))[:, None, None]
        cx = (jax.nn.sigmoid(p[..., 0]) + gx) * stride
        cy = (jax.nn.sigmoid(p[..., 1]) + gy) * stride
        aw = jnp.asarray([s[0] for s in self.anchor_sizes[lvl]],
                         jnp.float32)[None, None, :]
        ah = jnp.asarray([s[1] for s in self.anchor_sizes[lvl]],
                         jnp.float32)[None, None, :]
        bw = jnp.exp(jnp.clip(p[..., 2], -10, 8)) * aw
        bh = jnp.exp(jnp.clip(p[..., 3], -10, 8)) * ah
        boxes = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2,
                           cy + bh / 2], -1).reshape(-1, 4)
        obj = jax.nn.sigmoid(p[..., 4]).reshape(-1)
        cls = jax.nn.sigmoid(p[..., 5:]).reshape(-1, self.num_classes)
        return boxes, obj, cls

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        cfg = cfg or self.test_cfg
        preds = outputs[0]

        def per_image(pred_list, hw, sf):
            boxes_all, scores_all = [], []
            for lvl in range(len(self.strides)):
                boxes, obj, cls = self._decode_level(pred_list[lvl], lvl)
                scores = cls * obj[:, None]
                n = scores.shape[0]
                k = min(cfg.get('nms_pre', 1000), n)
                _, top = jax.lax.top_k(scores.max(-1), k)
                boxes_all.append(boxes[top])
                scores_all.append(scores[top])
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            return multiclass_nms(boxes, scores, cfg.get('score_thr', 0.05),
                                  cfg.get('nms', {}).get('iou_threshold',
                                                         0.45),
                                  max_per_img=cfg.get('max_per_img', 100))

        b = preds[0].shape[0]
        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)([p for p in preds], img_hw, scale_factor)

    # ---- loss -----------------------------------------------------------------
    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        preds = outputs[0]
        losses = dict(loss_xy=0.0, loss_wh=0.0, loss_obj=0.0, loss_cls=0.0)
        total_pos = 0.0
        for lvl, pred in enumerate(preds):
            out = jax.vmap(lambda p, gtb, gtl, gtv: self._loss_level(
                p, gtb, gtl, gtv, lvl))(pred, batch['gt_bboxes'],
                                        batch['gt_labels'],
                                        batch['gt_valid'])
            for k in ('loss_xy', 'loss_wh', 'loss_obj', 'loss_cls'):
                losses[k] = losses[k] + out[k].sum()
            total_pos = total_pos + out['num_pos'].sum()
        norm = jnp.maximum(total_pos, 1.0)
        return {k: v / norm for k, v in losses.items()}

    def _loss_level(self, pred, gt_bboxes, gt_labels, gt_valid, lvl):
        """Responsible-anchor YOLO assignment for ONE image, one level:
        the gt's centre cell at this level owns it IF this level's best
        anchor (by wh-IoU across ALL levels) lives here."""
        h, w = pred.shape[:2]
        a = self.num_anchors
        stride = self.strides[lvl]
        p = pred.reshape(h, w, a, 5 + self.num_classes)
        g = gt_bboxes.shape[0]

        gw = jnp.maximum(gt_bboxes[:, 2] - gt_bboxes[:, 0], 1e-3)
        gh = jnp.maximum(gt_bboxes[:, 3] - gt_bboxes[:, 1], 1e-3)
        # wh-IoU of each gt against all 9 anchors (3 levels x 3)
        all_sizes = jnp.asarray([s for lvl_s in self.anchor_sizes
                                 for s in lvl_s], jnp.float32)     # (9, 2)
        inter = jnp.minimum(gw[:, None], all_sizes[None, :, 0]) * \
            jnp.minimum(gh[:, None], all_sizes[None, :, 1])
        union = gw[:, None] * gh[:, None] + \
            all_sizes[None, :, 0] * all_sizes[None, :, 1] - inter
        best = (inter / jnp.maximum(union, 1e-6)).argmax(axis=1)   # (G,)
        own_lvl = best // a
        own_anchor = best % a
        responsible = (own_lvl == lvl) & gt_valid

        gcx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2 / stride
        gcy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2 / stride
        gi = jnp.clip(gcx.astype(jnp.int32), 0, w - 1)
        gj = jnp.clip(gcy.astype(jnp.int32), 0, h - 1)

        # targets scattered onto the (h, w, a) grid
        obj_t = jnp.zeros((h, w, a))
        obj_t = obj_t.at[gj, gi, own_anchor].max(
            responsible.astype(jnp.float32))
        tx = jnp.clip(gcx - gi, 1e-4, 1 - 1e-4)
        ty = jnp.clip(gcy - gj, 1e-4, 1 - 1e-4)
        aw = jnp.asarray([s[0] for s in self.anchor_sizes[lvl]], jnp.float32)
        ah = jnp.asarray([s[1] for s in self.anchor_sizes[lvl]], jnp.float32)
        twh_w = jnp.log(jnp.maximum(gw / aw[own_anchor % a], 1e-6))
        twh_h = jnp.log(jnp.maximum(gh / ah[own_anchor % a], 1e-6))

        def bce(logit, target):
            return jnp.maximum(logit, 0) - logit * target + \
                jnp.log1p(jnp.exp(-jnp.abs(logit)))

        # negatives with high IoU against any gt are ignored for objectness
        boxes, _, _ = self._decode_level(pred, lvl)
        ious = bbox_overlaps(boxes, gt_bboxes)
        ious = jnp.where(gt_valid[None, :], ious, 0.0).max(-1)
        ignore = (ious > self.ignore_iou_thr).reshape(h, w, a)
        obj_w = jnp.where((obj_t > 0) | ~ignore, 1.0, 0.0)
        loss_obj = (bce(p[..., 4], obj_t) * obj_w).sum()

        # positive-cell losses gathered per gt (G is small)
        pp = p[gj, gi, own_anchor]                     # (G, 5+C)
        rf = responsible.astype(jnp.float32)
        loss_xy = ((bce(pp[:, 0], tx) + bce(pp[:, 1], ty)) * rf).sum()
        loss_wh = (((pp[:, 2] - twh_w)**2 + (pp[:, 3] - twh_h)**2) *
                   rf).sum()
        onehot = jax.nn.one_hot(gt_labels, self.num_classes)
        loss_cls = (bce(pp[:, 5:], onehot).sum(-1) * rf).sum()
        return dict(loss_xy=loss_xy, loss_wh=loss_wh, loss_obj=loss_obj,
                    loss_cls=loss_cls, num_pos=rf.sum())
