"""Guided Anchoring heads (GA-Retina / GA-RPN).

Parity: /root/reference/mmdet/models/dense_heads/guided_anchor_head.py:57 +
ga_retina_head.py / ga_rpn_head.py — each cell predicts an objectness
LOCATION score (focal loss on center/ignore/negative regions of the gt at
its scale-mapped level, `ga_loc_targets:376`) and an anchor SHAPE (dw, dh;
BoundedIoU loss against the best-overlapping gt via ApproxMaxIoU
assignment, `ga_shape_targets:541`); a feature-adaption deformable conv
(offsets from the detached shape prediction) conditions the cls/reg
towers; cls/reg train against the GUIDED anchors (square centers with
predicted exp-scaled wh), assigned per image with MaxIoU. The reference's
MaskedConv inference speed-up is a sparsity trick for CUDA; on TPU the
dense conv is already batched, so masking happens at score level.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.ops.anchors import AnchorGenerator
from ld_tpu.ops.coder import build_coder
from ld_tpu.ops.deform_conv import DeformConv
from ld_tpu.ops.extra_assigners import ApproxMaxIoUAssigner
from ld_tpu.ops.max_iou_assigner import MaxIoUAssigner
from ld_tpu.ops.nms import multiclass_nms, topk_flat
from ld_tpu.utils.registry import HEADS, LOSSES
from .gfl_head import _CLS_BIAS_INIT
from .retina_gfl_head import flatten_levels_anchors

EPS = 1e-6


def calc_region(boxes, ratio, h, w):
    """Center sub-region of boxes (feature-map coords), clamped."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    cx1 = (1 - ratio) / 2 * (x2 - x1) + x1
    cy1 = (1 - ratio) / 2 * (y2 - y1) + y1
    cx2 = x2 - (1 - ratio) / 2 * (x2 - x1)
    cy2 = y2 - (1 - ratio) / 2 * (y2 - y1)
    return (jnp.clip(cx1, 0, w - 1), jnp.clip(cy1, 0, h - 1),
            jnp.clip(cx2, 0, w - 1), jnp.clip(cy2, 0, h - 1))


class GARetinaHeadNet(nn.Module):
    num_classes: int
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
        conv_loc = nn.Conv(1, (1, 1), dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(
                               _CLS_BIAS_INIT), name='conv_loc')
        conv_shape = nn.Conv(2, (1, 1), dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name='conv_shape')
        off_cls = nn.Conv(18, (1, 1), dtype=self.dtype,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name='offset_cls')
        off_reg = nn.Conv(18, (1, 1), dtype=self.dtype,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name='offset_reg')
        adapt_cls = DeformConv(self.feat_channels, dtype=self.dtype,
                               name='adapt_cls')
        adapt_reg = DeformConv(self.feat_channels, dtype=self.dtype,
                               name='adapt_reg')
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(
                               _CLS_BIAS_INIT), name='ga_cls')
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='ga_reg')
        cls_out, reg_out, shape_out, loc_out = [], [], [], []
        for x in feats:
            c, r = x, x
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            loc = conv_loc(c).astype(jnp.float32)
            shape = conv_shape(r).astype(jnp.float32)
            sg = jax.lax.stop_gradient(shape)
            c2 = nn.relu(adapt_cls(c, off_cls(sg)))
            r2 = nn.relu(adapt_reg(r, off_reg(sg)))
            cls_out.append(conv_cls(c2).astype(jnp.float32))
            reg_out.append(conv_reg(r2).astype(jnp.float32))
            shape_out.append(shape)
            loc_out.append(loc)
        return cls_out, reg_out, shape_out, loc_out


@HEADS.register_module()
class GARetinaHead:

    def __init__(self, num_classes=80, in_channels=256, feat_channels=256,
                 stacked_convs=4, approx_anchor_generator=None,
                 square_anchor_generator=None, anchor_coder=None,
                 bbox_coder=None, loc_filter_thr=0.01, loss_loc=None,
                 loss_shape=None, loss_cls=None, loss_bbox=None,
                 train_cfg=None, test_cfg=None, dtype=jnp.float32, **kw):
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
        self.octave_base_scale = aag.get('octave_base_scale', 4)
        self.strides = tuple(s if np.isscalar(s) else s[0]
                             for s in sag['strides'])
        self.loc_filter_thr = loc_filter_thr
        self.loss_loc = LOSSES.build(loss_loc or dict(
            type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0))
        self.loss_shape = LOSSES.build(loss_shape or dict(
            type='BoundedIoULoss', beta=0.2, loss_weight=1.0))
        self.loss_cls = LOSSES.build(loss_cls or dict(
            type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0))
        self.loss_bbox = LOSSES.build(loss_bbox or dict(
            type='SmoothL1Loss', beta=0.04, loss_weight=1.0))
        self.coder = build_coder(bbox_coder or dict(
            type='DeltaXYWHBBoxCoder', target_means=[0.] * 4,
            target_stds=[1.0, 1.0, 1.0, 1.0]))
        self.train_cfg = train_cfg or {}
        self.center_ratio = self.train_cfg.get('center_ratio', 0.2)
        self.ignore_ratio = self.train_cfg.get('ignore_ratio', 0.5)
        self.test_cfg = test_cfg or dict(
            nms_pre=1000, score_thr=0.05,
            nms=dict(type='nms', iou_threshold=0.5), max_per_img=100)
        ga_cfg = dict(self.train_cfg.get('ga_assigner', dict(
            pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0)))
        ga_cfg.pop('type', None)
        self.ga_assigner = ApproxMaxIoUAssigner(**ga_cfg)
        a_cfg = dict(self.train_cfg.get('assigner', dict(
            pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0)))
        a_cfg.pop('type', None)
        self.assigner = MaxIoUAssigner(**a_cfg)
        self.net = GARetinaHeadNet(num_classes=self.cls_out_channels,
                                   feat_channels=feat_channels,
                                   stacked_convs=stacked_convs, dtype=dtype)

    # ---- geometry ----------------------------------------------------------
    def _geometry(self, featmap_sizes):
        squares = jnp.concatenate(
            self.square_gen.grid_anchors(featmap_sizes))
        approx_lvls = self.approx_gen.grid_anchors(featmap_sizes)
        approxs = jnp.concatenate([
            a.reshape(-1, self.approxs_per_loc, 4) for a in approx_lvls])
        num_lvl = self.square_gen.num_level_anchors(featmap_sizes)
        strides = jnp.asarray(np.concatenate([
            np.full(n, s, np.float32)
            for n, s in zip(num_lvl, self.strides)]))
        return squares, approxs, num_lvl, strides

    def _guided_anchors(self, squares, shape_flat, strides):
        """squares (N,4) + predicted (dw,dh) -> guided anchors (…,N,4)."""
        cx = (squares[:, 0] + squares[:, 2]) / 2
        cy = (squares[:, 1] + squares[:, 3]) / 2
        base = self.octave_base_scale * strides
        w = base * jnp.exp(jnp.clip(shape_flat[..., 0], -4, 4))
        h = base * jnp.exp(jnp.clip(shape_flat[..., 1], -4, 4))
        return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                         -1)

    def _loc_targets_level(self, gtb, gtv, lvl, num_lvls, h, w, stride):
        """(H*W,) target & weight for one level, one image."""
        scale = jnp.sqrt(jnp.maximum(
            (gtb[:, 2] - gtb[:, 0]) * (gtb[:, 3] - gtb[:, 1]), EPS))
        min_size = self.octave_base_scale * self.strides[0]
        tgt_lvl = jnp.clip(jnp.floor(
            jnp.log2(scale / min_size) + 0.5), 0, num_lvls - 1)
        on_lvl = (tgt_lvl == lvl) & gtv
        near_lvl = (jnp.abs(tgt_lvl - lvl) <= 1) & gtv
        g = gtb / stride
        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)

        def region_mask(frac, member):
            # calc_region takes the kept CENTER FRACTION directly
            x1, y1, x2, y2 = calc_region(g, frac, h, w)
            inx = (xs[None, :] >= jnp.floor(x1)[:, None]) & \
                (xs[None, :] <= jnp.ceil(x2)[:, None])
            iny = (ys[None, :] >= jnp.floor(y1)[:, None]) & \
                (ys[None, :] <= jnp.ceil(y2)[:, None])
            m = iny[:, :, None] & inx[:, None, :] & member[:, None, None]
            return m.any(axis=0).reshape(-1)

        pos = region_mask(self.center_ratio, on_lvl)
        ignore = region_mask(self.ignore_ratio, near_lvl) & ~pos
        tgt = pos.astype(jnp.float32)
        weight = jnp.where(pos, 1.0, jnp.where(ignore, 0.0, 0.1))
        return tgt, weight

    # ---- loss ---------------------------------------------------------------
    def loss(self, outputs, batch, featmap_sizes,
             **kwargs) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds, shape_preds, loc_preds = outputs
        squares, approxs, num_lvl, strides = self._geometry(featmap_sizes)
        num_lvls = len(num_lvl)
        cls_flat = flatten_levels_anchors(cls_scores, self.cls_out_channels)
        reg_flat = flatten_levels_anchors(bbox_preds, 4)
        shape_flat = flatten_levels_anchors(shape_preds, 2)
        loc_flat = flatten_levels_anchors(loc_preds, 1)[..., 0]

        # ---- location branch ------------------------------------------------
        loc_ts, loc_ws = [], []
        for lvl, (h, w) in enumerate(featmap_sizes):
            t, wgt = jax.vmap(
                lambda gb, gv: self._loc_targets_level(
                    gb, gv, lvl, num_lvls, h, w, self.strides[lvl]))(
                batch['gt_bboxes'], batch['gt_valid'])
            loc_ts.append(t)
            loc_ws.append(wgt)
        loc_t = jnp.concatenate(loc_ts, axis=1)
        loc_w = jnp.concatenate(loc_ws, axis=1)
        n_loc_pos = jnp.maximum(loc_t.sum(), 1.0)
        # focal on a single "objectness" class: label 0 = positive,
        # label 1 = background (one_hot over the 1-channel logit)
        lab = jnp.where(loc_t > 0.5, 0, 1)
        loss_loc = self.loss_loc(loc_flat[..., None], lab, weight=loc_w,
                                 avg_factor=n_loc_pos)

        # ---- shape branch ----------------------------------------------------
        guided = self._guided_anchors(squares, shape_flat, strides)

        def shape_single(gtb, gtl, gtv, ganch):
            res = self.ga_assigner.assign(
                squares, num_lvl, gtb, gtl, gtv,
                num_classes=self.num_classes, approxs=approxs)
            safe = jnp.clip(res.assigned_gt_inds, 0)
            return res.pos_mask, gtb[safe]

        pos_s, tgt_s = jax.vmap(shape_single)(
            batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'],
            guided)
        posf_s = pos_s.astype(jnp.float32)
        loss_shape = self.loss_shape(
            guided.reshape(-1, 4), tgt_s.reshape(-1, 4),
            weight=posf_s.reshape(-1),
            avg_factor=jnp.maximum(posf_s.sum(), 1.0))

        # ---- cls/reg on guided anchors --------------------------------------
        ganchors = jax.lax.stop_gradient(guided)

        def cls_single(gtb, gtl, gtv, ga):
            res = self.assigner.assign(ga, num_lvl, gtb, gtl, gtv,
                                       num_classes=self.num_classes)
            safe = jnp.clip(res.assigned_gt_inds, 0)
            return res.labels, res.pos_mask, gtb[safe]

        labels, pos, tgt = jax.vmap(cls_single)(
            batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'],
            ganchors)
        posf = pos.astype(jnp.float32)
        num_pos = jnp.maximum(posf.sum(), 1.0)
        loss_cls = self.loss_cls(cls_flat, labels, avg_factor=num_pos)
        deltas = self.coder.encode(ganchors, tgt)
        loss_bbox = self.loss_bbox(
            reg_flat.reshape(-1, 4), deltas.reshape(-1, 4),
            weight=jnp.repeat(posf.reshape(-1, 1), 4, 1),
            avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_shape=loss_shape, loss_loc=loss_loc)

    # ---- inference ------------------------------------------------------------
    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        cfg = cfg or self.test_cfg
        cls_scores, bbox_preds, shape_preds, loc_preds = outputs
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        squares, _, num_lvl, strides = self._geometry(featmap_sizes)
        cls_flat = flatten_levels_anchors(cls_scores, self.cls_out_channels)
        reg_flat = flatten_levels_anchors(bbox_preds, 4)
        shape_flat = flatten_levels_anchors(shape_preds, 2)
        loc_flat = flatten_levels_anchors(loc_preds, 1)[..., 0]

        def per_image(cls_p, reg_p, shp, loc, hw, sf):
            ganch = self._guided_anchors(squares, shp, strides)
            keep = jax.nn.sigmoid(loc) >= self.loc_filter_thr
            scores = jax.nn.sigmoid(cls_p) * keep[:, None]
            npre = min(cfg.get('nms_pre', 1000), scores.shape[0])
            top, idx = topk_flat(scores.max(-1), npre)
            boxes = self.coder.decode(ganch[idx], reg_p[idx], max_shape=hw)
            sc = scores[idx]
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            return multiclass_nms(
                boxes, sc, cfg.get('score_thr', 0.05),
                cfg.get('nms', {}).get('iou_threshold', 0.5),
                max_per_img=cfg.get('max_per_img', 100))

        b = cls_flat.shape[0]
        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)(cls_flat, reg_flat, shape_flat, loc_flat,
                                   img_hw, scale_factor)


@HEADS.register_module()
class GARPNHead(GARetinaHead):
    """Class-agnostic guided-anchor RPN (ga_rpn_head.py): one 'objectness'
    class; proposals come from get_bboxes with class-agnostic NMS."""

    def __init__(self, in_channels=256, **kw):
        kw.setdefault('num_classes', 1)
        kw.setdefault('stacked_convs', 1)
        super().__init__(in_channels=in_channels, **kw)

    def loss(self, outputs, batch, featmap_sizes, **kwargs):
        """RPN-prefixed loss keys so the roi head's loss_cls/loss_bbox
        are not clobbered in the two-stage merge (reference ga_rpn names
        its terms loss_rpn_*)."""
        raw = super().loss(outputs, batch, featmap_sizes, **kwargs)
        return {k if k.startswith('loss_rpn') else
                k.replace('loss_', 'loss_rpn_'): v for k, v in raw.items()}

    def get_proposals(self, outputs, img_hw, cfg=None):
        """(B, max_per_img, 4) proposals + validity — the RPN contract the
        two-stage detectors consume (parity: reference ga_rpn_head.py
        get_bboxes feeding proposals into ga_faster/ga_fast configs)."""
        cfg = cfg or self.test_cfg
        cls_scores, bbox_preds, shape_preds, loc_preds = outputs
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        squares, _, _, strides = self._geometry(featmap_sizes)
        cls_flat = flatten_levels_anchors(cls_scores, self.cls_out_channels)
        reg_flat = flatten_levels_anchors(bbox_preds, 4)
        shape_flat = flatten_levels_anchors(shape_preds, 2)
        loc_flat = flatten_levels_anchors(loc_preds, 1)[..., 0]
        nms_pre = cfg.get('nms_pre', 1000)
        max_num = cfg.get('max_per_img', 1000)
        iou_thr = cfg.get('nms', {}).get('iou_threshold', 0.7)

        def per_image(cls_p, reg_p, shp, loc, hw):
            from ld_tpu.ops.nms import nms
            ganch = self._guided_anchors(squares, shp, strides)
            keep = jax.nn.sigmoid(loc) >= self.loc_filter_thr
            scores = jax.nn.sigmoid(cls_p[:, 0]) * keep
            npre = min(nms_pre, scores.shape[0])
            top, idx = topk_flat(scores, npre)
            boxes = self.coder.decode(ganch[idx], reg_p[idx], max_shape=hw)
            kidx, valid = nms(boxes, top, iou_thr, max_num)
            return jnp.where(valid[:, None], boxes[kidx], 0.0), valid

        return jax.vmap(per_image)(cls_flat, reg_flat, shape_flat,
                                   loc_flat, img_hw)
