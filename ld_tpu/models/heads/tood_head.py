"""TOOD head (task-aligned one-stage detection, T-head + TAL).

Parity: /root/reference/mmdet/models/dense_heads/tood_head.py:102 —
6 interactive convs whose stacked features feed two TaskDecomposition
blocks (per-image layer attention contracts the stack back to
feat_channels), a cls-probability alignment branch
(sigmoid_geometric_mean of logits and prob map), and a reg branch whose
decoded per-cell boxes are refined by bilinear deform-sampling at a
learned offset (invalid refined boxes fall back to the initial ones).
NOTE: the reference ships this head WITHOUT its TaskAlignedAssigner (the
assigners dir has none), so it is unbuildable there; the assigner is
implemented here (ops/extra_assigners.py) per the TOOD paper. Losses:
QFL-style cls on activated scores with the per-anchor normalized alignment
metric as target, GIoU weighted by the same metric.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.ops import anchor_center, distance2bbox
from ld_tpu.ops.extra_assigners import TaskAlignedAssigner
from ld_tpu.utils.registry import HEADS, LOSSES
from .gfl_head import ConvGNBlock, GFLHead, _CLS_BIAS_INIT, flatten_levels

EPS = 1e-6


def sigmoid_geometric_mean(a, b):
    return jnp.sqrt(jax.nn.sigmoid(a) * jax.nn.sigmoid(b) + 1e-12)


class TaskDecomposition(nn.Module):
    feat_channels: int
    stacked_convs: int
    la_down_rate: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, avg_feat):
        """feat (B,H,W,stacked*C); avg_feat (B,1,1,stacked*C)."""
        sc = self.stacked_convs
        c = self.feat_channels
        w = nn.Conv(sc * c // self.la_down_rate, (1, 1), dtype=self.dtype,
                    name='la_conv1')(avg_feat)
        w = nn.relu(w)
        w = jax.nn.sigmoid(nn.Conv(sc, (1, 1), dtype=self.dtype,
                                   name='la_conv2')(w))      # (B,1,1,sc)
        kernel = self.param('reduction_kernel',
                            nn.initializers.he_normal(), (sc * c, c),
                            self.dtype)
        # layer attention folded into the 1x1 reduction (tood_head.py:85-95)
        b, h, ww, _ = feat.shape
        scaled = feat.reshape(b, h, ww, sc, c) * w[..., None]
        out = jnp.einsum('bhwsc,scd->bhwd', scaled,
                         kernel.reshape(sc, c, c).astype(jnp.float32))
        gn = nn.GroupNorm(num_groups=min(32, c), epsilon=1e-5,
                          dtype=self.dtype, name='reduction_gn')
        return nn.relu(gn(out))


class TOODHeadNet(nn.Module):
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 6
    num_levels: int = 5
    strides: tuple = (8, 16, 32, 64, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        sc = self.stacked_convs
        c = self.feat_channels
        inter_convs = [ConvGNBlock(c, dtype=self.dtype,
                                   name=f'inter_conv{i}') for i in range(sc)]
        cls_decomp = TaskDecomposition(c, sc, 8, dtype=self.dtype,
                                       name='cls_decomp')
        reg_decomp = TaskDecomposition(c, sc, 8, dtype=self.dtype,
                                       name='reg_decomp')
        tood_cls = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(
                               _CLS_BIAS_INIT), name='tood_cls')
        tood_reg = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='tood_reg')
        cls_prob_c1 = nn.Conv(c // 4, (1, 1), dtype=self.dtype,
                              name='cls_prob_conv1')
        cls_prob_c2 = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2,
                              dtype=self.dtype,
                              bias_init=nn.initializers.constant(
                                  _CLS_BIAS_INIT), name='cls_prob_conv2')
        off_c1 = nn.Conv(c // 4, (1, 1), dtype=self.dtype,
                         name='reg_offset_conv1')
        off_c2 = nn.Conv(2, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         name='reg_offset_conv2')
        scales = self.param('scales', nn.initializers.ones,
                            (self.num_levels, ))

        cls_scores, bbox_preds = [], []
        for lvl, x in enumerate(feats):
            inter = []
            for conv in inter_convs:
                x = conv(x)
                inter.append(x)
            feat = jnp.concatenate(inter, -1)               # (B,H,W,sc*C)
            avg = feat.mean(axis=(1, 2), keepdims=True)
            cls_feat = cls_decomp(feat, avg)
            reg_feat = reg_decomp(feat, avg)
            logits = tood_cls(cls_feat).astype(jnp.float32)
            prob = cls_prob_c2(nn.relu(cls_prob_c1(feat))).astype(
                jnp.float32)
            cls_score = sigmoid_geometric_mean(logits, prob)
            # anchor-free reg: distances in stride units -> per-cell boxes
            dist = jnp.exp(jnp.clip(
                tood_reg(reg_feat).astype(jnp.float32) * scales[lvl],
                -8, 8))
            b, h, w, _ = dist.shape
            cx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, None, :]
            cy = (jnp.arange(h, dtype=jnp.float32) + 0.5)[None, :, None]
            box = jnp.stack([cx - dist[..., 0], cy - dist[..., 1],
                             cx + dist[..., 2], cy + dist[..., 3]], -1)
            # learned-offset bilinear refinement (deform_sampling with a
            # ones 1x1 kernel == shifted bilinear read of the box map)
            off = off_c2(nn.relu(off_c1(feat))).astype(jnp.float32)
            box_r = _bilinear_shift(box, off)
            invalid = (box_r[..., 0] > box_r[..., 2]) | \
                (box_r[..., 1] > box_r[..., 3])
            box = jnp.where(invalid[..., None], box, box_r)
            cls_scores.append(cls_score)
            bbox_preds.append(box)                          # stride units
        return cls_scores, bbox_preds


def _bilinear_shift(feat, off):
    """Bilinearly sample `feat` (B,H,W,C) at (y+dy, x+dx) per position."""
    b, h, w, c = feat.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None] + off[..., 0]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :] + off[..., 1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0

    def gather(yi, xi):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = yi * w + xi
        flat = feat.reshape(b, h * w, c)
        out = jnp.take_along_axis(flat, idx.reshape(b, -1, 1), axis=1)
        return out.reshape(b, h, w, c) * ok[..., None]

    return (gather(y0, x0) * ((1 - wy) * (1 - wx))[..., None] +
            gather(y0, x0 + 1) * ((1 - wy) * wx)[..., None] +
            gather(y0 + 1, x0) * (wy * (1 - wx))[..., None] +
            gather(y0 + 1, x0 + 1) * (wy * wx)[..., None])


@HEADS.register_module()
class TOODHead(GFLHead):

    def __init__(self, num_classes, in_channels, stacked_convs=6,
                 anchor_type='anchor_free', loss_cls=None, loss_bbox=None,
                 **kwargs):
        kwargs.setdefault('anchor_generator', dict(
            ratios=[1.0], octave_base_scale=8, scales_per_octave=1,
            strides=[8, 16, 32, 64, 128]))
        super().__init__(
            num_classes, in_channels, stacked_convs=stacked_convs,
            loss_cls=loss_cls or dict(type='QualityFocalLoss',
                                      use_sigmoid=True, activated=True,
                                      beta=2.0, loss_weight=1.0),
            loss_bbox=loss_bbox or dict(type='GIoULoss', loss_weight=2.0),
            **kwargs)
        a_cfg = dict(self.train_cfg.get('assigner', dict(
            topk=13, alpha=1.0, beta=6.0)))
        if a_cfg.get('type', 'TaskAlignedAssigner') == 'TaskAlignedAssigner':
            a_cfg.pop('type', None)
            self.assigner = TaskAlignedAssigner(**a_cfg)

    def _build_net(self, dtype):
        self._dtype = dtype
        return TOODHeadNet(num_classes=self.num_classes,
                           feat_channels=self.feat_channels,
                           stacked_convs=max(self.stacked_convs, 2),
                           num_levels=self.num_levels, dtype=dtype)

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds = outputs
        anchors, num_lvl, strides, _ = self.level_geometry(featmap_sizes)
        cls_flat = flatten_levels(cls_scores)                # activated
        box_flat = flatten_levels(bbox_preds) * strides[None, :, None]

        def single(gtb, gtl, gtv, hw, cls_p, box_p):
            vf = jnp.concatenate(
                self.anchor_generator.valid_flags(featmap_sizes, hw))
            res, align = self.assigner.assign(
                jax.lax.stop_gradient(cls_p),
                jax.lax.stop_gradient(box_p), anchors, gtb, gtl, gtv, vf,
                num_classes=self.num_classes)
            safe = jnp.clip(res.assigned_gt_inds, 0)
            # normalized alignment metric per anchor (TOOD TAL)
            own = jnp.where(
                res.pos_mask,
                jnp.take_along_axis(align, safe[:, None], 1)[:, 0], 0.0)
            g = gtb.shape[0]
            onehot = (safe[:, None] == jnp.arange(g)[None, :]) & \
                res.pos_mask[:, None]
            max_t = jnp.max(jnp.where(onehot, own[:, None], 0.0), axis=0)
            max_iou = jnp.max(
                jnp.where(onehot, res.max_overlaps[:, None], 0.0), axis=0)
            norm = own / jnp.maximum(max_t[safe], EPS) * max_iou[safe]
            norm = jnp.where(res.pos_mask, norm, 0.0)
            return res.labels, res.pos_mask, gtb[safe], norm, vf

        labels, pos, tgt, norm_t, valid = jax.vmap(single)(
            batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'],
            batch['img_hw'], cls_flat, box_flat)

        norm_t = jax.lax.stop_gradient(norm_t)
        avg = jnp.maximum(norm_t.sum(), 1.0)
        # QFL on activated scores, target = normalized alignment metric
        onehot = jax.nn.one_hot(labels, self.cls_out_channels,
                                dtype=cls_flat.dtype)
        score_t = onehot * norm_t[..., None]
        sig = cls_flat
        mod = jnp.abs(score_t - sig)**2.0
        bce = -(score_t * jnp.log(jnp.clip(sig, EPS)) +
                (1 - score_t) * jnp.log(jnp.clip(1 - sig, EPS)))
        loss_cls = (bce * mod * valid[..., None]).sum() / avg
        loss_bbox = self.loss_bbox(
            box_flat.reshape(-1, 4), tgt.reshape(-1, 4),
            weight=norm_t.reshape(-1), avg_factor=avg)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        from ld_tpu.ops.nms import multiclass_nms
        cfg = cfg or self.test_cfg
        cls_scores, bbox_preds = outputs
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        nms_pre = cfg.get('nms_pre', 1000)

        def per_image(cls_list, box_list, hw, sf):
            boxes_all, scores_all = [], []
            for lvl in range(len(featmap_sizes)):
                s = float(self.anchor_generator.strides[lvl][0])
                scores = cls_list[lvl].reshape(-1, self.cls_out_channels)
                boxes = box_list[lvl].reshape(-1, 4) * s
                if nms_pre > 0 and scores.shape[0] > nms_pre:
                    _, topk = jax.lax.top_k(scores.max(-1), nms_pre)
                    scores, boxes = scores[topk], boxes[topk]
                boxes = jnp.stack([
                    jnp.clip(boxes[:, 0], 0, hw[1]),
                    jnp.clip(boxes[:, 1], 0, hw[0]),
                    jnp.clip(boxes[:, 2], 0, hw[1]),
                    jnp.clip(boxes[:, 3], 0, hw[0])], -1)
                boxes_all.append(boxes)
                scores_all.append(scores)
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            return multiclass_nms(
                boxes, scores, cfg.get('score_thr', 0.05),
                cfg.get('nms', {}).get('iou_threshold', 0.6),
                max_per_img=cfg.get('max_per_img', 100))

        b = cls_scores[0].shape[0]
        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)(
            [c for c in cls_scores], [r for r in bbox_preds], img_hw,
            scale_factor)
