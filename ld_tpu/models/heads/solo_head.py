"""SOLO head (segment objects by grid locations).

Parity: /root/reference/mmdet/models/dense_heads/solo_head.py — each FPN
level divides the image into an S x S grid; a category branch (7 GN convs
on the grid-resized feature) predicts (S, S, C) scores and a mask branch
(coord-conv + 7 GN convs + x2 upsample) predicts one mask channel per grid
cell. A gt is routed to levels by sqrt-area scale range; cells inside its
sigma-shrunk center region are positive and regress the (resized) gt mask
with Dice loss (weight 3); category uses sigmoid focal. Inference:
score-thresholded cells -> sigmoid masks -> Matrix NMS (score decay by
pairwise mask IoU) — all static-shape.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.utils.registry import HEADS, LOSSES
from .gfl_head import ConvGNBlock, _CLS_BIAS_INIT

EPS = 1e-6
INF = 1e8


@LOSSES.register_module()
class DiceLoss:
    """1 - 2*|P.T|/(|P|^2+|T|^2) on sigmoid mask probabilities."""

    def __init__(self, use_sigmoid=True, loss_weight=1.0, eps=1e-3,
                 reduction='mean'):
        self.use_sigmoid = use_sigmoid
        self.loss_weight = loss_weight
        self.eps = eps
        self.reduction = reduction

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        p = jax.nn.sigmoid(pred) if self.use_sigmoid else pred
        axes = tuple(range(1, p.ndim))
        num = 2 * (p * target).sum(axes)
        den = (p * p).sum(axes) + (target * target).sum(axes) + self.eps
        loss = 1 - num / den
        if weight is not None:
            loss = loss * weight
        if avg_factor is not None:
            return self.loss_weight * loss.sum() / avg_factor
        return self.loss_weight * loss.mean()


def matrix_nms(masks, labels, scores, sigma=2.0, kernel='gaussian'):
    """SOLO Matrix NMS: decay each score by overlapping higher-scored
    same-class masks. masks: (N, H, W) binary; returns decayed scores."""
    n = masks.shape[0]
    flat = masks.reshape(n, -1).astype(jnp.float32)
    inter = flat @ flat.T
    areas = flat.sum(-1)
    union = areas[:, None] + areas[None, :] - inter
    iou = inter / jnp.maximum(union, 1.0)
    same = labels[:, None] == labels[None, :]
    higher = scores[None, :] > scores[:, None]
    decay_iou = jnp.where(same & higher, iou, 0.0)        # (i decayed by j)
    # compensation: the decayer's own max IoU with anything above it
    max_iou_above = jnp.max(
        jnp.where(same & higher, iou, 0.0), axis=1)
    if kernel == 'gaussian':
        decay = jnp.exp(-(decay_iou**2 - max_iou_above[None, :]**2) * sigma)
        decay = jnp.min(jnp.where(same & higher, decay, 1.0), axis=1)
    else:
        decay = jnp.min(jnp.where(same & higher,
                                  (1 - decay_iou) /
                                  jnp.maximum(1 - max_iou_above[None, :],
                                              EPS), 1.0), axis=1)
    return scores * decay


class SOLOHeadNet(nn.Module):
    num_classes: int
    num_grids: tuple = (40, 36, 24, 16, 12)
    feat_channels: int = 256
    stacked_convs: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cate_convs = [ConvGNBlock(self.feat_channels, dtype=self.dtype,
                                  name=f'cate_conv{i}')
                      for i in range(self.stacked_convs)]
        mask_convs = [ConvGNBlock(self.feat_channels, dtype=self.dtype,
                                  name=f'mask_conv{i}')
                      for i in range(self.stacked_convs)]
        conv_cate = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype,
                            kernel_init=nn.initializers.normal(0.01),
                            bias_init=nn.initializers.constant(
                                _CLS_BIAS_INIT), name='conv_cate')
        cate_out, mask_out = [], []
        for lvl, x in enumerate(feats):
            s = self.num_grids[lvl]
            b, h, w, c = x.shape
            # category branch on the S x S resized grid
            cg = jax.image.resize(x, (b, s, s, c), method='bilinear')
            for conv in cate_convs:
                cg = conv(cg)
            cate_out.append(conv_cate(cg).astype(jnp.float32))
            # mask branch with coord conv
            ys = jnp.linspace(-1, 1, h)
            xs = jnp.linspace(-1, 1, w)
            coord = jnp.stack(
                [jnp.broadcast_to(xs[None, :], (h, w)),
                 jnp.broadcast_to(ys[:, None], (h, w))], -1)
            m = jnp.concatenate(
                [x, jnp.broadcast_to(coord[None], (b, h, w, 2)
                                     ).astype(x.dtype)], -1)
            for conv in mask_convs:
                m = conv(m)
            m = jax.image.resize(m, (b, h * 2, w * 2, self.feat_channels),
                                 method='bilinear')
            conv_mask = nn.Conv(s * s, (1, 1), dtype=self.dtype,
                                kernel_init=nn.initializers.normal(0.01),
                                name=f'conv_mask{lvl}')
            mask_out.append(conv_mask(m).astype(jnp.float32))
        return cate_out, mask_out


@HEADS.register_module()
class SOLOHead:

    def __init__(self, num_classes=80, in_channels=256, feat_channels=256,
                 stacked_convs=7, strides=(8, 8, 16, 32, 32),
                 scale_ranges=((8, 32), (16, 64), (32, 128), (64, 256),
                               (128, 512)),
                 num_grids=(40, 36, 24, 16, 12), pos_scale=0.2,
                 loss_mask=None, loss_cls=None, train_cfg=None,
                 test_cfg=None, dtype=jnp.float32, **kwargs):
        self.num_classes = num_classes
        self.num_grids = tuple(num_grids)
        self.scale_ranges = tuple(tuple(r) for r in scale_ranges)
        self.pos_scale = pos_scale
        self.loss_mask = LOSSES.build(loss_mask or dict(
            type='DiceLoss', use_sigmoid=True, loss_weight=3.0))
        self.loss_cls = LOSSES.build(loss_cls or dict(
            type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0))
        self.test_cfg = test_cfg or dict(
            score_thr=0.1, mask_thr=0.5, max_per_img=100)
        self.net = SOLOHeadNet(num_classes=num_classes,
                               num_grids=self.num_grids,
                               feat_channels=feat_channels,
                               stacked_convs=stacked_convs, dtype=dtype)

    def _cell_targets(self, s, lo, hi, gtb, gtl, gtv, img_hw):
        """(S*S,) gt index per cell (-1 none) + labels for one level."""
        w = gtb[:, 2] - gtb[:, 0]
        h = gtb[:, 3] - gtb[:, 1]
        scale = jnp.sqrt(jnp.maximum(w * h, EPS))
        in_range = (scale >= lo) & (scale <= hi) & gtv
        cx = (gtb[:, 0] + gtb[:, 2]) / 2
        cy = (gtb[:, 1] + gtb[:, 3]) / 2
        half_w = 0.5 * w * self.pos_scale
        half_h = 0.5 * h * self.pos_scale
        # grid coords of the center region
        gx = jnp.arange(s, dtype=jnp.float32)
        cell_cx = (gx + 0.5) / s * img_hw[1]
        cell_cy = (gx + 0.5) / s * img_hw[0]
        inside_x = (cell_cx[None, :] >= (cx - half_w)[:, None]) & \
            (cell_cx[None, :] <= (cx + half_w)[:, None])      # (G, S)
        inside_y = (cell_cy[None, :] >= (cy - half_h)[:, None]) & \
            (cell_cy[None, :] <= (cy + half_h)[:, None])
        # always include the center cell
        ccx = jnp.clip((cx / img_hw[1] * s).astype(jnp.int32), 0, s - 1)
        ccy = jnp.clip((cy / img_hw[0] * s).astype(jnp.int32), 0, s - 1)
        inside_x = inside_x.at[jnp.arange(gtb.shape[0]), ccx].set(True)
        inside_y = inside_y.at[jnp.arange(gtb.shape[0]), ccy].set(True)
        cell_pos = inside_y[:, :, None] & inside_x[:, None, :] \
            & in_range[:, None, None]                         # (G, S, S)
        areas = jnp.where(in_range, w * h, INF)
        masked = jnp.where(cell_pos, areas[:, None, None], INF)
        best = masked.reshape(-1, s * s).argmin(axis=0)
        pos = masked.reshape(-1, s * s).min(axis=0) < INF / 2
        labels = jnp.where(pos, gtl[best], self.num_classes)
        return jnp.where(pos, best, -1), labels

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        cate_preds, mask_preds = outputs
        gt_masks = batch['gt_masks']
        # the S x S category grid tiles the PADDED image, so cell centers
        # map through the padded size (mmdet: upsampled_size = 4*featmap)
        pad_hw = jnp.asarray([float(batch['image'].shape[1]),
                              float(batch['image'].shape[2])])
        loss_cls_sum = 0.0
        dice_sum = 0.0
        n_pos_sum = 0.0
        n_cells = 0.0
        for lvl, s in enumerate(self.num_grids):
            lo, hi = self.scale_ranges[lvl]

            def single(gtb, gtl, gtv, gtm, mp):
                cell_gt, labels = self._cell_targets(s, lo, hi, gtb, gtl,
                                                     gtv, pad_hw)
                hm, wm = mp.shape[0], mp.shape[1]
                tgt = jax.image.resize(gtm, (gtm.shape[0], hm, wm),
                                       method='nearest')
                cell_tgt = tgt[jnp.clip(cell_gt, 0)]          # (S*S, hm, wm)
                posf = (cell_gt >= 0).astype(jnp.float32)
                pred = mp.transpose(2, 0, 1)                  # (S*S, hm, wm)
                p = jax.nn.sigmoid(pred)
                num = 2 * (p * cell_tgt).sum((1, 2))
                den = (p * p).sum((1, 2)) + \
                    (cell_tgt * cell_tgt).sum((1, 2)) + 1e-3
                dice = (1 - num / den) * posf
                return labels, dice.sum(), posf.sum()

            labels, dice, n_pos = jax.vmap(single)(
                batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'],
                gt_masks, mask_preds[lvl])
            cate_flat = cate_preds[lvl].reshape(
                labels.shape[0], -1, self.num_classes)
            loss_cls_sum = loss_cls_sum + self.loss_cls(
                cate_flat, labels, avg_factor=1.0) * 1.0
            dice_sum = dice_sum + dice.sum()
            n_pos_sum = n_pos_sum + n_pos.sum()
            n_cells += labels.shape[1]
        num_pos = jnp.maximum(n_pos_sum, 1.0)
        return dict(
            loss_cls=loss_cls_sum / num_pos,
            loss_mask=self.loss_mask.loss_weight * dice_sum / num_pos)

    def get_masks(self, outputs, img_hw, cfg=None):
        """Per-image: (K, Hm, Wm) masks + labels + scores via Matrix NMS."""
        cfg = cfg or self.test_cfg
        cate_preds, mask_preds = outputs
        max_out = cfg.get('max_per_img', 100)
        hm, wm = mask_preds[0].shape[1:3]

        def per_image(cates, masks):
            all_scores, all_labels, all_masks = [], [], []
            for lvl in range(len(self.num_grids)):
                sc = jax.nn.sigmoid(cates[lvl]).reshape(
                    -1, self.num_classes)
                m = masks[lvl]                                # (h, w, S²)
                if m.shape[0] != hm:
                    m = jax.image.resize(m, (hm, wm, m.shape[-1]),
                                         method='bilinear')
                m = m.transpose(2, 0, 1)                      # (S², hm, wm)
                all_scores.append(sc.max(-1))
                all_labels.append(sc.argmax(-1))
                all_masks.append(jax.nn.sigmoid(m))
            scores = jnp.concatenate(all_scores)
            labels = jnp.concatenate(all_labels)
            msk = jnp.concatenate(all_masks, axis=0)
            k = min(max_out, scores.shape[0])
            top_s, idx = jax.lax.top_k(
                jnp.where(scores > cfg.get('score_thr', 0.1), scores, 0.0),
                k)
            sel_masks = (msk[idx] > cfg.get('mask_thr', 0.5)).astype(
                jnp.float32)
            decayed = matrix_nms(sel_masks, labels[idx], top_s)
            return sel_masks, labels[idx], decayed

        def unstack(xs):
            return [x for x in xs]

        return jax.vmap(lambda c0, m0: per_image(c0, m0))(
            unstack(cate_preds), unstack(mask_preds))

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        """Boxes derived from predicted masks (for bbox-protocol eval)."""
        masks, labels, scores = self.get_masks(outputs, img_hw, cfg)
        hm, wm = masks.shape[2:4]
        # mask preds live at stride 4 of the PADDED input (P2 level x2
        # upsample); img_hw is the un-padded size, so the stride is static
        b = masks.shape[0]
        stride_y = jnp.full((b, ), 4.0)
        stride_x = jnp.full((b, ), 4.0)

        def to_box(m, sy, sx):
            ys = m.max(axis=2)                                # (K, hm)
            xs = m.max(axis=1)                                # (K, wm)
            yi = jnp.arange(hm, dtype=jnp.float32)
            xi = jnp.arange(wm, dtype=jnp.float32)
            y1 = jnp.min(jnp.where(ys > 0, yi[None], INF), -1)
            y2 = jnp.max(jnp.where(ys > 0, yi[None], -1.0), -1) + 1
            x1 = jnp.min(jnp.where(xs > 0, xi[None], INF), -1)
            x2 = jnp.max(jnp.where(xs > 0, xi[None], -1.0), -1) + 1
            empty = y2 <= 0
            box = jnp.stack([x1 * sx, y1 * sy, x2 * sx, y2 * sy], -1)
            return jnp.where(empty[:, None], 0.0, box)

        boxes = jax.vmap(to_box)(masks, stride_y, stride_x)
        dets = jnp.concatenate([boxes, scores[..., None]], -1)
        return dets, labels, (scores > 0).sum(-1)
