"""YOLACT: anchor head with mask coefficients, protonet, semantic head.

Parity: /root/reference/mmdet/models/dense_heads/yolact_head.py —
  * YOLACTHead: Retina-style tower (1 shared conv by default), 3 anchors
    per cell, softmax classification trained with OHEM (3:1 neg:pos picked
    by per-anchor CE loss), SmoothL1 box regression, and a tanh coefficient
    branch with `num_protos` channels.
  * YOLACTProtonet: P3 -> 3 convs -> x2 upsample -> conv -> 1x1 ->
    `num_protos` prototype maps (relu). Instance mask = sigmoid(protos ·
    coeffs) cropped to the (gt at train / detected at test) box; BCE
    normalized by box area, positives capped at `max_masks_to_train`.
  * YOLACTSegmHead: 1 conv -> per-class binary semantic maps, BCE against
    the per-class union of gt masks.
All losses are computed densely with a fixed positive budget (static
shapes); the reference's nonzero()-based gather loops become masked topk.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.ops.max_iou_assigner import MaxIoUAssigner
from ld_tpu.ops.nms import fast_nms
from ld_tpu.utils.registry import HEADS
from .retina_gfl_head import flatten_levels_anchors
from .retina_head import RetinaHead

EPS = 1e-6


class YOLACTHeadNet(nn.Module):
    num_classes: int          # foreground classes; softmax adds +1 bg
    num_anchors: int = 3
    num_protos: int = 32
    feat_channels: int = 256
    stacked_convs: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        convs = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                         dtype=self.dtype,
                         kernel_init=nn.initializers.normal(0.01),
                         name=f'head_conv{i}')
                 for i in range(self.stacked_convs)]
        conv_cls = nn.Conv(self.num_anchors * (self.num_classes + 1), (3, 3),
                           padding=[(1, 1)] * 2, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_cls')
        conv_reg = nn.Conv(self.num_anchors * 4, (3, 3),
                           padding=[(1, 1)] * 2, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_reg')
        conv_coeff = nn.Conv(self.num_anchors * self.num_protos, (3, 3),
                             padding=[(1, 1)] * 2, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name='conv_coeff')
        cls_out, reg_out, coeff_out = [], [], []
        for x in feats:
            for conv in convs:
                x = nn.relu(conv(x))
            cls_out.append(conv_cls(x).astype(jnp.float32))
            reg_out.append(conv_reg(x).astype(jnp.float32))
            coeff_out.append(jnp.tanh(conv_coeff(x)).astype(jnp.float32))
        return cls_out, reg_out, coeff_out


class YOLACTProtonetNet(nn.Module):
    num_protos: int = 32
    channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p3):
        x = p3
        for i in range(3):
            x = nn.relu(nn.Conv(self.channels, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name=f'proto_conv{i}')(x))
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method='bilinear')
        x = nn.relu(nn.Conv(self.channels, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name='proto_conv3')(x))
        x = nn.relu(nn.Conv(self.num_protos, (1, 1), dtype=self.dtype,
                            name='proto_out')(x))
        return x.astype(jnp.float32)              # (B, Hp, Wp, P)


class YOLACTSegmHeadNet(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p3):
        return nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                       dtype=self.dtype,
                       name='segm_conv')(p3).astype(jnp.float32)


def _box_crop_mask(h, w, boxes, scale):
    """(R, h, w) 0/1 crop windows for boxes given in image coords."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * scale
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * scale
    inside_y = (ys[None, :] >= boxes[:, 1:2]) & (ys[None, :] <= boxes[:, 3:4])
    inside_x = (xs[None, :] >= boxes[:, 0:1]) & (xs[None, :] <= boxes[:, 2:3])
    return inside_y[:, :, None] & inside_x[:, None, :]


@HEADS.register_module()
class YOLACTHead(RetinaHead):

    def __init__(self, num_classes, in_channels, num_protos=32,
                 max_masks_to_train=32, loss_mask_weight=6.125,
                 loss_segm_weight=1.0, neg_pos_ratio=3, stacked_convs=1,
                 loss_cls=None, loss_bbox=None, **kwargs):
        kwargs.setdefault('anchor_generator', dict(
            octave_base_scale=3, scales_per_octave=1,
            ratios=[0.5, 1.0, 2.0], strides=[8, 16, 32, 64, 128]))
        super().__init__(
            num_classes, in_channels, stacked_convs=stacked_convs,
            loss_cls=loss_cls or dict(type='CrossEntropyLoss',
                                      use_sigmoid=False, loss_weight=1.0),
            loss_bbox=loss_bbox or dict(type='SmoothL1Loss', beta=1.0,
                                        loss_weight=1.5), **kwargs)
        self.num_protos = num_protos
        self.max_masks_to_train = max_masks_to_train
        self.loss_mask_weight = loss_mask_weight
        self.loss_segm_weight = loss_segm_weight
        self.neg_pos_ratio = neg_pos_ratio
        a_cfg = dict(self.train_cfg.get('assigner', dict(
            pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0)))
        a_cfg.pop('type', None)
        self.assigner = MaxIoUAssigner(**a_cfg)

    def _build_net(self, dtype):
        self._dtype = dtype
        return YOLACTHeadNet(num_classes=self.num_classes,
                             num_anchors=getattr(self, 'num_anchors', 3),
                             num_protos=getattr(self, 'num_protos', 32),
                             feat_channels=self.feat_channels,
                             stacked_convs=self.stacked_convs, dtype=dtype)

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds, _ = outputs
        t = self.build_targets(featmap_sizes, batch['gt_bboxes'],
                               batch['gt_labels'], batch['gt_valid'],
                               batch['img_hw'])
        c = self.num_classes + 1
        cls_flat = flatten_levels_anchors(cls_scores, c).astype(jnp.float32)
        reg_flat = flatten_levels_anchors(bbox_preds, 4).astype(jnp.float32)
        labels = jnp.where(t['pos_mask'], t['labels'], self.num_classes)
        pos = t['pos_mask']
        posf = pos.astype(jnp.float32)
        valid = t['anchor_valid']
        # OHEM: per-anchor CE, keep all pos + top (ratio * npos) negatives
        logp = jax.nn.log_softmax(cls_flat, -1)
        ce = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        neg_mask = valid & ~pos
        n_pos = jnp.maximum(posf.sum(axis=1), 1.0)            # (B,)
        k_neg = jnp.minimum(self.neg_pos_ratio * n_pos,
                            neg_mask.sum(axis=1).astype(jnp.float32))
        neg_ce = jnp.where(neg_mask, ce, -1.0)
        order = jnp.argsort(neg_ce, axis=1)[:, ::-1]
        rank = jnp.empty_like(order).at[
            jnp.arange(order.shape[0])[:, None], order].set(
                jnp.broadcast_to(jnp.arange(order.shape[1])[None],
                                 order.shape))
        keep_neg = neg_mask & (rank < k_neg[:, None])
        cls_w = posf + keep_neg.astype(jnp.float32)
        num_total = n_pos.sum()
        loss_cls = self.loss_cls.loss_weight * \
            (ce * cls_w).sum() / jnp.maximum(num_total, 1.0)
        deltas = self.coder.encode(t['anchors'][None], t['bbox_targets'])
        loss_bbox = self.loss_bbox(
            reg_flat.reshape(-1, 4), deltas.reshape(-1, 4),
            weight=jnp.repeat(posf.reshape(-1, 1), 4, 1),
            avg_factor=jnp.maximum(num_total, 1.0))
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    def mask_loss(self, outputs, protos, batch, featmap_sizes, rng=None):
        """Protonet BCE over a fixed budget of positive anchors."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        _, _, coeff_preds = outputs
        t = self.build_targets(featmap_sizes, batch['gt_bboxes'],
                               batch['gt_labels'], batch['gt_valid'],
                               batch['img_hw'])
        coeff_flat = flatten_levels_anchors(coeff_preds, self.num_protos)
        gt_masks = batch['gt_masks']                      # (B, G, Hm, Wm)
        hp, wp = protos.shape[1:3]
        k = self.max_masks_to_train

        def single(proto, coeff, pos, gt_idx, gtb, gtm, hw, r):
            scale = 4.0                     # protos live at stride 4
            keys = jnp.where(pos, 1.0, 0.0) + \
                jax.random.uniform(r, pos.shape) * 0.01
            _, sel = jax.lax.top_k(keys, k)
            sel_pos = pos[sel]
            gi = jnp.clip(gt_idx, 0)[sel]
            boxes = gtb[gi]                               # (k, 4)
            pred = jax.nn.sigmoid(
                jnp.einsum('hwp,kp->khw', proto, coeff[sel]))
            tgt = jax.image.resize(gtm, (gtm.shape[0], hp, wp),
                                   method='nearest')[gi]
            crop = _box_crop_mask(hp, wp, boxes, scale).astype(jnp.float32)
            bce = -(tgt * jnp.log(pred + EPS) +
                    (1 - tgt) * jnp.log(1 - pred + EPS))
            area = jnp.maximum(crop.sum((1, 2)), 1.0)
            per = (bce * crop).sum((1, 2)) / area
            return (per * sel_pos).sum(), sel_pos.sum()

        losses, counts = jax.vmap(single)(
            protos, coeff_flat, t['pos_mask'], t['assigned_gt_inds'],
            batch['gt_bboxes'], gt_masks, batch['img_hw'],
            jax.random.split(rng, protos.shape[0]))
        return dict(loss_mask=self.loss_mask_weight * losses.sum() /
                    jnp.maximum(counts.sum(), 1.0))

    def segm_loss(self, segm_pred, batch):
        """Per-class semantic BCE (yolact_head.py YOLACTSegmHead)."""
        hs, ws = segm_pred.shape[1:3]
        gt_masks = batch['gt_masks']

        def single(pred, gtm, gtl, gtv):
            tgt_small = jax.image.resize(
                gtm, (gtm.shape[0], hs, ws), method='nearest')
            onehot = jax.nn.one_hot(gtl, self.num_classes,
                                    dtype=pred.dtype) * gtv[:, None]
            tgt = jnp.einsum('ghw,gc->hwc', tgt_small, onehot)
            tgt = jnp.clip(tgt, 0.0, 1.0)
            p = jax.nn.sigmoid(pred)
            bce = -(tgt * jnp.log(p + EPS) + (1 - tgt) * jnp.log(1 - p + EPS))
            return bce.mean()

        losses = jax.vmap(single)(segm_pred, gt_masks, batch['gt_labels'],
                                  batch['gt_valid'])
        return dict(loss_segm=self.loss_segm_weight * losses.mean())

    def get_bboxes_with_coeffs(self, outputs, img_hw, scale_factor=None,
                               rescale=False, cfg=None):
        """fast-NMS detection returning per-det mask coefficients."""
        cfg = cfg or self.test_cfg
        cls_scores, bbox_preds, coeff_preds = outputs
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        anchors = jnp.concatenate(
            self.anchor_generator.grid_anchors(featmap_sizes))
        c = self.num_classes + 1
        cls_flat = flatten_levels_anchors(cls_scores, c)
        reg_flat = flatten_levels_anchors(bbox_preds, 4)
        coeff_flat = flatten_levels_anchors(coeff_preds, self.num_protos)
        max_out = cfg.get('max_per_img', 100)

        def per_image(cls_p, reg_p, coeff, hw, sf):
            probs = jax.nn.softmax(cls_p, -1)[:, :self.num_classes]
            boxes = self.coder.decode(anchors, reg_p, max_shape=hw)
            scores = probs.max(-1)
            lab = probs.argmax(-1)
            keep_thr = scores > cfg.get('score_thr', 0.05)
            npre = min(cfg.get('nms_pre', 1000), scores.shape[0])
            top_s, idx = jax.lax.top_k(jnp.where(keep_thr, scores, 0.0),
                                       npre)
            keep, kvalid = fast_nms(
                boxes[idx], top_s, lab[idx],
                iou_threshold=cfg.get('iou_thr', 0.5), max_out=max_out)
            kf = kvalid.astype(jnp.float32)[:, None]
            out_boxes = boxes[idx][keep]
            if rescale and sf is not None:
                out_boxes = out_boxes / sf[None, :]
            dets = jnp.concatenate(
                [out_boxes, (top_s[keep])[:, None]], -1) * kf
            return (dets, lab[idx][keep] * kvalid, kvalid.sum(),
                    coeff[idx][keep] * kf)

        b = cls_flat.shape[0]
        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)(cls_flat, reg_flat, coeff_flat, img_hw,
                                   scale_factor)
