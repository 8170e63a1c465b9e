"""PISA heads: RetinaNet and SSD with prime-sample attention.

Parity: /root/reference/mmdet/models/dense_heads/pisa_retinanet_head.py and
pisa_ssd_head.py — standard head towers; the loss reweights positive
classification by ISR-P (IoU-HLR importance) and adds CARL (regression
scaled by the gradient-carrying class probability). A fixed budget of
`max_pos` positive anchors is gathered per batch (static shapes).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ld_tpu.models.losses.pisa_loss import carl_weights, isr_p
from ld_tpu.ops.boxes import bbox_overlaps
from ld_tpu.utils.registry import HEADS
from .retina_head import RetinaHead
from .retina_gfl_head import flatten_levels_anchors


@HEADS.register_module()
class PISARetinaHead(RetinaHead):

    def __init__(self, num_classes, in_channels, isr=None, carl=None,
                 max_pos=128, **kwargs):
        super().__init__(num_classes, in_channels, **kwargs)
        isr = dict(isr or {})
        carl = dict(carl or {})
        self.isr_k = isr.get('k', 2.0)
        self.isr_bias = isr.get('bias', 0.0)
        self.carl_k = carl.get('k', 1.0)
        self.carl_bias = carl.get('bias', 0.2)
        self.max_pos = max_pos

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        t = self.build_targets(featmap_sizes, batch['gt_bboxes'],
                               batch['gt_labels'], batch['gt_valid'],
                               batch['img_hw'])
        cls_flat = flatten_levels_anchors(
            outputs[0], self.cls_out_channels).astype(jnp.float32)
        reg_flat = flatten_levels_anchors(outputs[1], 4).astype(jnp.float32)
        b, n = t['pos_mask'].shape
        labels = t['labels'].reshape(-1)
        pos = t['pos_mask'].reshape(-1)
        valid = t['anchor_valid'].reshape(-1)
        gt_idx = t['assigned_gt_inds'].reshape(-1)
        # make gt ids unique across the batch for grouping
        img_id = jnp.repeat(jnp.arange(b), n)
        gts_flat = jnp.clip(gt_idx, 0) + img_id * batch['gt_bboxes'].shape[1]
        anchors = jnp.tile(t['anchors'], (b, 1))
        cls2 = cls_flat.reshape(-1, self.cls_out_channels)
        reg2 = reg_flat.reshape(-1, 4)
        deltas = self.coder.encode(
            t['anchors'][None], t['bbox_targets']).reshape(-1, 4)

        # gather a fixed positive budget — when positives exceed it, keep
        # the HIGHEST-IoU ones (deterministic, and exactly PISA's notion of
        # prime samples), not a random subset
        p = min(self.max_pos, pos.shape[0])
        all_iou = bbox_overlaps(
            self.coder.decode(anchors, jax.lax.stop_gradient(reg2)),
            self.coder.decode(anchors, deltas), is_aligned=True)
        keys = pos.astype(jnp.float32) * (1.0 + all_iou)
        _, sel = jax.lax.top_k(keys, p)
        sv = pos[sel]
        s_labels = labels[sel]
        s_gts = gts_flat[sel]
        s_anchors = anchors[sel]
        s_cls = cls2[sel]
        s_reg = reg2[sel]
        s_deltas = deltas[sel]
        # IoU of decoded pred vs decoded target (detached)
        dec_p = self.coder.decode(s_anchors, jax.lax.stop_gradient(s_reg))
        dec_t = self.coder.decode(s_anchors, s_deltas)
        ious = bbox_overlaps(dec_p, dec_t, is_aligned=True)
        # per-positive detached cls loss for the renorm ratio
        cls_none = self.loss_cls(jax.lax.stop_gradient(s_cls), s_labels,
                                 reduction_override='none').sum(-1)
        base_w = jnp.where(sv, 1.0, 0.0)
        imp_w = isr_p(ious, s_labels, s_gts, sv, base_w, cls_none,
                      k=self.isr_k, bias=self.isr_bias)

        # classification: negatives weight 1, positives -> importance
        num_pos = jnp.maximum(pos.astype(jnp.float32).sum(), 1.0)
        w_all = valid.astype(jnp.float32) * (1.0 - pos.astype(jnp.float32))
        w_all = w_all.at[sel].add(imp_w)
        loss_cls = self.loss_cls(cls2, labels, weight=w_all,
                                 avg_factor=num_pos)
        loss_bbox = self.loss_bbox(
            reg2, deltas,
            weight=jnp.repeat(pos.astype(jnp.float32)[:, None], 4, 1),
            avg_factor=num_pos)
        # CARL on the gathered positives
        safe = jnp.clip(s_labels, 0, self.num_classes - 1)
        p_cls = jax.nn.sigmoid(
            jnp.take_along_axis(s_cls, safe[:, None], 1)[:, 0])
        cw = carl_weights(p_cls, sv, k=self.carl_k, bias=self.carl_bias)
        reg_none = jnp.abs(s_reg - s_deltas).sum(-1)
        loss_carl = (cw * reg_none).sum() / num_pos
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_carl=loss_carl)


@HEADS.register_module()
class PISARoIHead:
    """Two-stage prime sample attention (reference roi_heads/
    pisa_roi_head.py): StandardRoIHead with ISR-P replacing the positive
    classification weights and CARL added on the regression."""

    def __new__(cls, *args, **kwargs):
        from .roi_head import StandardRoIHead

        class _PISARoI(StandardRoIHead):
            def __init__(self, *a, **kw):
                train_cfg = kw.get('train_cfg') or {}
                isr = dict(train_cfg.get('isr') or {})
                carl = dict(train_cfg.get('carl') or {})
                self.isr_k = isr.get('k', 2.0)
                self.isr_bias = isr.get('bias', 0.0)
                self.carl_k = carl.get('k', 1.0)
                self.carl_bias = carl.get('bias', 0.2)
                super().__init__(*a, **kw)

            def _bbox_losses(self, cls, reg, rois, labels, roi_valid,
                             roi_pos, deltas, roi_weights, roi_gt_inds):
                labels_f = labels.reshape(-1)
                validf = roi_valid.reshape(-1).astype(jnp.float32)
                posf = roi_pos.reshape(-1).astype(jnp.float32)
                pos = roi_pos.reshape(-1)
                avg = jnp.maximum(validf.sum(), 1.0)
                n_pos = jnp.maximum(posf.sum(), 1.0)
                reg_sel = self._select_reg(reg, labels_f)
                rois_f = rois.reshape(-1, 4)
                deltas_f = deltas.reshape(-1, 4)
                dec_p = self.coder.decode(
                    rois_f, jax.lax.stop_gradient(reg_sel))
                dec_t = self.coder.decode(rois_f, deltas_f)
                ious = bbox_overlaps(dec_p, dec_t, is_aligned=True)
                b, n = labels.shape
                img_id = jnp.repeat(jnp.arange(b), n)
                gts = jnp.clip(roi_gt_inds.reshape(-1), 0) + img_id * n
                ce_det = self.loss_cls_fn(
                    jax.lax.stop_gradient(cls), labels_f,
                    reduction_override='none')
                if ce_det.ndim > 1:
                    ce_det = ce_det.sum(-1)
                imp_w = isr_p(ious, labels_f, gts, pos,
                              jnp.where(pos, 1.0, 0.0), ce_det,
                              k=self.isr_k, bias=self.isr_bias)
                w = validf * (1.0 - posf) + imp_w
                loss_cls = self.loss_cls_fn(cls, labels_f, weight=w,
                                            avg_factor=avg)
                loss_bbox = self.loss_bbox_fn(
                    reg_sel, deltas_f,
                    weight=jnp.repeat(posf[:, None], 4, 1),
                    avg_factor=n_pos * 4.0)
                # CARL: per-roi L1 scaled by the softmax class probability
                probs = jax.nn.softmax(cls, -1)
                safe = jnp.clip(labels_f, 0, self.num_classes - 1)
                p_cls = jnp.take_along_axis(probs, safe[:, None], 1)[:, 0]
                cw = carl_weights(p_cls, pos, k=self.carl_k,
                                  bias=self.carl_bias)
                reg_none = jnp.abs(reg_sel - deltas_f).sum(-1)
                loss_carl = (cw * reg_none).sum() / n_pos
                return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                            loss_carl=loss_carl)

        return _PISARoI(*args, **kwargs)


@HEADS.register_module()
class PISASSDHead:
    """PISA on the real SSD tower.

    Parity: /root/reference/mmdet/models/dense_heads/pisa_ssd_head.py —
    SSDHead targets + hard negative mining, with ISR-P replacing the
    positive classification weights and CARL added on the positives.
    Implemented as a composition over SSDHead so the SSD anchor scheme
    (variable anchors per level) and per-level convs stay intact.
    """

    def __new__(cls, *args, **kwargs):
        from .ssd_head import SSDHead

        class _PISASSD(SSDHead):
            def __init__(self, *a, isr=None, carl=None, max_pos=128, **kw):
                train_cfg = kw.get('train_cfg') or {}
                isr = dict(isr or train_cfg.get('isr') or {})
                carl = dict(carl or train_cfg.get('carl') or {})
                self.isr_k = isr.get('k', 2.0)
                self.isr_bias = isr.get('bias', 0.0)
                self.carl_k = carl.get('k', 1.0)
                self.carl_bias = carl.get('bias', 0.2)
                self.max_pos = max_pos
                super().__init__(*a, **kw)

            def loss(self, outputs, batch, featmap_sizes):
                t = self._loss_pieces(outputs, batch, featmap_sizes)
                b, n = t['pos'].shape
                pos = t['pos'].reshape(-1)
                labels = t['labels'].reshape(-1)
                ce = t['ce'].reshape(-1)
                anchors = jnp.tile(t['anchors'], (b, 1))
                reg2 = t['reg_flat'].reshape(-1, 4)
                deltas2 = t['deltas'].reshape(-1, 4)
                img_id = jnp.repeat(jnp.arange(b), n)
                gts_flat = jnp.clip(t['gt_inds'].reshape(-1), 0) + \
                    img_id * batch['gt_bboxes'].shape[1]

                # fixed positive budget, highest-IoU first (prime samples)
                p = min(self.max_pos, pos.shape[0])
                dec_p = self.coder.decode(
                    anchors, jax.lax.stop_gradient(reg2))
                dec_t = self.coder.decode(anchors, deltas2)
                ious_all = bbox_overlaps(dec_p, dec_t, is_aligned=True)
                keys = pos.astype(jnp.float32) * (1.0 + ious_all)
                _, sel = jax.lax.top_k(keys, p)
                sv = pos[sel]
                base_w = jnp.where(sv, 1.0, 0.0)
                imp_w = isr_p(ious_all[sel], labels[sel], gts_flat[sel],
                              sv, base_w,
                              jax.lax.stop_gradient(ce)[sel],
                              k=self.isr_k, bias=self.isr_bias)

                num_pos = t['num_pos']
                # negatives keep the mined weight 1; positives -> ISR-P
                w_all = t['neg_keep'].astype(jnp.float32).reshape(-1)
                w_all = w_all.at[sel].add(imp_w)
                loss_cls = (ce * w_all).sum() / num_pos
                loss_bbox = (t['sl1'].reshape(-1) *
                             pos.astype(jnp.float32)).sum() / num_pos
                # CARL: regression on prime samples scaled by the class
                # probability (softmax over the SSD's C+1 logits)
                cls2 = t['cls_flat'].reshape(-1, self.num_classes + 1)
                safe = jnp.clip(labels[sel], 0, self.num_classes - 1)
                probs = jax.nn.softmax(cls2[sel], -1)
                p_cls = jnp.take_along_axis(probs, safe[:, None], 1)[:, 0]
                cw = carl_weights(p_cls, sv, k=self.carl_k,
                                  bias=self.carl_bias)
                loss_carl = (cw * t['sl1'].reshape(-1)[sel]).sum() / num_pos
                return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                            loss_carl=loss_carl)

        return _PISASSD(*args, **kwargs)
