"""Region Proposal Network head (static-shape, SPMD-friendly).

Parity: /root/reference/mmdet/models/dense_heads/rpn_head.py:236 — 3x3 conv
tower, per-anchor objectness + delta regression, MaxIoU assignment
(0.7/0.3), 256-anchor random sampling at pos_fraction 0.5, per-level top-k +
NMS proposal generation.

TPU re-design: the random sampler becomes a masked randomized top-k (add
uniform keys, keep the K highest-keyed positives/negatives — identical
distribution to the reference's permutation sampling); proposals are a fixed
(max_num, 4) tensor with a validity mask.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.ops import AnchorGenerator, MaxIoUAssigner
from ld_tpu.ops.coder import build_coder
from ld_tpu.ops.nms import nms, topk_flat
from ld_tpu.utils.registry import HEADS, LOSSES


class RPNHeadNet(nn.Module):
    num_anchors: int = 3
    feat_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        conv = nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                       dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name='rpn_conv')
        cls_conv = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='rpn_cls')
        reg_conv = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='rpn_reg')
        cls_scores, bbox_preds = [], []
        for x in feats:
            t = nn.relu(conv(x))
            cls_scores.append(cls_conv(t).astype(jnp.float32))
            bbox_preds.append(reg_conv(t).astype(jnp.float32))
        return cls_scores, bbox_preds


def randomized_topk_mask(mask: jnp.ndarray, k: int, rng) -> jnp.ndarray:
    """Uniformly choose up to `k` True entries of `mask` (static shapes)."""
    keys = jax.random.uniform(rng, mask.shape)
    keys = jnp.where(mask, keys, -1.0)
    kth = jax.lax.top_k(keys, min(k, mask.shape[0]))[0][-1]
    chosen = mask & (keys >= jnp.maximum(kth, 0.0))
    # cap: if more than k ties/selected, keep the k largest keys exactly
    return chosen


@HEADS.register_module()
class RPNHead:

    def __init__(self, in_channels, feat_channels=256, anchor_generator=None,
                 bbox_coder=None, loss_cls=None, loss_bbox=None,
                 train_cfg=None, test_cfg=None, dtype=jnp.float32, **kwargs):
        ag = dict(anchor_generator or dict(
            scales=[8], ratios=[0.5, 1.0, 2.0], strides=[4, 8, 16, 32, 64]))
        ag.pop('type', None)
        self.anchor_generator = AnchorGenerator(**ag)
        self.num_levels = self.anchor_generator.num_levels
        self.num_anchors = self.anchor_generator.num_base_anchors[0]
        self.coder = build_coder(bbox_coder or dict(
            type='DeltaXYWHBBoxCoder', target_means=[0., 0., 0., 0.],
            target_stds=[1.0, 1.0, 1.0, 1.0]))
        self.loss_cls_fn = LOSSES.build(loss_cls or dict(
            type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0))
        self.loss_bbox_fn = LOSSES.build(loss_bbox or dict(
            type='L1Loss', loss_weight=1.0))
        self.train_cfg = train_cfg or {}
        self.test_cfg = test_cfg or dict(nms_pre=1000, max_per_img=1000,
                                         nms=dict(iou_threshold=0.7),
                                         min_bbox_size=0)
        a_cfg = dict(self.train_cfg.get('assigner', dict(
            type='MaxIoUAssigner', pos_iou_thr=0.7, neg_iou_thr=0.3,
            min_pos_iou=0.3)))
        a_cfg.pop('type', None)
        self.assigner = MaxIoUAssigner(**a_cfg)
        self.sampler_cfg = dict(self.train_cfg.get('sampler', dict(
            num=256, pos_fraction=0.5)))
        self.net = RPNHeadNet(num_anchors=self.num_anchors,
                              feat_channels=feat_channels, dtype=dtype)
        self.num_classes = 1

    def _flatten(self, cls_scores, bbox_preds):
        b = cls_scores[0].shape[0]
        cls = jnp.concatenate([c.reshape(b, -1) for c in cls_scores], 1)
        reg = jnp.concatenate([r.reshape(b, -1, 4) for r in bbox_preds], 1)
        return cls, reg

    def loss(self, outputs, batch, featmap_sizes, rng=None
             ) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds = outputs
        anchors = jnp.concatenate(
            self.anchor_generator.grid_anchors(featmap_sizes))
        num_lvl = self.anchor_generator.num_level_anchors(featmap_sizes)
        cls_flat, reg_flat = self._flatten(cls_scores, bbox_preds)
        b = cls_flat.shape[0]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rngs = jax.random.split(rng, b)

        num = self.sampler_cfg.get('num', 256)
        num_pos_max = int(num * self.sampler_cfg.get('pos_fraction', 0.5))

        def single(gtb, gtv, r):
            res = self.assigner.assign(anchors, num_lvl, gtb,
                                       jnp.zeros(gtb.shape[0], jnp.int32),
                                       gtv, num_classes=1)
            r1, r2 = jax.random.split(r)
            pos_sel = randomized_topk_mask(res.pos_mask, num_pos_max, r1)
            n_pos = pos_sel.sum()
            neg_mask = ~res.pos_mask  # negatives: everything unassigned
            # sample (num - n_pos) negatives by random-key rank
            keys = jax.random.uniform(r2, neg_mask.shape)
            keys = jnp.where(neg_mask, keys, -1.0)
            thresh_idx = jnp.clip(num - n_pos - 1, 0, neg_mask.shape[0] - 1)
            sorted_keys = jnp.sort(keys)[::-1]
            kth = sorted_keys[thresh_idx]
            neg_sel = neg_mask & (keys >= jnp.maximum(kth, 0.0))
            labels = jnp.where(res.pos_mask, 0, 1)  # fg=0, bg=1
            weights = (pos_sel | neg_sel).astype(jnp.float32)
            safe = jnp.clip(res.assigned_gt_inds, 0)
            deltas = self.coder.encode(anchors, gtb[safe])
            return labels, weights, deltas, pos_sel

        labels, weights, deltas, pos_sel = jax.vmap(single)(
            batch['gt_bboxes'], batch['gt_valid'], rngs)
        avg = jnp.maximum(weights.sum(), 1.0)
        loss_cls = self.loss_cls_fn(
            cls_flat.reshape(-1, 1),
            (labels == 0).astype(jnp.float32).reshape(-1, 1),
            weight=weights.reshape(-1), avg_factor=avg)
        posw = pos_sel.astype(jnp.float32)
        loss_bbox = self.loss_bbox_fn(
            reg_flat.reshape(-1, 4), deltas.reshape(-1, 4),
            weight=jnp.repeat(posw.reshape(-1, 1), 4, 1).reshape(-1, 4),
            avg_factor=avg)
        return dict(loss_rpn_cls=loss_cls, loss_rpn_bbox=loss_bbox)

    def loss_with_teacher(self, outputs, batch, featmap_sizes, soft_teacher,
                          rng=None) -> Dict[str, jnp.ndarray]:
        """RPN-level distillation for the KD two-stage detector.

        The reference's kd_two_stage path routes teacher RPN outputs into
        `rpn_head.forward_train` (kd_two_stage.py:80-111) but ships neither a
        distillation-capable RPN head nor a config; this implementation
        distills (a) objectness via binary KL and (b) deltas via L1 weighted
        by the teacher's objectness — the natural delta-parameterized
        counterpart of LD.
        """
        losses = self.loss(outputs, batch, featmap_sizes, rng=rng)
        cls_flat, reg_flat = self._flatten(*outputs)
        t_cls, t_reg = self._flatten(*soft_teacher)
        s = jax.nn.sigmoid(cls_flat)
        t = jax.lax.stop_gradient(jax.nn.sigmoid(t_cls))
        eps = 1e-6
        kl = t * (jnp.log(t + eps) - jnp.log(s + eps)) + \
            (1 - t) * (jnp.log(1 - t + eps) - jnp.log1p(-s + eps))
        losses['loss_rpn_kd'] = 0.1 * kl.mean()
        w = t[..., None]
        losses['loss_rpn_ld'] = 0.1 * (
            jnp.abs(reg_flat - jax.lax.stop_gradient(t_reg)) * w).sum() / \
            jnp.maximum(w.sum() * 4.0, 1.0)
        return losses

    def get_proposals(self, outputs, img_hw, cfg=None):
        """(B, max_per_img, 4) proposals + (B, max_per_img) validity."""
        cfg = cfg or self.test_cfg
        cls_scores, bbox_preds = outputs
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        nms_pre = cfg.get('nms_pre', 1000)
        max_num = cfg.get('max_per_img', 1000)
        iou_thr = cfg.get('nms', {}).get('iou_threshold', 0.7)

        def per_image(cls_list, reg_list, hw):
            boxes_all, scores_all = [], []
            for lvl in range(self.num_levels):
                scores = jax.nn.sigmoid(cls_list[lvl].reshape(-1))
                reg = reg_list[lvl].reshape(-1, 4)
                anchors = mlvl_anchors[lvl]
                n = scores.shape[0]
                if nms_pre > 0 and n > nms_pre:
                    scores, topk = topk_flat(scores, nms_pre)
                    reg = reg[topk]
                    anchors = anchors[topk]
                boxes = self.coder.decode(anchors, reg,
                                          max_shape=jnp.asarray(hw))
                boxes_all.append(boxes)
                scores_all.append(scores)
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            idx, valid = nms(boxes, scores, iou_thr, max_num)
            return jnp.where(valid[:, None], boxes[idx], 0.0), valid

        return jax.vmap(per_image)(
            [c for c in cls_scores], [r for r in bbox_preds], img_hw)
