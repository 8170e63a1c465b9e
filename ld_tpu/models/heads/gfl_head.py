"""GFL head (Generalized Focal Loss V1, arXiv:2006.04388) — TPU-native.

Capability parity with /root/reference/mmdet/models/dense_heads/gfl_head.py:48
(forward towers, QFL/GIoU/DFL losses, ATSS targets, NMS decode), re-designed:

  * Forward: one shared 4+4 conv-GN tower applied to every FPN level, with a
    per-level learnable scalar on the reg output (`Scale`,
    gfl_head.py:132,182). NHWC; channels-last GroupNorm.
  * Loss: the reference's per-level `multi_apply` + `pos_inds` gathers
    (gfl_head.py:196-280) collapse into ONE dense masked computation over the
    flattened (batch, all-level-anchors) axis, using a per-anchor stride
    constant — XLA fuses it into a few large VPU kernels with zero dynamic
    shapes. Summed losses are mathematically identical to the reference's
    per-level sums.
  * Cross-replica `reduce_mean` of num_total_pos / avg_factor
    (gfl_head.py:330-349) is replaced by GLOBAL-batch normalization: under
    pjit the batch axis is sharded, reductions over it compile to psums over
    ICI, and `sum(x)/sum(n)` equals the reference's DDP-averaged
    `sum(x_r)/(mean_r n_r)/R` objective exactly.
"""
from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.ops import (AnchorGenerator, ATSSAssigner, anchor_center,
                        bbox2distance, bbox_overlaps, distance2bbox, integral)
from ld_tpu.ops.nms import multiclass_nms, multiclass_nms_voting, topk_flat
from ld_tpu.utils.registry import HEADS, LOSSES, ASSIGNERS

_CLS_BIAS_INIT = float(-math.log((1 - 0.01) / 0.01))  # prior prob 0.01


class ConvGNBlock(nn.Module):
    features: int
    groups: int = 32
    # dcn_on_last_conv variants (fcos/vfnet mdconv configs): the tower's
    # final 3x3 becomes a modulated deformable conv
    with_dcn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_dcn:
            from ld_tpu.ops.deform_conv import ModulatedDeformConv
            x = ModulatedDeformConv(self.features, kernel_size=3,
                                    dtype=self.dtype)(x)
        else:
            x = nn.Conv(self.features, (3, 3), padding=[(1, 1)] * 2,
                        use_bias=False, dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01))(x)
        # epsilon matches torch/mmcv GroupNorm (1e-5); the flax default 1e-6
        # visibly diverges on 1x1 feature maps where group variance is tiny
        x = nn.GroupNorm(num_groups=min(self.groups, self.features),
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class GFLHeadNet(nn.Module):
    """Shared-tower forward: feats -> (cls_scores, bbox_preds) per level."""
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    reg_max: int = 16
    num_levels: int = 5
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.cls_convs = [ConvGNBlock(self.feat_channels, dtype=self.dtype,
                                      name=f'cls_conv{i}')
                          for i in range(self.stacked_convs)]
        self.reg_convs = [ConvGNBlock(self.feat_channels, dtype=self.dtype,
                                      name=f'reg_conv{i}')
                          for i in range(self.stacked_convs)]
        self.gfl_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(_CLS_BIAS_INIT),
            name='gfl_cls')
        self.gfl_reg = nn.Conv(
            4 * (self.reg_max + 1), (3, 3), padding=[(1, 1)] * 2,
            dtype=self.dtype, kernel_init=nn.initializers.normal(0.01),
            name='gfl_reg')
        self.scales = self.param('scales', nn.initializers.ones,
                                 (self.num_levels, ))

    def __call__(self, feats, train: bool = False):
        cls_scores, bbox_preds = [], []
        for lvl, x in enumerate(feats):
            cls_feat, reg_feat = x, x
            for conv in self.cls_convs:
                cls_feat = conv(cls_feat)
            for conv in self.reg_convs:
                reg_feat = conv(reg_feat)
            cls_scores.append(self.gfl_cls(cls_feat).astype(jnp.float32))
            bbox_preds.append(
                (self.gfl_reg(reg_feat) * self.scales[lvl]).astype(
                    jnp.float32))
        return cls_scores, bbox_preds


def flatten_levels(xs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """[(B, H, W, C)] per level -> (B, sum(H*W), C), row-major per level.

    Under an sp (spatially-partitioned) trace the result is resharded to
    batch-only layout here — see ld_tpu/utils/act_sharding.py — so loss
    numerics are identical to the data-parallel step."""
    from ld_tpu.utils.act_sharding import reshard_for_loss
    b = xs[0].shape[0]
    return reshard_for_loss(
        jnp.concatenate([x.reshape(b, -1, x.shape[-1]) for x in xs],
                        axis=1))


@HEADS.register_module()
class GFLHead:
    """Framework component: owns the forward net, anchors, assigner, losses."""

    def __init__(self,
                 num_classes,
                 in_channels,
                 stacked_convs=4,
                 feat_channels=256,
                 anchor_generator=None,
                 loss_cls=None,
                 loss_dfl=None,
                 loss_bbox=None,
                 reg_max=16,
                 train_cfg=None,
                 test_cfg=None,
                 norm_cfg=None,
                 conv_cfg=None,
                 dtype=jnp.float32,
                 level_pack=False,
                 **kwargs):
        self.num_classes = num_classes
        self.in_channels = in_channels
        self.cls_out_channels = num_classes
        self.reg_max = reg_max
        self.feat_channels = feat_channels
        self.stacked_convs = stacked_convs
        ag = dict(anchor_generator or dict(
            ratios=[1.0], octave_base_scale=8, scales_per_octave=1,
            strides=[8, 16, 32, 64, 128]))
        ag_type = ag.pop('type', 'AnchorGenerator')
        if ag_type in ('SSDAnchorGenerator', 'LegacySSDAnchorGenerator'):
            # PISA-SSD routes the SSD anchor scheme through a
            # RetinaHead-lineage head (reference pisa_ssd300_coco.py)
            from ld_tpu.models.heads import ssd_head as _ssd
            self.anchor_generator = getattr(_ssd, ag_type)(**ag)
        elif ag_type == 'LegacyAnchorGenerator':
            from ld_tpu.ops.anchors import LegacyAnchorGenerator
            self.anchor_generator = LegacyAnchorGenerator(**ag)
        else:
            self.anchor_generator = AnchorGenerator(**ag)
        self.num_levels = self.anchor_generator.num_levels
        loss_cls = loss_cls or dict(
            type='QualityFocalLoss', use_sigmoid=True, beta=2.0,
            loss_weight=1.0)
        # GFLV2 heads emit probabilities (sigmoid*quality), not logits
        self.use_sigmoid_cls = loss_cls.get('use_sigmoid', True)
        self.loss_cls = LOSSES.build(loss_cls)
        self.loss_dfl = LOSSES.build(loss_dfl or dict(
            type='DistributionFocalLoss', loss_weight=0.25))
        self.loss_bbox = LOSSES.build(loss_bbox or dict(
            type='GIoULoss', loss_weight=2.0))
        self.train_cfg = train_cfg or {}
        self.test_cfg = test_cfg or dict(
            nms_pre=1000, score_thr=0.05,
            nms=dict(type='nms', iou_threshold=0.6), max_per_img=100)
        assigner_cfg = dict(self.train_cfg.get('assigner',
                                               dict(type='ATSSAssigner',
                                                    topk=9)))
        self.assigner = ASSIGNERS.build(assigner_cfg)
        self.level_pack = bool(level_pack)
        self.net = self._build_net(dtype)

    def _build_net(self, dtype):
        if self.level_pack:
            # one-canvas tower over all FPN levels (docs/PERF.md); identical
            # param tree + outputs, see packed_tower.py
            from ld_tpu.models.heads.packed_tower import PackedGFLHeadNet
            return PackedGFLHeadNet(
                num_classes=self.num_classes,
                feat_channels=self.feat_channels,
                stacked_convs=self.stacked_convs,
                reg_max=self.reg_max, num_levels=self.num_levels,
                dtype=dtype)
        return GFLHeadNet(num_classes=self.num_classes,
                          feat_channels=self.feat_channels,
                          stacked_convs=self.stacked_convs,
                          reg_max=self.reg_max, num_levels=self.num_levels,
                          dtype=dtype)

    # ---- geometry helpers (host-side constants per featmap signature) ------
    def level_geometry(self, featmap_sizes):
        anchors = jnp.concatenate(
            self.anchor_generator.grid_anchors(featmap_sizes))
        num_lvl = self.anchor_generator.num_level_anchors(featmap_sizes)
        strides = np.concatenate([
            np.full(n, s[0], np.float32)
            for n, s in zip(num_lvl, self.anchor_generator.strides)
        ])
        level_id = np.concatenate([
            np.full(n, i, np.int32) for i, n in enumerate(num_lvl)
        ])
        return anchors, num_lvl, jnp.asarray(strides), jnp.asarray(level_id)

    # ---- target assignment (vmapped over the batch) -------------------------
    def build_targets(self, featmap_sizes, gt_bboxes, gt_labels, gt_valid,
                      img_hw):
        anchors, num_lvl, strides, level_id = self.level_geometry(
            featmap_sizes)

        def single(gtb, gtl, gtv, hw):
            vf = jnp.concatenate(
                self.anchor_generator.valid_flags(featmap_sizes, hw))
            res = self.assigner.assign(anchors, num_lvl, gtb, gtl, gtv, vf,
                                       num_classes=self.num_classes)
            safe = jnp.clip(res.assigned_gt_inds, 0)
            bbox_targets = jnp.where(res.pos_mask[:, None], gtb[safe], 0.0)
            return (res.labels, res.pos_mask, bbox_targets, vf,
                    res.assigned_gt_inds)

        labels, pos_mask, bbox_targets, valid, gt_inds = jax.vmap(single)(
            gt_bboxes, gt_labels, gt_valid, img_hw)
        return dict(labels=labels, pos_mask=pos_mask,
                    bbox_targets=bbox_targets, anchor_valid=valid,
                    anchors=anchors, strides=strides, level_id=level_id,
                    num_level_anchors=num_lvl, assigned_gt_inds=gt_inds)

    # ---- loss ---------------------------------------------------------------
    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds = outputs
        t = self.build_targets(featmap_sizes, batch['gt_bboxes'],
                               batch['gt_labels'], batch['gt_valid'],
                               batch['img_hw'])
        core = self._core_losses(
            flatten_levels(cls_scores).astype(jnp.float32),
            flatten_levels(bbox_preds).astype(jnp.float32), t)
        return {k: core[k] for k in ('loss_cls', 'loss_bbox', 'loss_dfl')}

    def _core_losses(self, cls_score, bbox_pred, t):
        """Dense masked QFL + GIoU + DFL over (B, N) anchors.

        Returns the loss dict plus intermediates reused by LD heads.
        """
        labels = t['labels']                       # (B, N)
        pos = t['pos_mask']
        anchor_valid = t['anchor_valid']
        strides = t['strides']                     # (N,)
        anchors = t['anchors']                     # (N, 4)

        posf = pos.astype(jnp.float32)
        label_weights = anchor_valid.astype(jnp.float32)

        # batch-total positive count, clamped ONCE — parity with the
        # reference's reduce_mean(num_total_pos).clamp(min=1)
        # (/root/reference/mmdet/models/dense_heads/gfl_head.py:330).
        # Per-image clamping would inflate the denominator whenever a batch
        # contains an empty-GT image (filter_empty_gt=False, heavy crops).
        num_total_samples = jnp.maximum(posf.sum(), 1.0)

        centers = anchor_center(anchors)[None] / strides[None, :, None]
        pred_corners = bbox_pred.reshape(*bbox_pred.shape[:-1], 4,
                                         self.reg_max + 1)
        pred_dist = integral(bbox_pred, self.reg_max)          # (B, N, 4)
        decoded = distance2bbox(centers, pred_dist)            # (B, N, 4)
        target_boxes = t['bbox_targets'] / strides[None, :, None]

        # quality target: IoU(decoded, target) on positives
        score = jnp.where(
            pos,
            jax.lax.stop_gradient(
                bbox_overlaps(decoded, target_boxes, is_aligned=True)), 0.0)

        # weight: max classification score (detached), positives only
        cls_prob = jax.nn.sigmoid(cls_score) if self.use_sigmoid_cls \
            else cls_score
        weight_targets = jnp.where(
            pos, jax.lax.stop_gradient(cls_prob).max(axis=-1), 0.0)
        avg_factor = weight_targets.sum() + 1e-6

        loss_cls = self.loss_cls(cls_score, (labels, score),
                                 weight=label_weights,
                                 avg_factor=num_total_samples)

        loss_bbox = self.loss_bbox(decoded.reshape(-1, 4),
                                   target_boxes.reshape(-1, 4),
                                   weight=weight_targets.reshape(-1),
                                   avg_factor=avg_factor)

        target_corners = bbox2distance(centers, target_boxes,
                                       max_dis=self.reg_max)   # (B, N, 4)
        w4 = jnp.broadcast_to(weight_targets[..., None],
                              target_corners.shape).reshape(-1)
        loss_dfl = self.loss_dfl(
            pred_corners.reshape(-1, self.reg_max + 1),
            target_corners.reshape(-1),
            weight=w4, avg_factor=4.0 * avg_factor)

        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox, loss_dfl=loss_dfl,
                    pos=pos, posf=posf, label_weights=label_weights,
                    weight_targets=weight_targets, avg_factor=avg_factor,
                    pred_corners=pred_corners, centers=centers,
                    decoded=decoded, num_total_samples=num_total_samples)

    # ---- inference ----------------------------------------------------------
    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        """Decode head outputs into final detections.

        Parity: /root/reference/mmdet/models/dense_heads/gfl_head.py:354
        (per-level sigmoid -> nms_pre top-k -> integral*stride ->
        distance2bbox clipped -> multiclass NMS).

        Args:
            outputs: (cls_scores, bbox_preds) lists of NHWC tensors.
            img_hw: (B, 2) image (h, w) for box clipping.
            scale_factor: (B, 4) resize factors for rescale to original.
        Returns:
            dets (B, max_per_img, 5), labels (B, max_per_img), valid mask.
        """
        cfg = cfg or self.test_cfg
        cls_scores, bbox_preds = outputs
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        nms_pre = cfg.get('nms_pre', 1000)
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)

        def decode_level(cls, pred, anchors, stride, hw):
            scores = cls.reshape(-1, self.cls_out_channels)
            pred = pred.reshape(-1, 4 * (self.reg_max + 1))
            n = scores.shape[0]
            if nms_pre > 0 and n > nms_pre:
                # top-k BEFORE sigmoid/integral: sigmoid is monotonic, so
                # ranking raw logits picks the same nms_pre set, and the
                # integral softmax then runs on nms_pre rows instead of
                # every anchor of the level
                max_scores = scores.max(axis=-1)
                _, topk = topk_flat(max_scores, nms_pre)
                scores = scores[topk]
                pred = pred[topk]
                anchors = anchors[topk]
            if self.use_sigmoid_cls:
                scores = jax.nn.sigmoid(scores)
            dist = integral(pred, self.reg_max) * stride
            boxes = distance2bbox(anchor_center(anchors), dist, max_shape=hw)
            return boxes, scores

        def per_image(cls_list, pred_list, hw, sf):
            boxes_all, scores_all = [], []
            for lvl in range(self.num_levels):
                b, s = decode_level(cls_list[lvl], pred_list[lvl],
                                    mlvl_anchors[lvl],
                                    float(self.anchor_generator.strides[lvl][0]),
                                    hw)
                boxes_all.append(b)
                scores_all.append(s)
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            if not with_nms:
                return boxes, scores
            nms_cfg = cfg.get('nms', dict(type='nms', iou_threshold=0.6))
            if nms_cfg.get('type') == 'voting_cluster_diounms':
                return multiclass_nms_voting(
                    boxes, scores, cfg.get('score_thr', 0.05),
                    nms_cfg.get('iou_threshold', 0.6),
                    max_per_img=cfg.get('max_per_img', 100))
            return multiclass_nms(boxes, scores, cfg.get('score_thr', 0.05),
                                  nms_cfg.get('iou_threshold', 0.6),
                                  approx_topk=nms_cfg.get('approx_topk'),
                                  max_per_img=cfg.get('max_per_img', 100),
                                  iou_dtype=nms_cfg.get('iou_dtype'))

        b = cls_scores[0].shape[0]
        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)(
            [c for c in cls_scores], [p for p in bbox_preds], img_hw,
            scale_factor)
