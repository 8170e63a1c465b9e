"""ROI-head variants: Double-Head, Mask Scoring, Dynamic R-CNN.

Parity targets in /root/reference/mmdet/models/roi_heads/:
  * DoubleHeadRoIHead (double_roi_head.py + bbox_heads/double_bbox_head.py):
    the reg branch is convolutional (a channel-expanding residual block +
    `num_convs` bottlenecks + global-average-pool + fc), the cls branch is
    2 fully-connected layers; both run on the same 7x7 roi features.
  * MaskScoringRoIHead (mask_scoring_roi_head.py + mask_heads/
    maskiou_head.py): a MaskIoU head (4 convs over mask-feat ++ max-pooled
    predicted mask, stride-2 last conv, 3 fcs) regresses the IoU of the
    predicted mask with its gt; L2 loss on positives whose mask-IoU target
    exceeds... (reference trains on all positives); at test the mask score
    multiplies the cls score.
  * DynamicRoIHead (dynamic_roi_head.py): the assigner's positive IoU
    threshold tracks the `ktop`-th best proposal IoU per gt (batch mean)
    and SmoothL1's beta tracks the `ktop`-th smallest regression error.
    The reference updates these from rolling history at epoch intervals;
    here both are computed per batch inside the jitted step (stateless —
    same signal, no Python-side state).
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.ops.boxes import bbox_overlaps
from ld_tpu.ops.roi_align import multi_level_roi_align
from ld_tpu.utils.registry import HEADS
from .mask_head import mask_targets
from .roi_head import StandardRoIHead


class DoubleBBoxHeadNet(nn.Module):
    """Conv-reg + FC-cls double head (double_bbox_head.py)."""
    num_classes: int
    roi_size: int = 7
    in_channels: int = 256
    conv_out: int = 1024
    fc_out: int = 1024
    num_convs: int = 4
    reg_class_agnostic: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        def _gn(name):
            def apply(y):
                return nn.GroupNorm(
                    num_groups=min(32, y.shape[-1]), epsilon=1e-5,
                    name=name)(y)
            return apply
        x = roi_feats
        # channel-expanding residual block 256 -> 1024
        idn = nn.Conv(self.conv_out, (1, 1), use_bias=False,
                      dtype=self.dtype, name='res_id')(x)
        y = nn.Conv(self.conv_out // 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name='res_c1')(x)
        y = nn.relu(_gn('res_n1')(y))
        y = nn.Conv(self.conv_out, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False, dtype=self.dtype, name='res_c2')(y)
        y = _gn('res_n2')(y)
        x = nn.relu(idn + y)
        for i in range(self.num_convs):
            idn = x
            y = nn.Conv(self.conv_out // 4, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f'conv{i}_c1')(x)
            y = nn.relu(_gn(f'conv{i}_n1')(y))
            y = nn.Conv(self.conv_out // 4, (3, 3), padding=[(1, 1)] * 2,
                        use_bias=False, dtype=self.dtype,
                        name=f'conv{i}_c2')(y)
            y = nn.relu(_gn(f'conv{i}_n2')(y))
            y = nn.Conv(self.conv_out, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f'conv{i}_c3')(y)
            y = _gn(f'conv{i}_n3')(y)
            x = nn.relu(idn + y)
        reg_feat = x.mean(axis=(1, 2))
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(reg_dim, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.001),
                       name='fc_reg')(reg_feat)
        # fc cls branch on the raw roi features
        f = roi_feats.reshape(roi_feats.shape[0], -1)
        for i in range(2):
            f = nn.relu(nn.Dense(self.fc_out, dtype=self.dtype,
                                 name=f'fc{i}')(f))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name='fc_cls')(f)
        return cls.astype(jnp.float32), reg.astype(jnp.float32)


@HEADS.register_module()
class DoubleHeadRoIHead(StandardRoIHead):

    def __init__(self, bbox_head=None, **kwargs):
        bh = dict(bbox_head or {})
        bh.setdefault('reg_class_agnostic', False)
        super().__init__(bbox_head=bh, **kwargs)
        bh.pop('type', None)
        self.net = DoubleBBoxHeadNet(
            num_classes=self.num_classes, roi_size=self.roi_size,
            in_channels=bh.get('in_channels', 256),
            conv_out=bh.get('conv_out_channels', 1024),
            fc_out=bh.get('fc_out_channels', 1024),
            num_convs=bh.get('num_convs', 4),
            reg_class_agnostic=self.reg_class_agnostic)


class MaskIoUHeadNet(nn.Module):
    """maskiou_head.py: convs over mask-feat ++ pooled mask, 3 fcs."""
    num_classes: int
    conv_out: int = 256
    fc_out: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mask_feat, mask_pred):
        # mask_pred (R, 2s, 2s) -> maxpool to (R, s, s, 1)
        mp = nn.max_pool(mask_pred[..., None], (2, 2), strides=(2, 2))
        x = jnp.concatenate([mask_feat, mp], axis=-1)
        for i in range(4):
            stride = 2 if i == 3 else 1
            x = nn.relu(nn.Conv(self.conv_out, (3, 3),
                                strides=(stride, stride),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name=f'conv{i}')(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(2):
            x = nn.relu(nn.Dense(self.fc_out, dtype=self.dtype,
                                 name=f'fc{i}')(x))
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name='fc_iou')(x).astype(jnp.float32)


@HEADS.register_module()
class MaskScoringRoIHead(StandardRoIHead):

    def __init__(self, mask_iou_head=None, **kwargs):
        super().__init__(**kwargs)
        mi = dict(mask_iou_head or {})
        self.loss_iou_weight = mi.get('loss_iou', {}).get('loss_weight', 0.5)
        self.maskiou_net = MaskIoUHeadNet(
            num_classes=self.num_classes,
            conv_out=mi.get('conv_out_channels', 256),
            fc_out=mi.get('fc_out_channels', 1024))

    def _maskiou_vars(self, variables):
        return {'params': variables['params']['maskiou']}

    def init_all_variables(self, rng, in_channels=256):
        r1, r2, r3 = jax.random.split(rng, 3)
        params = dict(bbox=self.net.init(
            r1, jnp.zeros((1, self.roi_size, self.roi_size,
                           in_channels)))['params'])
        if self.mask_head is not None:
            params['mask'] = self.mask_head.net.init(
                r2, jnp.zeros((1, self.mask_roi_size, self.mask_roi_size,
                               in_channels)))['params']
            params['maskiou'] = self.maskiou_net.init(
                r3, jnp.zeros((1, self.mask_roi_size, self.mask_roi_size,
                               in_channels)),
                jnp.zeros((1, 2 * self.mask_roi_size,
                           2 * self.mask_roi_size)))['params']
        return params

    def forward_train(self, variables, feats, proposals, prop_valid, batch,
                      rng) -> Dict[str, jnp.ndarray]:
        losses = super().forward_train(variables, feats, proposals,
                                       prop_valid, batch, rng)
        if self.mask_head is None or 'gt_masks' not in batch or \
                'maskiou' not in variables['params']:
            return losses
        # re-sample the same rois (same rng) for the maskiou branch
        b = proposals.shape[0]
        rngs = jax.random.split(rng, b)
        (rois, roi_valid, roi_pos, labels, _, roi_gt_inds, _w) = jax.vmap(
            self.sample_rois)(proposals, prop_valid, batch['gt_bboxes'],
                              batch['gt_labels'], batch['gt_valid'], rngs)
        mask_vars = self._mask_vars(variables)
        mi_vars = self._maskiou_vars(variables)

        def single(img_feats, r, rv, rp, rl, rgi, gm):
            mf = multi_level_roi_align(img_feats, r, rv & rp,
                                       self.mask_roi_size,
                                       self.featmap_strides)
            logits = self.mask_head.net.apply(mask_vars, mf)
            out = logits.shape[1]
            safe = jnp.clip(rl, 0, self.num_classes - 1)
            sel = jnp.take_along_axis(
                logits, safe[:, None, None, None].repeat(out, 1).repeat(
                    out, 2), axis=-1)[..., 0]
            pred_bin = (jax.nn.sigmoid(sel) > 0.5).astype(jnp.float32)
            tgt = mask_targets(gm, r, rgi, out,
                               self.mask_head.mask_stride)
            inter = (pred_bin * tgt).sum((1, 2))
            union = pred_bin.sum((1, 2)) + tgt.sum((1, 2)) - inter
            iou_tgt = inter / jnp.maximum(union, 1.0)
            iou_pred = self.maskiou_net.apply(
                mi_vars, mf, jax.lax.stop_gradient(sel))
            iou_sel = jnp.take_along_axis(iou_pred, safe[:, None],
                                          1)[:, 0]
            posf = rp.astype(jnp.float32)
            l2 = 0.5 * (iou_sel - jax.lax.stop_gradient(iou_tgt))**2
            return (l2 * posf).sum(), posf.sum()

        l, n = jax.vmap(single)(
            [f for f in feats[:len(self.featmap_strides)]], rois, roi_valid,
            roi_pos, labels, roi_gt_inds, batch['gt_masks'])
        losses['loss_mask_iou'] = self.loss_iou_weight * l.sum() / \
            jnp.maximum(n.sum(), 1.0)
        return losses


class _DynamicSmoothL1:
    """SmoothL1 whose beta tracks the ktop-th smallest positive regression
    target magnitude of the CURRENT batch (DSR half of Dynamic R-CNN; the
    reference updates from rolling history at intervals, here stateless
    per batch — same signal inside one jitted step)."""

    def __init__(self, ktop=10, initial_beta=1.0, loss_weight=1.0):
        self.ktop = ktop
        self.initial_beta = initial_beta
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        err = jnp.abs(pred - target)                     # (N, 4)
        posm = (weight[:, 0] > 0) if weight is not None else \
            jnp.ones(err.shape[0], bool)
        per_box = jnp.where(posm, jnp.abs(target).mean(-1), 1e9)
        k = min(self.ktop, per_box.shape[0])
        kth = -jax.lax.top_k(-per_box, k)[0][-1]
        beta = jnp.clip(kth, 1e-3, self.initial_beta)
        loss = jnp.where(err < beta, 0.5 * err * err / beta,
                         err - 0.5 * beta)
        if weight is not None:
            loss = loss * weight
        if avg_factor is not None:
            return self.loss_weight * loss.sum() / avg_factor
        return self.loss_weight * loss.mean()


@HEADS.register_module()
class DynamicRoIHead(StandardRoIHead):

    def __init__(self, *args, ktop_iou=75, ktop_beta=10, initial_iou=0.4,
                 initial_beta=1.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.ktop_iou = ktop_iou
        self.ktop_beta = ktop_beta
        self.initial_iou = initial_iou
        self.initial_beta = initial_beta
        # DSR: swap the static SmoothL1 for the batch-adaptive one
        self.loss_bbox_fn = _DynamicSmoothL1(
            ktop=ktop_beta, initial_beta=initial_beta)

    def sample_rois(self, proposals, prop_valid, gt_bboxes, gt_labels,
                    gt_valid, rng, extras=None):
        """MaxIoU assignment with a batch-adaptive positive threshold:
        thr = mean over gts of their ktop-th best proposal IoU (DLA)."""
        if self.add_gt_as_proposals:
            proposals_all = jnp.concatenate([gt_bboxes, proposals])
            valid_all = jnp.concatenate([gt_valid, prop_valid])
        else:
            proposals_all, valid_all = proposals, prop_valid
        iou = jnp.where(
            gt_valid[None, :] & valid_all[:, None],
            bbox_overlaps(proposals_all, gt_bboxes), 0.0)    # (P, G)
        k = min(self.ktop_iou, proposals_all.shape[0])
        topk, _ = jax.lax.top_k(iou.T, k)                    # (G, k)
        kth = topk[:, -1]
        thr = jnp.where(gt_valid.any(),
                        (kth * gt_valid).sum() /
                        jnp.maximum(gt_valid.sum(), 1),
                        self.initial_iou)
        thr = jnp.clip(thr, self.initial_iou, 0.6)
        # dynamically-thresholded MaxIoU assign
        max_iou = iou.max(axis=1)
        argmax = iou.argmax(axis=1)
        pos = (max_iou >= thr) & valid_all
        from ld_tpu.ops.samplers import select_topk_mask
        r1, r2 = jax.random.split(rng)
        num_pos_max = int(self.num_samples * self.pos_fraction)
        pos_sel, n_pos = select_topk_mask(
            jax.random.uniform(r1, pos.shape), pos, num_pos_max)
        neg_mask = valid_all & ~pos
        keys = jnp.where(neg_mask, jax.random.uniform(r2, neg_mask.shape),
                         -1e9)
        order = jnp.argsort(keys)[::-1]
        rank = jnp.empty_like(order).at[order].set(
            jnp.arange(order.shape[0]))
        neg_sel = neg_mask & (rank < jnp.asarray(self.num_samples) - n_pos)
        sel = pos_sel | neg_sel
        rank_keys = jnp.where(pos_sel, 2.0, jnp.where(neg_sel, 1.0, 0.0)) + \
            jax.random.uniform(jax.random.fold_in(rng, 7), sel.shape) * 0.5
        _, order2 = jax.lax.top_k(rank_keys,
                                  min(self.num_samples,
                                      rank_keys.shape[0]))
        rois = proposals_all[order2]
        roi_valid = sel[order2]
        roi_pos = pos_sel[order2]
        safe = argmax[order2]
        labels = jnp.where(roi_pos, gt_labels[safe], self.num_classes)
        deltas = self.coder.encode(rois, gt_bboxes[safe])
        return (rois, roi_valid, roi_pos, labels, deltas, safe,
                jnp.ones_like(max_iou[order2]))
