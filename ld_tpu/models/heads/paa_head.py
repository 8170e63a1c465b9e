"""PAA head (probabilistic anchor assignment via a 2-component GMM).

Parity: /root/reference/mmdet/models/dense_heads/paa_head.py —
1) loose MaxIoU first match (pos=neg=0.1) collects candidate positives;
2) per-candidate loss = focal(cls) + GIoU(decoded) (`get_pos_loss:201`);
3) per gt: top-`topk` lowest-loss candidates per level pooled, a 1-D
   2-component GMM is fit on their losses (`paa_reassign:257`; the
   reference shells out to sklearn on CPU — here a fixed-iteration EM in
   jnp, vmapped over gts, keeps the whole step on-device);
4) separation scheme (c): positives = the lowest-loss fg-component
   candidates up to that component's density peak
   (`gmm_separation_scheme:366`);
5) final losses: focal cls (avg max(num_pos, B)), GIoU weighted by the
   detached decoded-IoU (avg iou_target.sum()), BCE iou branch (avg
   num_pos). Inference scores = sqrt(cls_prob * iou_prob), plus optional
   score voting.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ld_tpu.ops.boxes import bbox_overlaps
from ld_tpu.ops.coder import build_coder
from ld_tpu.ops.max_iou_assigner import MaxIoUAssigner
from ld_tpu.ops.nms import multiclass_nms, topk_flat
from ld_tpu.utils.registry import HEADS, LOSSES
from .atss_gfl_head import ATSSGFLHead
from .classic_heads import ATSSHeadNet
from .retina_gfl_head import flatten_levels_anchors

EPS = 1e-6
BIG = 1e8


def fit_gmm_1d(x, valid, iters=10, reg=1e-6):
    """2-component 1-D GMM EM on masked samples.

    Returns (resp0, log_density): responsibility of the low-mean component
    and per-sample mixture log-density. Masked slots return resp0=0.
    """
    n_valid = jnp.maximum(valid.sum(), 1)
    xv = jnp.where(valid, x, 0.0)
    lo = jnp.min(jnp.where(valid, x, BIG))
    hi = jnp.max(jnp.where(valid, x, -BIG))
    mu = jnp.stack([lo, hi])
    var = jnp.ones(2)
    w = jnp.full(2, 0.5)

    def step(state, _):
        mu, var, w = state
        logp = (jnp.log(w[None, :] + EPS)
                - 0.5 * jnp.log(2 * jnp.pi * var[None, :])
                - 0.5 * (x[:, None] - mu[None, :])**2 / var[None, :])
        resp = jax.nn.softmax(logp, axis=1)
        resp = jnp.where(valid[:, None], resp, 0.0)
        nk = resp.sum(0) + EPS
        mu2 = (resp * xv[:, None]).sum(0) / nk
        var2 = (resp * (x[:, None] - mu2[None, :])**2).sum(0) / nk + reg
        w2 = nk / n_valid
        return (mu2, var2, w2), None

    (mu, var, w), _ = jax.lax.scan(step, (mu, var, w), None, length=iters)
    logp = (jnp.log(w[None, :] + EPS)
            - 0.5 * jnp.log(2 * jnp.pi * var[None, :])
            - 0.5 * (x[:, None] - mu[None, :])**2 / var[None, :])
    # component 0 = smaller mean (EM preserves the init ordering in
    # practice; enforce it anyway)
    order = jnp.argsort(mu)
    logp = logp[:, order]
    resp = jax.nn.softmax(logp, axis=1)
    log_density = jax.scipy.special.logsumexp(logp, axis=1)
    return jnp.where(valid, resp[:, 0], 0.0), \
        jnp.where(valid, log_density, -BIG)


@HEADS.register_module()
class PAAHead(ATSSGFLHead):
    """PAA rides the ATSS tower (cls / 4-delta reg / iou branch)."""

    def __init__(self, num_classes, in_channels, topk=9,
                 score_voting=True, covariance_type='diag',
                 bbox_coder=None, loss_bbox=None, loss_centerness=None,
                 **kwargs):
        kwargs.setdefault('loss_cls', dict(
            type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0))
        kwargs.setdefault('train_cfg', dict(assigner=dict(
            type='MaxIoUAssigner', pos_iou_thr=0.1, neg_iou_thr=0.1,
            min_pos_iou=0.0)))
        super().__init__(num_classes, in_channels,
                         loss_bbox=loss_bbox or dict(type='GIoULoss',
                                                     loss_weight=1.3),
                         **kwargs)
        self.topk = topk
        self.with_score_voting = score_voting
        self.coder = build_coder(bbox_coder or dict(
            type='DeltaXYWHBBoxCoder', target_means=[0.] * 4,
            target_stds=[0.1, 0.1, 0.2, 0.2]))
        self.loss_iou = LOSSES.build(loss_centerness or dict(
            type='CrossEntropyLoss', use_sigmoid=True, loss_weight=0.5))
        a_cfg = dict(self.train_cfg.get('assigner', {}))
        a_cfg.pop('type', None)
        a_cfg.setdefault('pos_iou_thr', 0.1)
        a_cfg.setdefault('neg_iou_thr', 0.1)
        self.assigner = MaxIoUAssigner(**a_cfg)

    def _build_net(self, dtype):
        self._dtype = dtype
        return ATSSHeadNet(num_classes=self.num_classes,
                           feat_channels=self.feat_channels,
                           stacked_convs=self.stacked_convs,
                           num_levels=self.num_levels, dtype=dtype)

    def _reassign_single(self, pos_loss, cand, gt_inds, level_id, num_gt,
                         num_levels):
        """GMM reassignment for one image. Returns the kept positive mask."""
        n = pos_loss.shape[0]
        k = self.topk
        safe = jnp.clip(gt_inds, 0)
        # (G, L, N) candidacy
        in_gl = (safe[None, None, :] == jnp.arange(num_gt)[:, None, None]) \
            & (level_id[None, None, :] ==
               jnp.arange(num_levels)[None, :, None]) \
            & cand[None, None, :]
        masked_loss = jnp.where(in_gl, pos_loss[None, None, :], BIG)
        # per (g, l): topk smallest-loss candidates
        neg_top, idx = jax.lax.top_k(-masked_loss, k)         # (G, L, k)
        loss_gl = -neg_top
        valid_gl = loss_gl < BIG / 2
        x = loss_gl.reshape(num_gt, num_levels * k)           # (G, K)
        xv = valid_gl.reshape(num_gt, num_levels * k)
        aidx = idx.reshape(num_gt, num_levels * k)

        def per_gt(xg, vg, ag):
            enough = vg.sum() >= 2
            resp0, logd = fit_gmm_1d(xg, vg)
            fg = (resp0 > 0.5) & vg
            # rank among fg candidates by loss (ascending, ties by slot)
            key = xg + jnp.arange(xg.shape[0]) * 1e-9
            fg_rank = ((key[None, :] < key[:, None]) & fg[None, :]).sum(1)
            best = jnp.argmax(jnp.where(fg, logd, -BIG))
            thr = fg_rank[best]
            keep = fg & (fg_rank <= thr) & enough
            return jnp.zeros((n, ), jnp.int32).at[ag].add(
                keep.astype(jnp.int32)) > 0

        per_gt_sel = jax.vmap(per_gt)(x, xv, aidx)            # (G, N)
        return per_gt_sel.any(axis=0) & cand

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds, iou_preds = outputs
        anchors, num_lvl, strides, level_id = self.level_geometry(
            featmap_sizes)
        num_levels = len(num_lvl)
        cls_flat = flatten_levels_anchors(
            cls_scores, self.cls_out_channels).astype(jnp.float32)
        reg_flat = flatten_levels_anchors(bbox_preds, 4).astype(jnp.float32)
        iou_flat = flatten_levels_anchors(iou_preds, 1).astype(
            jnp.float32)[..., 0]
        gt_bboxes = batch['gt_bboxes']
        num_gt = gt_bboxes.shape[1]

        def single(gtb, gtl, gtv, hw, cls_p, reg_p):
            vf = jnp.concatenate(
                self.anchor_generator.valid_flags(featmap_sizes, hw))
            res = self.assigner.assign(anchors, num_lvl, gtb, gtl, gtv, vf,
                                       num_classes=self.num_classes)
            cand = res.pos_mask & vf
            safe = jnp.clip(res.assigned_gt_inds, 0)
            tgt = gtb[safe]
            decoded = self.coder.decode(anchors, reg_p)
            l_cls = self.loss_cls(cls_p, res.labels,
                                  reduction_override='none').sum(-1)
            l_box = self.loss_bbox(decoded, tgt, reduction_override='none')
            pos_loss = jax.lax.stop_gradient(l_cls + l_box)
            keep = self._reassign_single(pos_loss, cand, res.assigned_gt_inds,
                                         level_id, num_gt, num_levels)
            labels = jnp.where(keep, res.labels, self.num_classes)
            return labels, keep, tgt, vf, decoded

        labels, keep, tgt, valid, decoded = jax.vmap(
            single, in_axes=(0, 0, 0, 0, 0, 0))(
                gt_bboxes, batch['gt_labels'], batch['gt_valid'],
                batch['img_hw'], cls_flat, reg_flat)

        keepf = keep.astype(jnp.float32)
        num_pos = keepf.sum()
        b = cls_flat.shape[0]
        loss_cls = self.loss_cls(cls_flat, labels,
                                 weight=valid.astype(jnp.float32),
                                 avg_factor=jnp.maximum(num_pos, b))
        iou_target = jnp.where(
            keep,
            jax.lax.stop_gradient(
                bbox_overlaps(decoded, tgt, is_aligned=True)), 0.0)
        loss_bbox = self.loss_bbox(
            decoded.reshape(-1, 4), tgt.reshape(-1, 4),
            weight=jnp.clip(iou_target, EPS).reshape(-1) * keepf.reshape(-1),
            avg_factor=iou_target.sum() + EPS)
        loss_iou = self.loss_iou(
            iou_flat.reshape(-1, 1), iou_target.reshape(-1, 1),
            weight=keepf.reshape(-1, 1), avg_factor=jnp.maximum(num_pos, 1))
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_iou=loss_iou)

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        cfg = cfg or self.test_cfg
        cls_scores, bbox_preds, iou_preds = outputs
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        nms_pre = cfg.get('nms_pre', 1000)

        def per_image(cls_list, reg_list, iou_list, hw, sf):
            boxes_all, scores_all = [], []
            for lvl in range(len(featmap_sizes)):
                scores = jax.nn.sigmoid(
                    cls_list[lvl].reshape(-1, self.cls_out_channels))
                iou_p = jax.nn.sigmoid(iou_list[lvl].reshape(-1))
                reg = reg_list[lvl].reshape(-1, 4)
                a = mlvl_anchors[lvl]
                nms_scores = jnp.sqrt(
                    jnp.clip(scores * iou_p[:, None], 0.0))
                if nms_pre > 0 and scores.shape[0] > nms_pre:
                    _, topk = topk_flat(nms_scores.max(-1), nms_pre)
                    nms_scores, reg, a = nms_scores[topk], reg[topk], a[topk]
                boxes_all.append(self.coder.decode(a, reg, max_shape=hw))
                scores_all.append(nms_scores)
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            dets, det_labels, n = multiclass_nms(
                boxes, scores, cfg.get('score_thr', 0.05),
                cfg.get('nms', {}).get('iou_threshold', 0.6),
                max_per_img=cfg.get('max_per_img', 100))
            if self.with_score_voting:
                dets = self._score_voting(dets, det_labels, boxes, scores,
                                          cfg.get('score_thr', 0.05))
            return dets, det_labels, n

        b = cls_scores[0].shape[0]
        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)(
            [c for c in cls_scores], [r for r in bbox_preds],
            [i for i in iou_preds], img_hw, scale_factor)

    def _score_voting(self, dets, det_labels, boxes, scores, score_thr):
        """Refine each detection with same-class neighbours:
        w_i = p_i * exp(-(1-IoU_i)^2 / 0.025) (paa_head.py score_voting)."""
        # per-detection candidate scores for its own class: (D, N)
        det_cls_scores = scores[:, det_labels].T
        iou = bbox_overlaps(dets[:, :4], boxes)               # (D, N)
        w = det_cls_scores * jnp.exp(-(1.0 - iou)**2 / 0.025) * \
            (iou > 0.01) * (det_cls_scores > score_thr)
        denom = w.sum(-1, keepdims=True) + EPS
        voted = (w[:, :, None] * boxes[None]).sum(1) / denom
        use = (dets[:, 4:5] > 0) & (w.sum(-1, keepdims=True) > EPS)
        return jnp.concatenate(
            [jnp.where(use, voted, dets[:, :4]), dets[:, 4:5]], axis=-1)
