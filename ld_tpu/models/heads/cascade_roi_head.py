"""Cascade R-CNN ROI head: iterative box refinement with rising IoU
thresholds.

Parity: /root/reference/mmdet/models/roi_heads/cascade_roi_head.py:13 —
3 stages, assigner pos/neg IoU (0.5, 0.6, 0.7), coder stds shrinking
(0.1/0.05/0.033 scales), per-stage loss weights (1, 0.5, 0.25), inference
averages the 3 stages' class scores on the final boxes.

Static shapes: each stage re-assigns and re-samples the SAME fixed roi
count; refined boxes feed the next stage under stop_gradient (the reference
detaches between stages too).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ld_tpu.ops.coder import DeltaXYWHBBoxCoder
from ld_tpu.ops.nms import multiclass_nms
from ld_tpu.ops.roi_align import multi_level_roi_align
from ld_tpu.utils.registry import HEADS
from .roi_head import Shared2FCBBoxHeadNet, StandardRoIHead

DEFAULT_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
                (0.033, 0.033, 0.067, 0.067))
DEFAULT_IOUS = (0.5, 0.6, 0.7)
DEFAULT_STAGE_WEIGHTS = (1.0, 0.5, 0.25)


@HEADS.register_module()
class CascadeRoIHead(StandardRoIHead):

    def __init__(self, num_stages=3, stage_loss_weights=DEFAULT_STAGE_WEIGHTS,
                 bbox_roi_extractor=None, bbox_head=None, train_cfg=None,
                 test_cfg=None, mask_roi_extractor=None, mask_head=None,
                 dtype=None, **kwargs):
        import jax.numpy as _jnp
        dtype = dtype or _jnp.float32
        # per-stage train cfgs may come as a list (mmdet style)
        self._stage_train_cfgs = train_cfg if isinstance(train_cfg, list) \
            else [train_cfg] * num_stages
        bbox_heads = bbox_head if isinstance(bbox_head, list) \
            else [bbox_head] * num_stages
        super().__init__(bbox_roi_extractor=bbox_roi_extractor,
                         bbox_head=bbox_heads[0],
                         mask_roi_extractor=mask_roi_extractor,
                         mask_head=(mask_head[0] if isinstance(
                             mask_head, list) else mask_head),
                         train_cfg=self._stage_train_cfgs[0],
                         test_cfg=test_cfg, dtype=dtype)
        self.num_stages = num_stages
        self.stage_loss_weights = tuple(stage_loss_weights)
        # all stages are class-agnostic regressors in Cascade R-CNN
        self.reg_class_agnostic = True
        self.coders = [
            DeltaXYWHBBoxCoder(target_stds=DEFAULT_STDS[min(
                i, len(DEFAULT_STDS) - 1)]) for i in range(num_stages)
        ]
        self.stage_ious = [
            (self._stage_train_cfgs[i] or {}).get(
                'assigner', {}).get('pos_iou_thr',
                                    DEFAULT_IOUS[min(i, 2)])
            for i in range(num_stages)
        ]
        from .roi_head import _convfc_shape
        self.nets = []
        for i in range(num_stages):
            bh = bbox_heads[i] or {}
            n_convs, n_fcs = _convfc_shape(bh)
            self.nets.append(Shared2FCBBoxHeadNet(
                num_classes=self.num_classes, roi_size=self.roi_size,
                in_channels=bh.get('in_channels', 256),
                fc_dim=bh.get('fc_out_channels', 1024),
                num_convs=n_convs, num_fcs=n_fcs,
                conv_dim=bh.get('conv_out_channels', 256),
                reg_class_agnostic=True, dtype=dtype))
        self.net = self.nets[0]
        # Cascade Mask R-CNN: one mask head per stage (the reference
        # replicates a single mask_head cfg across stages,
        # cascade_roi_head.py init_mask_head); trained on each stage's
        # positive rois, test-time masks averaged over stages.
        self.mask_heads = None
        if self.mask_head is not None:
            from .mask_head import FCNMaskHead
            mh_cfgs = mask_head if isinstance(mask_head, list) \
                else [mask_head] * num_stages
            self.mask_heads = []
            for mh in mh_cfgs:
                mh = dict(mh)
                mh.pop('type', None)
                mh.setdefault('num_classes', self.num_classes)
                mh.setdefault('roi_size', self.mask_roi_size)
                self.mask_heads.append(FCNMaskHead(dtype=dtype, **mh))
            self.mask_head = self.mask_heads[0]

    # ---- variables ------------------------------------------------------------
    def init_all_variables(self, rng, in_channels=256):
        params = {}
        for i, net in enumerate(self.nets):
            r = jax.random.fold_in(rng, i)
            v = net.init(r, jnp.zeros((1, self.roi_size, self.roi_size,
                                       in_channels)))
            params[f'stage{i}'] = v['params']
        if self.mask_heads is not None:
            for i, mh in enumerate(self.mask_heads):
                r = jax.random.fold_in(rng, 100 + i)
                v = mh.net.init(r, jnp.zeros(
                    (1, self.mask_roi_size, self.mask_roi_size,
                     in_channels)))
                params[f'mask{i}'] = v['params']
        return params

    def _stage_vars(self, variables, i):
        p = variables['params']
        return {'params': p[f'stage{i}'] if f'stage{i}' in p else p}

    # ---- training -------------------------------------------------------------
    def forward_train(self, variables, feats, proposals, prop_valid, batch,
                      rng) -> Dict[str, jnp.ndarray]:
        losses = {}
        boxes, valid = proposals, prop_valid
        for i in range(self.num_stages):
            self.assigner.pos_iou_thr = self.stage_ious[i]
            self.assigner.neg_iou_thr = self.stage_ious[i]
            self.assigner.min_pos_iou = self.stage_ious[i]
            self.coder = self.coders[i]
            (rois, roi_valid, roi_pos, labels, deltas,
             roi_gt_inds, _) = jax.vmap(self.sample_rois)(
                 boxes, valid, batch['gt_bboxes'], batch['gt_labels'],
                 batch['gt_valid'], jax.random.split(
                     jax.random.fold_in(rng, i), boxes.shape[0]))

            def extract(img_feats, img_rois, img_valid):
                return multi_level_roi_align(
                    img_feats, img_rois, img_valid, self.roi_size,
                    self.featmap_strides)

            roi_feats = jax.vmap(extract)(
                [f for f in feats[:len(self.featmap_strides)]], rois,
                roi_valid)
            cls, reg = self.nets[i].apply(
                self._stage_vars(variables, i),
                roi_feats.reshape(-1, self.roi_size, self.roi_size,
                                  roi_feats.shape[-1]))
            labels_f = labels.reshape(-1)
            validf = roi_valid.reshape(-1).astype(jnp.float32)
            posf = roi_pos.reshape(-1).astype(jnp.float32)
            avg = jnp.maximum(validf.sum(), 1.0)
            w = self.stage_loss_weights[i]
            losses[f'loss_cls_s{i}'] = w * self.loss_cls_fn(
                cls, labels_f, weight=validf, avg_factor=avg)
            losses[f'loss_bbox_s{i}'] = w * self.loss_bbox_fn(
                reg, deltas.reshape(-1, 4),
                weight=jnp.repeat(posf[:, None], 4, 1),
                avg_factor=jnp.maximum(posf.sum(), 1.0) * 4.0)
            if self.mask_heads is not None and 'gt_masks' in batch:
                mvars = {'params': variables['params'][f'mask{i}']}

                def mask_extract(img_feats, img_rois, img_valid):
                    return multi_level_roi_align(
                        img_feats, img_rois, img_valid, self.mask_roi_size,
                        self.featmap_strides)

                mfeats = jax.vmap(mask_extract)(
                    [f for f in feats[:len(self.featmap_strides)]], rois,
                    roi_valid & roi_pos)

                def one_img(mf, r, rp, rl, rgi, gm):
                    return self.mask_heads[i].loss(mvars, mf, r, rp, rl,
                                                   rgi, gm)

                losses[f'loss_mask_s{i}'] = w * jax.vmap(one_img)(
                    mfeats, rois, roi_pos, labels, roi_gt_inds,
                    batch['gt_masks']).mean()
            # refine rois for the next stage
            b = rois.shape[0]
            refined = self.coders[i].decode(
                rois.reshape(-1, 4), reg,
                max_shape=None).reshape(b, -1, 4)
            boxes = jax.lax.stop_gradient(refined)
            valid = roi_valid
        return losses

    # ---- inference ------------------------------------------------------------
    def simple_test(self, variables, feats, proposals, prop_valid, img_hw,
                    scale_factor=None, rescale=False, cfg=None,
                    with_masks=None):
        cfg = cfg or self.test_cfg

        def per_image(img_feats, img_rois, img_valid, hw, sf):
            boxes = img_rois
            cls_sum = None
            for i in range(self.num_stages):
                roi_feats = multi_level_roi_align(
                    img_feats, boxes, img_valid, self.roi_size,
                    self.featmap_strides)
                cls, reg = self.nets[i].apply(
                    self._stage_vars(variables, i), roi_feats)
                scores = jax.nn.softmax(cls, axis=-1)
                cls_sum = scores if cls_sum is None else cls_sum + scores
                boxes = self.coders[i].decode(boxes, reg, max_shape=hw)
            scores = (cls_sum / self.num_stages)[:, :self.num_classes]
            scores = scores * img_valid[:, None]
            out_boxes = boxes
            if rescale and sf is not None:
                out_boxes = out_boxes / sf[None, :]
            return multiclass_nms(
                out_boxes, scores, cfg.get('score_thr', 0.05),
                cfg.get('nms', {}).get('iou_threshold', 0.5),
                max_per_img=cfg.get('max_per_img', 100))

        if scale_factor is None:
            scale_factor = jnp.ones((proposals.shape[0], 4))
        dets, labels, valid = jax.vmap(per_image)(
            [f for f in feats[:len(self.featmap_strides)]], proposals,
            prop_valid, img_hw, scale_factor)
        if with_masks is None:
            with_masks = self.mask_heads is not None
        if not with_masks or self.mask_heads is None:
            return dets, labels, valid

        def per_image_masks(img_feats, img_dets, img_labels, img_valid, sf):
            boxes = img_dets[:, :4]
            if rescale:
                boxes = boxes * sf[None, :]
            roi_feats = multi_level_roi_align(
                img_feats, boxes, img_valid, self.mask_roi_size,
                self.featmap_strides)
            # average the per-stage mask heads (reference aug_masks mean)
            preds = [mh.predict({'params':
                                 variables['params'][f'mask{i}']},
                                roi_feats, img_labels)
                     for i, mh in enumerate(self.mask_heads)]
            return sum(preds) / len(preds)

        masks = jax.vmap(per_image_masks)(
            [f for f in feats[:len(self.featmap_strides)]], dets, labels,
            valid, scale_factor)
        return dets, labels, valid, masks


@HEADS.register_module()
class CascadeSABLRoIHead(CascadeRoIHead):
    """Cascade R-CNN with SABL bucketing bbox heads per stage.

    Parity: /root/reference/configs/sabl/sabl_cascade_rcnn_r50_fpn_1x_coco.py
    — CascadeRoIHead whose three bbox heads are SABLHead with per-stage
    BucketingBBoxCoder scale_factors (1.7 / 1.5 / 1.3); stage refinement
    decodes the argmax bucket + offset, inference averages class scores over
    stages and applies the final stage's bucketing-guided rescoring.
    TwoStageDetector routes `CascadeRoIHead` + list-of-SABLHead here.
    """

    def __init__(self, num_stages=3, stage_loss_weights=DEFAULT_STAGE_WEIGHTS,
                 bbox_roi_extractor=None, bbox_head=None, train_cfg=None,
                 test_cfg=None, dtype=None, **kwargs):
        super().__init__(num_stages=num_stages,
                         stage_loss_weights=stage_loss_weights,
                         bbox_roi_extractor=bbox_roi_extractor,
                         bbox_head=bbox_head, train_cfg=train_cfg,
                         test_cfg=test_cfg, dtype=dtype, **kwargs)
        from ld_tpu.ops.coder import build_coder
        from ld_tpu.utils.registry import LOSSES
        from .roi_head import SABLBBoxHeadNet
        bhs = bbox_head if isinstance(bbox_head, list) \
            else [bbox_head] * num_stages
        default_sf = (1.7, 1.5, 1.3)
        self.coders = [
            build_coder((bh or {}).get('bbox_coder') or dict(
                type='BucketingBBoxCoder', num_buckets=14,
                scale_factor=default_sf[min(i, 2)]))
            for i, bh in enumerate(bhs)
        ]
        bh0 = bhs[0] or {}
        self.loss_bbox_cls_fn = LOSSES.build(
            bh0.get('loss_bbox_cls') or dict(
                type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0))
        self.loss_bbox_reg_fn = LOSSES.build(
            bh0.get('loss_bbox_reg') or dict(
                type='SmoothL1Loss', beta=0.1, loss_weight=1.0))
        self.nets = [
            SABLBBoxHeadNet(
                num_classes=self.num_classes, side_num=c.side_num,
                fc_dim=(bh or {}).get('cls_out_channels', 1024),
                conv_dim=(bh or {}).get('reg_in_channels', 256),
                roi_size=self.roi_size,
                reg_feat_up_ratio=(bh or {}).get('reg_feat_up_ratio', 2),
                reg_pre_num=(bh or {}).get('reg_pre_num', 2),
                reg_post_num=(bh or {}).get('reg_post_num', 1),
                num_cls_fcs=(bh or {}).get('num_cls_fcs', 1),
                num_reg_fcs=(bh or {}).get('num_reg_fcs', 0),
                reg_offset_out_channels=(bh or {}).get(
                    'reg_offset_out_channels', 256),
                reg_cls_out_channels=(bh or {}).get(
                    'reg_cls_out_channels', 256))
            for c, bh in zip(self.coders, bhs)
        ]
        self.net = self.nets[0]

    def _encode_roi_targets(self, rois, matched_gt):
        # bucketing encode deferred to the stage loss (SABLRoIHead semantics)
        return matched_gt

    def forward_train(self, variables, feats, proposals, prop_valid, batch,
                      rng) -> Dict[str, jnp.ndarray]:
        losses = {}
        boxes, valid = proposals, prop_valid
        for i in range(self.num_stages):
            self.assigner.pos_iou_thr = self.stage_ious[i]
            self.assigner.neg_iou_thr = self.stage_ious[i]
            self.assigner.min_pos_iou = self.stage_ious[i]
            self.coder = self.coders[i]
            (rois, roi_valid, roi_pos, labels, gt_boxes,
             _, _) = jax.vmap(self.sample_rois)(
                 boxes, valid, batch['gt_bboxes'], batch['gt_labels'],
                 batch['gt_valid'], jax.random.split(
                     jax.random.fold_in(rng, i), boxes.shape[0]))

            def extract(img_feats, img_rois, img_valid):
                return multi_level_roi_align(
                    img_feats, img_rois, img_valid, self.roi_size,
                    self.featmap_strides)

            roi_feats = jax.vmap(extract)(
                [f for f in feats[:len(self.featmap_strides)]], rois,
                roi_valid)
            cls, (bucket_cls, bucket_off) = self.nets[i].apply(
                self._stage_vars(variables, i),
                roi_feats.reshape(-1, self.roi_size, self.roi_size,
                                  roi_feats.shape[-1]))
            labels_f = labels.reshape(-1)
            validf = roi_valid.reshape(-1).astype(jnp.float32)
            posf = roi_pos.reshape(-1).astype(jnp.float32)
            avg = jnp.maximum(validf.sum(), 1.0)
            w = self.stage_loss_weights[i]
            losses[f'loss_cls_s{i}'] = w * self.loss_cls_fn(
                cls, labels_f, weight=validf, avg_factor=avg)
            flat_rois = rois.reshape(-1, 4)
            offs, off_w, lab1h, cls_w = self.coders[i].encode(
                flat_rois, gt_boxes.reshape(-1, 4))
            n_pos = jnp.maximum(posf.sum(), 1.0)
            sn = self.coders[i].side_num
            losses[f'loss_bbox_cls_s{i}'] = w * self.loss_bbox_cls_fn(
                bucket_cls, lab1h, weight=cls_w * posf[:, None],
                avg_factor=n_pos * 4.0 * sn)
            losses[f'loss_bbox_reg_s{i}'] = w * self.loss_bbox_reg_fn(
                bucket_off, offs, weight=off_w * posf[:, None],
                avg_factor=n_pos * 4.0 * self.coders[i].offset_topk)
            # refine rois for the next stage via bucketing decode
            b = rois.shape[0]
            refined, _conf = self.coders[i].decode(
                flat_rois, (bucket_cls, bucket_off), max_shape=None)
            boxes = jax.lax.stop_gradient(refined.reshape(b, -1, 4))
            valid = roi_valid
        return losses

    def simple_test(self, variables, feats, proposals, prop_valid, img_hw,
                    scale_factor=None, rescale=False, cfg=None,
                    with_masks=None):
        cfg = cfg or self.test_cfg

        def per_image(img_feats, img_rois, img_valid, hw, sf):
            boxes = img_rois
            cls_sum = None
            conf = None
            for i in range(self.num_stages):
                roi_feats = multi_level_roi_align(
                    img_feats, boxes, img_valid, self.roi_size,
                    self.featmap_strides)
                cls, (bucket_cls, bucket_off) = self.nets[i].apply(
                    self._stage_vars(variables, i), roi_feats)
                scores = jax.nn.softmax(cls, axis=-1)
                cls_sum = scores if cls_sum is None else cls_sum + scores
                boxes, conf = self.coders[i].decode(
                    boxes, (bucket_cls, bucket_off), max_shape=hw)
            scores = (cls_sum / self.num_stages)[:, :self.num_classes]
            # final stage's bucketing-guided rescoring
            scores = scores * conf[:, None] * img_valid[:, None]
            out_boxes = boxes
            if rescale and sf is not None:
                out_boxes = out_boxes / sf[None, :]
            return multiclass_nms(
                out_boxes, scores, cfg.get('score_thr', 0.05),
                cfg.get('nms', {}).get('iou_threshold', 0.5),
                max_per_img=cfg.get('max_per_img', 100))

        if scale_factor is None:
            scale_factor = jnp.ones((proposals.shape[0], 4))
        return jax.vmap(per_image)(
            [f for f in feats[:len(self.featmap_strides)]], proposals,
            prop_valid, img_hw, scale_factor)
