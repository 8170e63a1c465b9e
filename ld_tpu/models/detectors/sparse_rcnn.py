"""Sparse R-CNN: learnable proposals + iterative dynamic-interaction heads
(reference EmbeddingRPNHead + SparseRoIHead + DIIHead stack).

Parity: /root/reference/mmdet/models/detectors/sparse_rcnn.py +
dense_heads/embedding_rpn_head.py + roi_heads/sparse_roi_head.py +
bbox_heads/dii_head.py —
  * EmbeddingRPN: `num_proposals` learnable normalized cxcywh boxes and
    proposal feature vectors.
  * Each of `num_stages` DII heads: multi-head self-attention across the
    proposal features, DYNAMIC instance interaction (two 1x1 convs whose
    weights are generated per proposal from its feature) applied to the
    7x7 roi features, FFN, then cls (sigmoid focal) and per-proposal box
    deltas (DeltaXYWH stds (0.5, 0.5, 1, 1), clip_border=False) refining
    the boxes stage by stage (detached between stages).
  * Set-based training: per-stage Hungarian matching (on-device JV solver,
    ops/matching.py) with focal-cls + L1 + GIoU costs; losses focal(2.0) +
    L1(5.0) + GIoU(2.0) per stage.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.ops.boxes import bbox_overlaps
from ld_tpu.ops.coder import DeltaXYWHBBoxCoder
from ld_tpu.ops.matching import hungarian_lap
from ld_tpu.ops.roi_align import multi_level_roi_align
from ld_tpu.utils.registry import BACKBONES, DETECTORS, NECKS

EPS = 1e-6


class DIIHeadNet(nn.Module):
    num_classes: int
    d_model: int = 256
    num_heads: int = 8
    dyn_channels: int = 64
    ffn_dim: int = 2048
    roi_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats, prop_feats):
        """roi_feats (P, s, s, C); prop_feats (P, C) for ONE image."""
        p, s, _, c = roi_feats.shape
        d = self.d_model
        # self-attention among proposals
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name='self_attn')(
                prop_feats[None], prop_feats[None], prop_feats[None])[0]
        pf = nn.LayerNorm(name='norm_attn')(prop_feats + attn)
        # dynamic instance interaction
        dc = self.dyn_channels
        params = nn.Dense(2 * c * dc, dtype=self.dtype,
                          name='dynamic_params')(pf)
        p1 = params[:, :c * dc].reshape(p, c, dc)
        p2 = params[:, c * dc:].reshape(p, dc, c)
        feats = roi_feats.reshape(p, s * s, c)
        x = jnp.einsum('pnc,pcd->pnd', feats, p1)
        x = nn.relu(nn.LayerNorm(name='dyn_norm1')(x))
        x = jnp.einsum('pnd,pdc->pnc', x, p2)
        x = nn.relu(nn.LayerNorm(name='dyn_norm2')(x))
        x = x.reshape(p, -1)
        x = nn.Dense(d, dtype=self.dtype, name='fc_out')(x)
        pf = nn.LayerNorm(name='norm_inst')(pf + x)
        # FFN
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name='ffn1')(pf)
        y = nn.Dense(d, dtype=self.dtype, name='ffn2')(nn.relu(y))
        obj = nn.LayerNorm(name='norm_ffn')(pf + y)
        # heads
        cls_f = obj
        for i in range(1):
            cls_f = nn.relu(nn.LayerNorm(name=f'cls_norm{i}')(
                nn.Dense(d, use_bias=False, dtype=self.dtype,
                         name=f'cls_fc{i}')(cls_f)))
        cls = nn.Dense(self.num_classes, dtype=self.dtype,
                       bias_init=nn.initializers.constant(-4.6),
                       name='fc_cls')(cls_f)
        reg_f = obj
        for i in range(3):
            reg_f = nn.relu(nn.LayerNorm(name=f'reg_norm{i}')(
                nn.Dense(d, use_bias=False, dtype=self.dtype,
                         name=f'reg_fc{i}')(reg_f)))
        reg = nn.Dense(4, dtype=self.dtype, name='fc_reg')(reg_f)
        return (cls.astype(jnp.float32), reg.astype(jnp.float32),
                obj.astype(jnp.float32))


class SparseRCNNNet(nn.Module):
    backbone: nn.Module
    neck: nn.Module
    num_proposals: int
    num_stages: int
    num_classes: int
    d_model: int = 256

    @nn.compact
    def __call__(self, images, train: bool = False):
        self.param('init_proposal_boxes',
                   lambda k, s: jnp.tile(
                       jnp.asarray([[0.5, 0.5, 1.0, 1.0]]),
                       (self.num_proposals, 1)),
                   (self.num_proposals, 4))
        self.param('init_proposal_features', nn.initializers.normal(1.0),
                   (self.num_proposals, self.d_model))
        x = self.backbone(images, train)
        x = self.neck(x, train)
        return list(x)


@DETECTORS.register_module()
class SparseRCNN:

    def __init__(self, backbone, neck=None, rpn_head=None, roi_head=None,
                 train_cfg=None, test_cfg=None, pretrained=None, **kwargs):
        self.backbone = BACKBONES.build(dict(backbone))
        self.neck = NECKS.build(dict(neck or dict(
            type='FPN', in_channels=[256, 512, 1024, 2048],
            out_channels=256, num_outs=4)))
        rh = dict(rpn_head or {})
        self.num_proposals = rh.get('num_proposals', 100)
        ri = dict(roi_head or {})
        self.num_stages = ri.get('num_stages', 6)
        bh = (ri.get('bbox_head') or [{}])
        bh0 = bh[0] if isinstance(bh, list) else dict(bh)
        self.num_classes = bh0.get('num_classes', 80)
        self.d_model = getattr(self.neck, 'out_channels', 256)
        self.roi_size = 7
        self.featmap_strides = (4, 8, 16, 32)
        self.coder = DeltaXYWHBBoxCoder(
            target_means=(0., 0., 0., 0.),
            target_stds=(0.5, 0.5, 1.0, 1.0))
        self.cls_w, self.l1_w, self.iou_w = 2.0, 5.0, 2.0
        self.test_cfg = test_cfg or dict(max_per_img=100)
        self.net = SparseRCNNNet(
            self.backbone, self.neck, self.num_proposals, self.num_stages,
            self.num_classes, self.d_model)
        self.dii_heads = [
            DIIHeadNet(num_classes=self.num_classes, d_model=self.d_model)
            for _ in range(self.num_stages)
        ]

    def init_variables(self, rng, input_shape=(1, 64, 64, 3)) -> Dict:
        r1, r2 = jax.random.split(rng)
        variables = self.net.init(r1, jnp.zeros(input_shape, jnp.float32))
        params = dict(variables['params'])
        # DII heads consume data-dependent shapes: init explicitly
        for i in range(self.num_stages):
            params[f'dii{i}'] = self.dii_heads[i].init(
                jax.random.fold_in(r2, i),
                jnp.zeros((self.num_proposals, self.roi_size,
                           self.roi_size, self.d_model)),
                jnp.zeros((self.num_proposals, self.d_model)))['params']
        out = dict(variables)
        out['params'] = params
        return out

    def frozen_param_paths(self):
        return ['backbone/' + p for p in self.backbone.frozen_param_paths()]

    def _initial_boxes(self, params, img_hw):
        cxcywh = params['init_proposal_boxes']
        scale = jnp.stack([img_hw[:, 1], img_hw[:, 0], img_hw[:, 1],
                           img_hw[:, 0]], -1)                  # (B, 4)
        cx, cy, w, h = (cxcywh[:, 0], cxcywh[:, 1], cxcywh[:, 2],
                        cxcywh[:, 3])
        box = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                        -1)
        return jnp.clip(box[None] * scale[:, None, :], 0.0)

    def _stages(self, variables, feats, img_hw, train):
        params = variables['params']
        b = feats[0].shape[0]
        boxes = self._initial_boxes(params, img_hw)
        prop = jnp.broadcast_to(params['init_proposal_features'][None],
                                (b, self.num_proposals, self.d_model))
        all_cls, all_boxes = [], []
        for i in range(self.num_stages):
            def extract(img_feats, img_rois):
                return multi_level_roi_align(
                    img_feats, img_rois,
                    jnp.ones(img_rois.shape[0], bool), self.roi_size,
                    self.featmap_strides)
            roi_feats = jax.vmap(extract)(
                [f for f in feats[:len(self.featmap_strides)]], boxes)
            cls, reg, obj = jax.vmap(
                lambda rf, pf: self.dii_heads[i].apply(
                    {'params': params[f'dii{i}']}, rf, pf))(roi_feats, prop)
            new_boxes = self.coder.decode(boxes.reshape(-1, 4),
                                          reg.reshape(-1, 4))
            boxes = jax.lax.stop_gradient(
                new_boxes.reshape(b, self.num_proposals, 4))
            prop = obj
            all_cls.append(cls)
            all_boxes.append(new_boxes.reshape(b, self.num_proposals, 4))
        return all_cls, all_boxes

    def _stage_loss(self, cls, boxes, batch):
        def single(lg, bx, gtb, gtl, gtv, hw):
            probs = jax.nn.sigmoid(lg)
            # focal cls cost + L1 (normalized) + GIoU
            pg = probs[:, jnp.clip(gtl, 0, self.num_classes - 1)]
            # FocalLossCost: pos weighted by alpha, neg by (1 - alpha)
            pos_cost = 0.25 * (1 - pg)**2 * -jnp.log(pg + EPS)
            neg_cost = 0.75 * pg**2 * -jnp.log(1 - pg + EPS)
            cls_cost = pos_cost - neg_cost
            scale = jnp.stack([hw[1], hw[0], hw[1], hw[0]])
            l1 = jnp.abs((bx / scale)[:, None] -
                         (gtb / scale)[None, :]).sum(-1)
            giou = bbox_overlaps(bx, gtb, mode='giou')
            cost = self.cls_w * cls_cost + self.l1_w * l1 - \
                self.iou_w * giou
            col = hungarian_lap(cost.T, gtv)                 # (G,)
            q = bx.shape[0]
            hit = (col[None, :] == jnp.arange(q)[:, None]) & \
                (col >= 0)[None, :]
            pos = hit.any(1)
            gi = jnp.where(pos, hit.argmax(1), 0)
            posf = pos.astype(jnp.float32)
            tgt_box = gtb[gi]
            lab = jnp.where(pos, gtl[gi], self.num_classes)
            onehot = jax.nn.one_hot(lab, self.num_classes)
            # sigmoid focal (alpha=.25, gamma=2)
            pt = jnp.where(onehot > 0, probs, 1 - probs)
            alpha_t = jnp.where(onehot > 0, 0.25, 0.75)
            focal = -alpha_t * (1 - pt)**2 * jnp.log(pt + EPS)
            l_cls = focal.sum()
            l_l1 = (jnp.abs(bx / scale - tgt_box / scale).sum(-1) *
                    posf).sum()
            l_iou = ((1 - bbox_overlaps(bx, tgt_box, mode='giou',
                                        is_aligned=True)) * posf).sum()
            return l_cls, l_l1, l_iou, posf.sum()

        l_cls, l_l1, l_iou, n_pos = jax.vmap(single)(
            cls, boxes, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'], batch['img_hw'])
        np_ = jnp.maximum(n_pos.sum(), 1.0)
        return (self.cls_w * l_cls.sum() / np_,
                self.l1_w * l_l1.sum() / np_,
                self.iou_w * l_iou.sum() / np_)

    def forward_train(self, variables, batch, rng=None
                      ) -> Dict[str, jnp.ndarray]:
        feats = self.net.apply(variables, batch['image'], train=True)
        all_cls, all_boxes = self._stages(variables, feats,
                                          batch['img_hw'], True)
        losses = {}
        for i in range(self.num_stages):
            l_cls, l_l1, l_iou = self._stage_loss(all_cls[i], all_boxes[i],
                                                  batch)
            suffix = '' if i == self.num_stages - 1 else f'_s{i}'
            losses[f'loss_cls{suffix}'] = l_cls
            losses[f'loss_bbox{suffix}'] = l_l1
            losses[f'loss_iou{suffix}'] = l_iou
        return losses

    def forward_test(self, variables, batch, rescale=False):
        feats = self.net.apply(variables, batch['image'], train=False)
        all_cls, all_boxes = self._stages(variables, feats,
                                          batch['img_hw'], False)
        cls = all_cls[-1]
        boxes = all_boxes[-1]
        k = self.test_cfg.get('max_per_img', 100)

        def per_image(lg, bx, sf):
            probs = jax.nn.sigmoid(lg)                        # (P, C)
            flat = probs.reshape(-1)
            kk = min(k, flat.shape[0])
            top, idx = jax.lax.top_k(flat, kk)
            pi = idx // self.num_classes
            lab = idx % self.num_classes
            out_box = bx[pi]
            if rescale and sf is not None:
                out_box = out_box / sf[None, :]
            return (jnp.concatenate([out_box, top[:, None]], -1), lab,
                    jnp.asarray(kk, jnp.int32))

        b = cls.shape[0]
        sf = batch.get('scale_factor')
        if sf is None:
            sf = jnp.ones((b, 4))
        return jax.vmap(per_image)(cls, boxes, sf)

    def simple_test(self, variables, batch, rescale=False):
        return self.forward_test(variables, batch, rescale)
