"""VarifocalNet (VFNet) head — star-DCN refined, IoU-aware classification.

Parity: /root/reference/mmdet/models/dense_heads/vfnet_head.py —
initial distance regression (exp, scaled by reg_denom or stride), a 9-point
"star" deformable conv whose taps sit on the predicted box
(`star_dcn_offset:276`, gradient_mul partial detach), refined regression =
refine-scale * exp(...) * detached initial, and an IoU-aware cls branch
through the same star DCN. Losses (`loss:339`): VarifocalLoss against
cls_iou_targets (refined IoU at the gt label), GIoU on initial
(weight/avg = detached initial IoU) and refined (weight/avg = refined IoU)
boxes; ATSS assignment on 8-scale square anchors (`use_atss=True` default).
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.ops import anchor_center, distance2bbox
from ld_tpu.ops.boxes import bbox_overlaps, bbox2distance
from ld_tpu.ops.deform_conv import DeformConv
from ld_tpu.ops.nms import multiclass_nms
from ld_tpu.utils.registry import HEADS, LOSSES
from .gfl_head import ConvGNBlock, GFLHead, _CLS_BIAS_INIT, flatten_levels

INF = 1e8
EPS = 1e-6


class VFNetHeadNet(nn.Module):
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 3
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    reg_denoms: Tuple[float, ...] = (64, 128, 256, 512, 1024)
    bbox_norm_type: str = 'reg_denom'
    gradient_mul: float = 0.1
    dcn_on_last_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    def _star_offset(self, bbox_pred, stride):
        """Star tap positions relative to the 3x3 base grid (NHWC)."""
        p = ((1 - self.gradient_mul) * jax.lax.stop_gradient(bbox_pred) +
             self.gradient_mul * bbox_pred) / stride
        l, t, r, b2 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
        z = jnp.zeros_like(l)
        ys = [-t, -t, -t, z, z, z, b2, b2, b2]
        xs = [-l, z, r, -l, z, r, -l, z, r]
        # base grid (ky, kx) in {-1, 0, 1}
        taps = []
        for i in range(9):
            ky, kx = i // 3 - 1, i % 3 - 1
            taps += [ys[i] - ky, xs[i] - kx]
        return jnp.stack(taps, -1).reshape(*l.shape, 9, 2).reshape(
            *l.shape, 18)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        last = self.stacked_convs - 1
        cls_convs = [ConvGNBlock(
            self.feat_channels, dtype=self.dtype,
            with_dcn=self.dcn_on_last_conv and i == last,
            name=f'cls_conv{i}') for i in range(self.stacked_convs)]
        reg_convs = [ConvGNBlock(
            self.feat_channels, dtype=self.dtype,
            with_dcn=self.dcn_on_last_conv and i == last,
            name=f'reg_conv{i}') for i in range(self.stacked_convs)]
        reg_conv = ConvGNBlock(self.feat_channels, dtype=self.dtype,
                               name='vfnet_reg_conv')
        vfnet_reg = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype,
                            kernel_init=nn.initializers.normal(0.01),
                            name='vfnet_reg')
        reg_refine_dconv = DeformConv(self.feat_channels, dtype=self.dtype,
                                      name='vfnet_reg_refine_dconv')
        vfnet_reg_refine = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2,
                                   dtype=self.dtype,
                                   kernel_init=nn.initializers.normal(0.01),
                                   name='vfnet_reg_refine')
        cls_dconv = DeformConv(self.feat_channels, dtype=self.dtype,
                               name='vfnet_cls_dconv')
        vfnet_cls = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype,
                            kernel_init=nn.initializers.normal(0.01),
                            bias_init=nn.initializers.constant(
                                _CLS_BIAS_INIT), name='vfnet_cls')
        scales = self.param('scales', nn.initializers.ones,
                            (len(self.strides), ))
        scales_refine = self.param('scales_refine', nn.initializers.ones,
                                   (len(self.strides), ))

        cls_out, reg_out, reg_refine_out = [], [], []
        for lvl, x in enumerate(feats):
            c, r = x, x
            for conv in cls_convs:
                c = conv(c)
            for conv in reg_convs:
                r = conv(r)
            r_init = reg_conv(r)
            denom = self.reg_denoms[lvl] \
                if self.bbox_norm_type == 'reg_denom' else self.strides[lvl]
            bbox_pred = jnp.exp(jnp.clip(
                vfnet_reg(r_init).astype(jnp.float32) * scales[lvl],
                -8, 8)) * denom
            dcn_offset = self._star_offset(bbox_pred, self.strides[lvl])
            r_ref = nn.relu(reg_refine_dconv(r, dcn_offset))
            scale_part = jnp.exp(jnp.clip(
                vfnet_reg_refine(r_ref).astype(jnp.float32) *
                scales_refine[lvl], -8, 8))
            bbox_refine = scale_part * jax.lax.stop_gradient(bbox_pred)
            c_ref = nn.relu(cls_dconv(c, dcn_offset))
            cls_out.append(vfnet_cls(c_ref).astype(jnp.float32))
            reg_out.append(bbox_pred)
            reg_refine_out.append(bbox_refine)
        return cls_out, reg_out, reg_refine_out


@HEADS.register_module()
class VFNetHead(GFLHead):
    """Rides GFLHead's ATSS targets (8-scale anchors, distance targets)."""

    def __init__(self, num_classes, in_channels, stacked_convs=3,
                 strides=(8, 16, 32, 64, 128),
                 regress_ranges=((-1, 64), (64, 128), (128, 256),
                                 (256, 512), (512, INF)),
                 bbox_norm_type='reg_denom', gradient_mul=0.1,
                 use_vfl=True, dcn_on_last_conv=False, loss_cls=None,
                 loss_bbox=None, loss_bbox_refine=None, **kwargs):
        self.dcn_on_last_conv = dcn_on_last_conv
        self._vf_strides = tuple(strides)
        self._reg_denoms = tuple(
            r[1] if r[1] < INF / 2 else r[0] * 2 for r in regress_ranges)
        self._bbox_norm_type = bbox_norm_type
        self._gradient_mul = gradient_mul
        kwargs.setdefault('anchor_generator', dict(
            ratios=[1.0], octave_base_scale=8, scales_per_octave=1,
            strides=list(strides)))
        super().__init__(
            num_classes, in_channels, stacked_convs=stacked_convs,
            loss_cls=loss_cls or dict(type='VarifocalLoss',
                                      use_sigmoid=True, alpha=0.75,
                                      gamma=2.0, iou_weighted=True,
                                      loss_weight=1.0),
            loss_bbox=loss_bbox or dict(type='GIoULoss', loss_weight=1.5),
            **kwargs)
        self.use_vfl = use_vfl
        self.loss_bbox_refine = LOSSES.build(loss_bbox_refine or dict(
            type='GIoULoss', loss_weight=2.0))

    def _build_net(self, dtype):
        self._dtype = dtype
        return VFNetHeadNet(
            num_classes=self.num_classes,
            feat_channels=self.feat_channels,
            stacked_convs=self.stacked_convs,
            strides=getattr(self, '_vf_strides', (8, 16, 32, 64, 128)),
            reg_denoms=getattr(self, '_reg_denoms',
                               (64, 128, 256, 512, 1024)),
            bbox_norm_type=getattr(self, '_bbox_norm_type', 'reg_denom'),
            gradient_mul=getattr(self, '_gradient_mul', 0.1),
            dcn_on_last_conv=getattr(self, 'dcn_on_last_conv', False),
            dtype=dtype)

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds, bbox_preds_refine = outputs
        t = self.build_targets(featmap_sizes, batch['gt_bboxes'],
                               batch['gt_labels'], batch['gt_valid'],
                               batch['img_hw'])
        cls_flat = flatten_levels(cls_scores)
        pred_flat = flatten_levels(bbox_preds)          # (B, N, 4) distances
        pred_rf_flat = flatten_levels(bbox_preds_refine)
        pos = t['pos_mask']
        posf = pos.astype(jnp.float32)
        points = anchor_center(t['anchors'])[None]
        decoded = distance2bbox(points, pred_flat)
        decoded_rf = distance2bbox(points, pred_rf_flat)
        tgt = t['bbox_targets']

        num_pos = jnp.maximum(posf.sum(), 1.0)
        iou_ini = jnp.where(
            pos, jnp.clip(bbox_overlaps(decoded, tgt, is_aligned=True),
                          EPS), 0.0)
        w_ini = jax.lax.stop_gradient(iou_ini)
        loss_bbox = self.loss_bbox(
            decoded.reshape(-1, 4), tgt.reshape(-1, 4),
            weight=w_ini.reshape(-1),
            avg_factor=jnp.maximum(w_ini.sum(), 1.0))
        iou_rf = jnp.where(
            pos, jnp.clip(bbox_overlaps(decoded_rf, tgt, is_aligned=True),
                          EPS), 0.0)
        w_rf = jax.lax.stop_gradient(iou_rf)
        loss_bbox_rf = self.loss_bbox_refine(
            decoded_rf.reshape(-1, 4), tgt.reshape(-1, 4),
            weight=w_rf.reshape(-1),
            avg_factor=jnp.maximum(w_rf.sum(), 1.0))
        # IoU-aware cls target: refined IoU at the gt label, 0 elsewhere
        labels = t['labels']
        onehot = jax.nn.one_hot(labels, self.cls_out_channels,
                                dtype=cls_flat.dtype)
        cls_iou_targets = onehot * w_rf[..., None] * posf[..., None]
        loss_cls = self.loss_cls(cls_flat, cls_iou_targets,
                                 avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_bbox_rf=loss_bbox_rf)

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        cfg = cfg or self.test_cfg
        cls_scores, _, bbox_preds_refine = outputs
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        anchors, num_lvl, strides, _ = self.level_geometry(featmap_sizes)
        points = anchor_center(anchors)
        nms_pre = cfg.get('nms_pre', 1000)
        lvl_sizes = [h * w for h, w in featmap_sizes]

        def per_image(cls_list, reg_list, hw, sf):
            boxes_all, scores_all = [], []
            lo = 0
            for lvl in range(len(featmap_sizes)):
                n_lvl = lvl_sizes[lvl]
                scores = jax.nn.sigmoid(
                    cls_list[lvl].reshape(-1, self.cls_out_channels))
                reg = reg_list[lvl].reshape(-1, 4)
                pts = points[lo:lo + n_lvl]
                if nms_pre > 0 and n_lvl > nms_pre:
                    _, topk = jax.lax.top_k(scores.max(-1), nms_pre)
                    scores, reg, pts = scores[topk], reg[topk], pts[topk]
                boxes_all.append(distance2bbox(pts, reg, max_shape=hw))
                scores_all.append(scores)
                lo += n_lvl
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            return multiclass_nms(
                boxes, scores, cfg.get('score_thr', 0.05),
                cfg.get('nms', {}).get('iou_threshold', 0.6),
                max_per_img=cfg.get('max_per_img', 100))

        b = cls_scores[0].shape[0]
        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)(
            [c for c in cls_scores], [r for r in bbox_preds_refine],
            img_hw, scale_factor)
