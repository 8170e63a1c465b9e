"""Hybrid Task Cascade (HTC) ROI head.

Parity: /root/reference/mmdet/models/roi_heads/htc_roi_head.py —
cascade box refinement (3 stages, rising IoU) interleaved with per-stage
mask heads connected by MASK INFORMATION FLOW (stage i's pre-logit mask
feature, passed through a 1x1 adapter, is added to stage i+1's mask input),
plus an optional SEMANTIC branch: a fused FPN semantic feature map trained
with pixel CE whose roi-aligned crops are added to both bbox and mask roi
features. Inference averages stage cls scores on cascade-refined boxes and
averages the stages' mask logits (htc_roi_head.py simple_test).
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.ops.roi_align import multi_level_roi_align, roi_align
from ld_tpu.utils.registry import HEADS
from .cascade_roi_head import CascadeRoIHead
from .mask_head import mask_targets

EPS = 1e-6


class HTCMaskNet(nn.Module):
    """FCN mask head exposing its pre-deconv feature: the reference's
    HTCMaskHead + FeatureRelayHead mask-information-flow roles.
    The FusedSemanticHead role is SemanticHeadNet below."""
    num_classes: int
    num_convs: int = 4
    conv_out: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_feat=None):
        if res_feat is not None:
            x = x + nn.relu(nn.Conv(self.conv_out, (1, 1),
                                    dtype=self.dtype,
                                    name='info_flow')(res_feat))
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name=f'conv{i}')(x))
        feat = x
        y = nn.ConvTranspose(self.conv_out, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name='deconv')(x)
        y = nn.relu(y)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name='logits')(y)
        return logits.astype(jnp.float32), feat


class SemanticHeadNet(nn.Module):
    """Fused semantic branch (htc semantic_head.py): lateral 1x1 on every
    FPN level resized to the stride-8 level, 4 convs, seg logits + a
    feature map for roi fusion."""
    num_classes: int = 183
    channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        ref_h, ref_w = feats[1].shape[1:3]
        fused = 0.0
        for i, f in enumerate(feats):
            lat = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                          name=f'lateral{i}')(f)
            if lat.shape[1] != ref_h:
                lat = jax.image.resize(
                    lat, (lat.shape[0], ref_h, ref_w, self.channels),
                    method='bilinear')
            fused = fused + lat
        x = fused
        for i in range(4):
            x = nn.relu(nn.Conv(self.channels, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name=f'conv{i}')(x))
        seg = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                      name='seg')(x).astype(jnp.float32)
        feat = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                       name='feat')(x)
        return seg, feat


@HEADS.register_module()
class HybridTaskCascadeRoIHead(CascadeRoIHead):

    def __init__(self, num_stages=3, mask_head=None, semantic_head=None,
                 with_semantic=None, loss_semantic_weight=0.2, **kwargs):
        super().__init__(num_stages=num_stages, **kwargs)
        mh = dict(mask_head or {})
        mh.pop('type', None)
        self.mask_roi_size = mh.get('roi_size', 14)
        self.mask_stride = mh.get('mask_stride', 4)
        self.mask_nets = [
            HTCMaskNet(num_classes=self.num_classes,
                       num_convs=mh.get('num_convs', 4),
                       conv_out=mh.get('conv_out_channels', 256))
            for _ in range(num_stages)
        ]
        self.with_semantic = bool(semantic_head) if with_semantic is None \
            else with_semantic
        sh = dict(semantic_head or {})
        sh.pop('type', None)
        self.semantic_stride = sh.get('stride', 8)
        self.loss_semantic_weight = loss_semantic_weight
        self.semantic_net = SemanticHeadNet(
            num_classes=sh.get('num_classes', self.num_classes + 1),
            channels=sh.get('conv_out_channels', 256)) \
            if self.with_semantic else None
        # HTC keeps a mask branch => make simple_test expose it
        self.mask_head = None   # handled internally, not via StandardRoIHead

    def init_all_variables(self, rng, in_channels=256):
        params = super().init_all_variables(rng, in_channels)
        for i, net in enumerate(self.mask_nets):
            r = jax.random.fold_in(rng, 100 + i)
            dummy_res = None if i == 0 else jnp.zeros(
                (1, self.mask_roi_size, self.mask_roi_size,
                 self.mask_nets[0].conv_out))
            params[f'mask{i}'] = net.init(
                r, jnp.zeros((1, self.mask_roi_size, self.mask_roi_size,
                              in_channels)), dummy_res)['params']
        if self.semantic_net is not None:
            sizes = [(64 // s, 64 // s) for s in (4, 8, 16, 32, 64)]
            feats = [jnp.zeros((1, h, w, in_channels)) for h, w in sizes]
            params['semantic'] = self.semantic_net.init(
                jax.random.fold_in(rng, 999), feats)['params']
        return params

    def _mask_stage_vars(self, variables, i):
        return {'params': variables['params'][f'mask{i}']}

    def forward_train(self, variables, feats, proposals, prop_valid, batch,
                      rng) -> Dict[str, jnp.ndarray]:
        losses = {}
        sem_feat = None
        if self.semantic_net is not None:
            seg, sem_feat = self.semantic_net.apply(
                {'params': variables['params']['semantic']},
                [f for f in feats])
            if 'gt_semantic_seg' in batch:
                tgt = batch['gt_semantic_seg']
            elif 'gt_masks' in batch:
                # fallback: foreground map from instance masks
                hs, ws = seg.shape[1:3]
                fg = jax.vmap(lambda m, v: jnp.clip(
                    (m * v[:, None, None]).sum(0), 0, 1))(
                        jax.image.resize(
                            batch['gt_masks'],
                            (batch['gt_masks'].shape[0],
                             batch['gt_masks'].shape[1], hs, ws),
                            method='nearest'),
                        batch['gt_valid'].astype(jnp.float32))
                tgt = fg.astype(jnp.int32)
            else:
                tgt = None
            if tgt is not None:
                logp = jax.nn.log_softmax(seg, -1)
                ce = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
                losses['loss_semantic_seg'] = \
                    self.loss_semantic_weight * ce.mean()

        boxes, valid = proposals, prop_valid
        for i in range(self.num_stages):
            self.assigner.pos_iou_thr = self.stage_ious[i]
            self.assigner.neg_iou_thr = self.stage_ious[i]
            self.assigner.min_pos_iou = self.stage_ious[i]
            self.coder = self.coders[i]
            (rois, roi_valid, roi_pos, labels, deltas,
             roi_gt_inds, _) = jax.vmap(self.sample_rois)(
                 boxes, valid, batch['gt_bboxes'], batch['gt_labels'],
                 batch['gt_valid'],
                 jax.random.split(jax.random.fold_in(rng, i),
                                  boxes.shape[0]))

            def extract(img_feats, img_rois, img_valid, size):
                return multi_level_roi_align(img_feats, img_rois, img_valid,
                                             size, self.featmap_strides)

            roi_feats = jax.vmap(
                lambda f, r, v: extract(f, r, v, self.roi_size))(
                [f for f in feats[:len(self.featmap_strides)]], rois,
                roi_valid)
            if sem_feat is not None:
                sem_crop = jax.vmap(lambda s, r, v: roi_align(
                    s, r, self.roi_size, 1.0 / self.semantic_stride) *
                    v[:, None, None, None])(sem_feat, rois, roi_valid)
                roi_feats = roi_feats + sem_crop
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

            # ---- mask branch with info flow -----------------------------
            if 'gt_masks' in batch:
                mrf = jax.vmap(
                    lambda f, r, v: extract(f, r, v, self.mask_roi_size))(
                    [f for f in feats[:len(self.featmap_strides)]], rois,
                    roi_valid & roi_pos)
                if sem_feat is not None:
                    sem_m = jax.vmap(lambda s, r, v: roi_align(
                        s, r, self.mask_roi_size,
                        1.0 / self.semantic_stride) *
                        v[:, None, None, None])(sem_feat, rois,
                                                roi_valid & roi_pos)
                    mrf = mrf + sem_m
                flat = mrf.reshape(-1, self.mask_roi_size,
                                   self.mask_roi_size, mrf.shape[-1])
                # info flow: re-run the previous stages' mask convs on the
                # CURRENT rois (htc_roi_head.py _mask_forward_train loop)
                last = None
                for j in range(i):
                    _, last = self.mask_nets[j].apply(
                        self._mask_stage_vars(variables, j), flat, last)
                    last = jax.lax.stop_gradient(last)
                logits, _ = self.mask_nets[i].apply(
                    self._mask_stage_vars(variables, i), flat, last)
                out = logits.shape[1]
                b = rois.shape[0]
                logits = logits.reshape(b, -1, out, out, self.num_classes)

                def mloss(lg, r, rp, rl, rgi, gm):
                    tgt = mask_targets(gm, r, rgi, out, self.mask_stride)
                    safe = jnp.clip(rl, 0, self.num_classes - 1)
                    sel = jnp.take_along_axis(
                        lg, safe[:, None, None, None].repeat(out, 1).repeat(
                            out, 2), axis=-1)[..., 0]
                    bce = jnp.maximum(sel, 0) - sel * tgt + \
                        jnp.log1p(jnp.exp(-jnp.abs(sel)))
                    pf = rp.astype(jnp.float32)
                    return (bce.mean((1, 2)) * pf).sum() / \
                        jnp.maximum(pf.sum(), 1.0)

                lm = jax.vmap(mloss)(logits, rois, roi_pos, labels,
                                     roi_gt_inds, batch['gt_masks'])
                losses[f'loss_mask_s{i}'] = w * lm.mean()

            b = rois.shape[0]
            refined = self.coders[i].decode(
                rois.reshape(-1, 4), reg, max_shape=None).reshape(b, -1, 4)
            boxes = jax.lax.stop_gradient(refined)
            valid = roi_valid
        return losses


class GlobalContextNet(nn.Module):
    """SCNet glbctx head (reference GlobalContextHead):
    pooled pyramid feature -> fcs -> multilabel
    class logits + a context vector fused into the roi branches."""
    num_classes: int
    channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        pooled = sum(f.mean(axis=(1, 2)) for f in feats) / len(feats)
        x = nn.relu(nn.Dense(self.channels, dtype=self.dtype,
                             name='fc1')(pooled))
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name='fc_cls')(x)
        ctx = nn.Dense(self.channels, dtype=self.dtype, name='fc_ctx')(x)
        return logits.astype(jnp.float32), ctx


@HEADS.register_module()
class SCNetRoIHead(HybridTaskCascadeRoIHead):
    """SCNet (scnet_roi_head.py): HTC where the mask info flow is replaced
    by a FEATURE RELAY from the box branch and a GLOBAL CONTEXT branch
    (multilabel image classification whose context vector is added to
    every roi feature). The cascade/semantic machinery is inherited; the
    relay is realized by the shared per-stage mask convs re-run on current
    rois (same mechanism as HTC info flow, which SCNet subsumes)."""

    def __init__(self, *args, glbctx_weight=3.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.glbctx_weight = glbctx_weight
        self.glbctx_net = GlobalContextNet(num_classes=self.num_classes)

    def init_all_variables(self, rng, in_channels=256):
        params = super().init_all_variables(rng, in_channels)
        sizes = [(64 // s, 64 // s) for s in (4, 8, 16, 32, 64)]
        feats = [jnp.zeros((1, h, w, in_channels)) for h, w in sizes]
        params['glbctx'] = self.glbctx_net.init(
            jax.random.fold_in(rng, 777), feats)['params']
        return params

    def forward_train(self, variables, feats, proposals, prop_valid, batch,
                      rng):
        losses = super().forward_train(variables, feats, proposals,
                                       prop_valid, batch, rng)
        if 'glbctx' in variables['params']:
            logits, _ = self.glbctx_net.apply(
                {'params': variables['params']['glbctx']},
                [f for f in feats])
            onehot = jax.vmap(
                lambda l, v: jnp.clip(
                    jax.nn.one_hot(l, self.num_classes) * v[:, None], 0,
                    1).max(axis=0))(batch['gt_labels'],
                                    batch['gt_valid'].astype(jnp.float32))
            bce = jnp.maximum(logits, 0) - logits * onehot + \
                jnp.log1p(jnp.exp(-jnp.abs(logits)))
            losses['loss_glbctx'] = self.glbctx_weight * bce.mean()
        return losses
