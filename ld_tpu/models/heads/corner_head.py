"""CornerNet head (paired corner heatmaps + associative embeddings).

Parity: /root/reference/mmdet/models/dense_heads/corner_head.py:77 —
BiCornerPool (directional corner pooling, here `lax.cummax` — one fused
scan on TPU instead of the reference's CUDA CornerPool kernel) feeding
per-stack top-left / bottom-right heatmap (GaussianFocal on
gaussian-radius targets, gaussian_target.py:66), 1-channel associative
embeddings (pull to the pair mean / push between objects, ae_loss.py) and
2-channel sub-pixel offsets (SmoothL1 at exact corner pixels only).
Decode (corner_head.py:864): 3x3 local-max filter, top-k corners per type,
all-pairs matching rejected on class mismatch / embedding distance /
geometric inversion; score = mean corner score.
"""
from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.ops.nms import multiclass_nms
from ld_tpu.utils.registry import HEADS, LOSSES
from .gfl_head import _CLS_BIAS_INIT

EPS = 1e-6


def corner_pool(x, direction):
    """Directional corner pooling via cummax (NHWC)."""
    if direction == 'top':        # take max over rows below (h..H)
        return jax.lax.cummax(x, axis=1, reverse=True)
    if direction == 'bottom':
        return jax.lax.cummax(x, axis=1)
    if direction == 'left':
        return jax.lax.cummax(x, axis=2, reverse=True)
    if direction == 'right':
        return jax.lax.cummax(x, axis=2)
    raise ValueError(direction)


def gaussian_radius(h, w, min_overlap=0.3):
    """CornerNet radius (mmdet gaussian_target.py:66), elementwise-safe."""
    a1 = 1.0
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - jnp.sqrt(jnp.maximum(b1**2 - 4 * a1 * c1, 0.0))) / (2 * a1)
    a2 = 4.0
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 - jnp.sqrt(jnp.maximum(b2**2 - 4 * a2 * c2, 0.0))) / (2 * a2)
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0.0))) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


class BiCornerPool(nn.Module):
    directions: Sequence[str]
    feat_channels: int = 128
    out_channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def convbn(y, ch, k, name, act=True):
            y = nn.Conv(ch, (k, k), padding=[(k // 2, k // 2)] * 2,
                        use_bias=False, dtype=self.dtype,
                        name=f'{name}_conv')(y)
            y = nn.GroupNorm(num_groups=min(32, ch), epsilon=1e-5,
                             name=f'{name}_norm')(y)
            return nn.relu(y) if act else y

        d1 = corner_pool(convbn(x, self.feat_channels, 3, 'dir1'),
                         self.directions[0])
        d2 = corner_pool(convbn(x, self.feat_channels, 3, 'dir2'),
                         self.directions[1])
        after = convbn(d1 + d2, self.out_channels, 3, 'aftpool', act=False)
        skip = convbn(x, self.out_channels, 1, 'conv1', act=False)
        return convbn(nn.relu(after + skip), self.out_channels, 3, 'conv2')


class CornerHeadNet(nn.Module):
    num_classes: int
    num_feat_levels: int = 2       # hourglass stacks
    corner_emb_channels: int = 1
    feat_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    def _branch(self, x, out_ch, name, bias_init=0.0):
        y = nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name=f'{name}_feat')(x)
        y = nn.relu(y)
        return nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                       bias_init=nn.initializers.constant(bias_init),
                       name=f'{name}_out')(y).astype(jnp.float32)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        outs = []
        for lvl in range(self.num_feat_levels):
            x = feats[lvl]
            tl = BiCornerPool(('top', 'left'),
                              out_channels=self.feat_channels,
                              dtype=self.dtype, name=f'tl_pool{lvl}')(x)
            br = BiCornerPool(('bottom', 'right'),
                              out_channels=self.feat_channels,
                              dtype=self.dtype, name=f'br_pool{lvl}')(x)
            tl_heat = self._branch(tl, self.num_classes, f'tl_heat{lvl}',
                                   _CLS_BIAS_INIT)
            br_heat = self._branch(br, self.num_classes, f'br_heat{lvl}',
                                   _CLS_BIAS_INIT)
            tl_emb = self._branch(tl, self.corner_emb_channels,
                                  f'tl_emb{lvl}')
            br_emb = self._branch(br, self.corner_emb_channels,
                                  f'br_emb{lvl}')
            tl_off = self._branch(tl, 2, f'tl_off{lvl}')
            br_off = self._branch(br, 2, f'br_off{lvl}')
            outs.append((tl_heat, br_heat, tl_emb, br_emb, tl_off, br_off))
        return outs


@HEADS.register_module()
class CornerHead:

    def __init__(self, num_classes=80, in_channels=256, num_feat_levels=2,
                 corner_emb_channels=1, loss_heatmap=None,
                 loss_embedding=None, loss_offset=None, train_cfg=None,
                 test_cfg=None, dtype=jnp.float32, **kwargs):
        self.num_classes = num_classes
        self.cls_out_channels = num_classes
        self.num_feat_levels = num_feat_levels
        self.loss_heatmap = LOSSES.build(loss_heatmap or dict(
            type='GaussianFocalLoss', alpha=2.0, gamma=4.0, loss_weight=1.0))
        self.pull_weight = (loss_embedding or {}).get('pull_weight', 0.25)
        self.push_weight = (loss_embedding or {}).get('push_weight', 0.25)
        self.loss_offset = LOSSES.build(loss_offset or dict(
            type='SmoothL1Loss', beta=1.0, loss_weight=1.0))
        self.train_cfg = train_cfg or {}
        self.test_cfg = test_cfg or dict(
            corner_topk=100, local_maximum_kernel=3, distance_threshold=0.5,
            score_thr=0.05, nms=dict(iou_threshold=0.5), max_per_img=100)
        self.net = CornerHeadNet(
            num_classes=num_classes, num_feat_levels=num_feat_levels,
            corner_emb_channels=corner_emb_channels, dtype=dtype)

    # ---- targets -----------------------------------------------------------
    def _targets_single(self, gtb, gtl, gtv, h, w, stride):
        """Corner heatmaps/offsets for one image at one resolution."""
        g = gtb.shape[0]
        tlx = gtb[:, 0] / stride
        tly = gtb[:, 1] / stride
        brx = gtb[:, 2] / stride
        bry = gtb[:, 3] / stride
        bh = bry - tly
        bw = brx - tlx
        radius = jnp.maximum(
            gaussian_radius(jnp.ceil(bh), jnp.ceil(bw), 0.3), 0.0)
        sigma = jnp.maximum((2 * radius + 1) / 6.0, EPS)
        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)

        def heat_for(cx, cy):
            # (G, H, W) gaussians
            d2 = ((xs[None, None, :] - jnp.floor(cx)[:, None, None])**2 +
                  (ys[None, :, None] - jnp.floor(cy)[:, None, None])**2)
            return jnp.exp(-d2 / (2 * sigma[:, None, None]**2))

        def scatter_classwise(gauss):
            def step(heat, i):
                cls_mask = jax.nn.one_hot(gtl[i], self.num_classes)
                contrib = gauss[i][:, :, None] * cls_mask[None, None, :] * \
                    gtv[i]
                return jnp.maximum(heat, contrib), None

            heat0 = jnp.zeros((h, w, self.num_classes))
            heat, _ = jax.lax.scan(step, heat0, jnp.arange(g))
            return heat

        tl_heat = scatter_classwise(heat_for(tlx, tly))
        br_heat = scatter_classwise(heat_for(brx, bry))
        # exact corner pixels -> peak 1 + offset targets
        tl_ix = jnp.clip(jnp.floor(tlx).astype(jnp.int32), 0, w - 1)
        tl_iy = jnp.clip(jnp.floor(tly).astype(jnp.int32), 0, h - 1)
        br_ix = jnp.clip(jnp.floor(brx).astype(jnp.int32), 0, w - 1)
        br_iy = jnp.clip(jnp.floor(bry).astype(jnp.int32), 0, h - 1)
        vf = gtv.astype(jnp.float32)
        tl_heat = tl_heat.at[tl_iy, tl_ix, gtl].max(vf)
        br_heat = br_heat.at[br_iy, br_ix, gtl].max(vf)
        off0 = jnp.zeros((h, w, 2))
        tl_off = off0.at[tl_iy, tl_ix, 0].set(tlx - tl_ix, mode='drop') \
                     .at[tl_iy, tl_ix, 1].set(tly - tl_iy, mode='drop')
        br_off = off0.at[br_iy, br_ix, 0].set(brx - br_ix, mode='drop') \
                     .at[br_iy, br_ix, 1].set(bry - br_iy, mode='drop')
        return (tl_heat, br_heat, tl_off, br_off,
                jnp.stack([tl_iy * w + tl_ix, br_iy * w + br_ix], -1))

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        losses = {}
        img_h = batch['img_hw'][0, 0]
        for lvl, (tl_heat, br_heat, tl_emb, br_emb, tl_off,
                  br_off) in enumerate(outputs):
            b, h, w, _ = tl_heat.shape
            stride = jnp.asarray(
                batch['image'].shape[1] / h, jnp.float32)
            (gt_tl, gt_br, gt_tloff, gt_broff, corner_idx) = jax.vmap(
                lambda gb, gl, gv: self._targets_single(gb, gl, gv, h, w,
                                                        stride))(
                batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'])
            n_peak = jnp.maximum((gt_tl == 1.0).sum(), 1.0)
            det = (self.loss_heatmap(jax.nn.sigmoid(tl_heat), gt_tl,
                                     avg_factor=n_peak) +
                   self.loss_heatmap(jax.nn.sigmoid(br_heat), gt_br,
                                     avg_factor=jnp.maximum(
                                         (gt_br == 1.0).sum(), 1.0))) / 2
            # associative embedding
            gtv = batch['gt_valid'].astype(jnp.float32)
            emb_tl = jnp.take_along_axis(
                tl_emb.reshape(b, h * w), corner_idx[..., 0], axis=1)
            emb_br = jnp.take_along_axis(
                br_emb.reshape(b, h * w), corner_idx[..., 1], axis=1)
            mean = (emb_tl + emb_br) / 2
            n_obj = jnp.maximum(gtv.sum(axis=1), 1.0)
            pull = (((emb_tl - mean)**2 + (emb_br - mean)**2) * gtv).sum(1) \
                / n_obj
            diff = jnp.abs(mean[:, :, None] - mean[:, None, :])
            pairm = gtv[:, :, None] * gtv[:, None, :] * \
                (1 - jnp.eye(gtv.shape[1])[None])
            push = (jnp.maximum(1.0 - diff, 0.0) * pairm).sum((1, 2)) / \
                jnp.maximum(n_obj * (n_obj - 1), 1.0)
            # offsets at exact corner pixels
            tl_mask = (gt_tl == 1.0).any(-1, keepdims=True).astype(
                jnp.float32)
            br_mask = (gt_br == 1.0).any(-1, keepdims=True).astype(
                jnp.float32)
            off = (self.loss_offset(
                tl_off, gt_tloff, weight=jnp.repeat(tl_mask, 2, -1),
                avg_factor=jnp.maximum(tl_mask.sum() * 2, 1.0)) +
                self.loss_offset(
                br_off, gt_broff, weight=jnp.repeat(br_mask, 2, -1),
                avg_factor=jnp.maximum(br_mask.sum() * 2, 1.0))) / 2
            losses[f'det_loss.s{lvl}'] = det
            losses[f'pull_loss.s{lvl}'] = self.pull_weight * pull.mean()
            losses[f'push_loss.s{lvl}'] = self.push_weight * push.mean()
            losses[f'off_loss.s{lvl}'] = off
        return losses

    # ---- decode -------------------------------------------------------------
    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        cfg = cfg or self.test_cfg
        tl_heat, br_heat, tl_emb, br_emb, tl_off, br_off = outputs[-1]
        b, h, w, c = tl_heat.shape
        k = cfg.get('corner_topk', 100)
        dist_thr = cfg.get('distance_threshold', 0.5)

        def local_max(heat):
            m = nn.max_pool(heat, (3, 3), strides=(1, 1),
                            padding=[(1, 1)] * 2)
            return jnp.where(heat == m, heat, 0.0)

        def per_image(tlh, brh, tle, bre, tlo, bro, hw, sf):
            # hourglass stem is stride 4 of the PADDED input; hw is the
            # un-padded size, so derive the stride statically
            stride = 4.0
            tlh = local_max(jax.nn.sigmoid(tlh)[None])[0].reshape(-1)
            brh = local_max(jax.nn.sigmoid(brh)[None])[0].reshape(-1)
            tls, tli = jax.lax.top_k(tlh, k)
            brs, bri = jax.lax.top_k(brh, k)
            tl_cls = tli % c
            br_cls = bri % c
            tl_sp = tli // c
            br_sp = bri // c
            tlx = (tl_sp % w).astype(jnp.float32) + \
                tlo.reshape(-1, 2)[tl_sp, 0]
            tly = (tl_sp // w).astype(jnp.float32) + \
                tlo.reshape(-1, 2)[tl_sp, 1]
            brx = (br_sp % w).astype(jnp.float32) + \
                bro.reshape(-1, 2)[br_sp, 0]
            bry = (br_sp // w).astype(jnp.float32) + \
                bro.reshape(-1, 2)[br_sp, 1]
            e_tl = tle.reshape(-1)[tl_sp]
            e_br = bre.reshape(-1)[br_sp]
            # all-pairs validity
            same_cls = tl_cls[:, None] == br_cls[None, :]
            geom = (brx[None, :] >= tlx[:, None]) & \
                (bry[None, :] >= tly[:, None])
            edist = jnp.abs(e_tl[:, None] - e_br[None, :])
            score = (tls[:, None] + brs[None, :]) / 2
            ok = same_cls & geom & (edist < dist_thr)
            score = jnp.where(ok, score, 0.0)
            boxes = jnp.stack([
                jnp.broadcast_to(tlx[:, None], (k, k)) * stride,
                jnp.broadcast_to(tly[:, None], (k, k)) * stride,
                jnp.broadcast_to(brx[None, :], (k, k)) * stride,
                jnp.broadcast_to(bry[None, :], (k, k)) * stride], -1)
            boxes = boxes.reshape(-1, 4)
            score = score.reshape(-1)
            cls = jnp.broadcast_to(tl_cls[:, None], (k, k)).reshape(-1)
            scores_full = jax.nn.one_hot(cls, self.num_classes) * \
                score[:, None]
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            return multiclass_nms(
                boxes, scores_full, cfg.get('score_thr', 0.05),
                cfg.get('nms', {}).get('iou_threshold', 0.5),
                max_per_img=cfg.get('max_per_img', 100),
                nms_cfg=cfg.get('nms', {}))

        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)(tl_heat, br_heat, tl_emb, br_emb,
                                   tl_off, br_off, img_hw, scale_factor)
