"""CentripetalNet head — corner pairs matched by centripetal shifts.

Parity: /root/reference/mmdet/models/dense_heads/centripetal_head.py:11 —
CornerHead minus the embedding branch, plus per-corner GUIDING shifts
(supervise the deformable alignment; log-scaled vector from the corner to
the box center) and CENTRIPETAL shifts (same target, predicted from the
shift-aligned feature); decode pairs a (tl, br) candidate when both
centripetal-shifted corners land near the same center (region test,
`decode_heatmap` with `distance_threshold` replaced by the centroid
region). The reference's feature-adaption DCN is reused from ops.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.ops.deform_conv import DeformConv
from ld_tpu.ops.nms import multiclass_nms
from ld_tpu.utils.registry import HEADS
from .corner_head import BiCornerPool, CornerHead
from .gfl_head import _CLS_BIAS_INIT

EPS = 1e-6


class CentripetalHeadNet(nn.Module):
    num_classes: int
    num_feat_levels: int = 2
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
            tl_off = self._branch(tl, 2, f'tl_off{lvl}')
            br_off = self._branch(br, 2, f'br_off{lvl}')
            # guiding shift conditions a deformable alignment whose output
            # predicts the centripetal shift (centripetal_head.py forward)
            tl_guide = self._branch(tl, 2, f'tl_guide{lvl}')
            br_guide = self._branch(br, 2, f'br_guide{lvl}')
            tl_align = nn.relu(DeformConv(
                self.feat_channels, dtype=self.dtype,
                name=f'tl_align{lvl}')(
                    tl, jnp.tile(jax.lax.stop_gradient(tl_guide), (1, 1, 1,
                                                                   9))))
            br_align = nn.relu(DeformConv(
                self.feat_channels, dtype=self.dtype,
                name=f'br_align{lvl}')(
                    br, jnp.tile(jax.lax.stop_gradient(br_guide), (1, 1, 1,
                                                                   9))))
            tl_ctr = self._branch(tl_align, 2, f'tl_ctr{lvl}')
            br_ctr = self._branch(br_align, 2, f'br_ctr{lvl}')
            outs.append((tl_heat, br_heat, tl_off, br_off, tl_guide,
                         br_guide, tl_ctr, br_ctr))
        return outs


@HEADS.register_module()
class CentripetalHead(CornerHead):

    def __init__(self, num_classes=80, in_channels=256, num_feat_levels=2,
                 loss_guiding_shift=None, loss_centripetal_shift=None,
                 **kwargs):
        super().__init__(num_classes=num_classes, in_channels=in_channels,
                         num_feat_levels=num_feat_levels, **kwargs)
        from ld_tpu.utils.registry import LOSSES
        self.loss_guiding = LOSSES.build(loss_guiding_shift or dict(
            type='SmoothL1Loss', beta=1.0, loss_weight=0.05))
        self.loss_centripetal = LOSSES.build(loss_centripetal_shift or dict(
            type='SmoothL1Loss', beta=1.0, loss_weight=1.0))
        self.net = CentripetalHeadNet(
            num_classes=num_classes, num_feat_levels=num_feat_levels)

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        losses = {}
        for lvl, (tl_heat, br_heat, tl_off, br_off, tl_guide, br_guide,
                  tl_ctr, br_ctr) in enumerate(outputs):
            b, h, w, _ = tl_heat.shape
            stride = jnp.asarray(batch['image'].shape[1] / h, jnp.float32)
            (gt_tl, gt_br, gt_tloff, gt_broff, corner_idx) = jax.vmap(
                lambda gb, gl, gv: self._targets_single(gb, gl, gv, h, w,
                                                        stride))(
                batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'])
            n_tl = jnp.maximum((gt_tl == 1.0).sum(), 1.0)
            n_br = jnp.maximum((gt_br == 1.0).sum(), 1.0)
            det = (self.loss_heatmap(jax.nn.sigmoid(tl_heat), gt_tl,
                                     avg_factor=n_tl) +
                   self.loss_heatmap(jax.nn.sigmoid(br_heat), gt_br,
                                     avg_factor=n_br)) / 2
            # shift targets: log(center - corner) in feature coords
            gtb = batch['gt_bboxes'] / stride
            gtv = batch['gt_valid'].astype(jnp.float32)
            ctr_x = (gtb[..., 0] + gtb[..., 2]) / 2
            ctr_y = (gtb[..., 1] + gtb[..., 3]) / 2
            tl_sx = jnp.log(jnp.clip(ctr_x - gtb[..., 0], EPS))
            tl_sy = jnp.log(jnp.clip(ctr_y - gtb[..., 1], EPS))
            br_sx = jnp.log(jnp.clip(gtb[..., 2] - ctr_x, EPS))
            br_sy = jnp.log(jnp.clip(gtb[..., 3] - ctr_y, EPS))

            def gather_pred(pred, idx):
                return jnp.take_along_axis(
                    pred.reshape(b, h * w, 2),
                    idx[..., None].repeat(2, -1), axis=1)

            p_tl_g = gather_pred(tl_guide, corner_idx[..., 0])
            p_br_g = gather_pred(br_guide, corner_idx[..., 1])
            p_tl_c = gather_pred(tl_ctr, corner_idx[..., 0])
            p_br_c = gather_pred(br_ctr, corner_idx[..., 1])
            tl_tgt = jnp.stack([tl_sx, tl_sy], -1)
            br_tgt = jnp.stack([br_sx, br_sy], -1)
            wgt = jnp.repeat(gtv[..., None], 2, -1)
            nrm = jnp.maximum(gtv.sum() * 2, 1.0)
            guide = (self.loss_guiding(p_tl_g, tl_tgt, weight=wgt,
                                       avg_factor=nrm) +
                     self.loss_guiding(p_br_g, br_tgt, weight=wgt,
                                       avg_factor=nrm))
            ctr = (self.loss_centripetal(p_tl_c, tl_tgt, weight=wgt,
                                         avg_factor=nrm) +
                   self.loss_centripetal(p_br_c, br_tgt, weight=wgt,
                                         avg_factor=nrm))
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
            losses[f'guiding_loss.s{lvl}'] = guide
            losses[f'centripetal_loss.s{lvl}'] = ctr
            losses[f'off_loss.s{lvl}'] = off
        return losses

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        cfg = cfg or self.test_cfg
        (tl_heat, br_heat, tl_off, br_off, _, _, tl_ctr,
         br_ctr) = outputs[-1]
        b, h, w, c = tl_heat.shape
        k = cfg.get('corner_topk', 100)

        def local_max(heat):
            m = nn.max_pool(heat, (3, 3), strides=(1, 1),
                            padding=[(1, 1)] * 2)
            return jnp.where(heat == m, heat, 0.0)

        def per_image(tlh, brh, tlo, bro, tlc, brc, hw, sf):
            stride = 4.0   # hourglass stride of the PADDED input
            tlh = local_max(jax.nn.sigmoid(tlh)[None])[0].reshape(-1)
            brh = local_max(jax.nn.sigmoid(brh)[None])[0].reshape(-1)
            tls, tli = jax.lax.top_k(tlh, k)
            brs, bri = jax.lax.top_k(brh, k)
            tl_cls = tli % c
            br_cls = bri % c
            tl_sp = tli // c
            br_sp = bri // c
            tlx = (tl_sp % w) + tlo.reshape(-1, 2)[tl_sp, 0]
            tly = (tl_sp // w) + tlo.reshape(-1, 2)[tl_sp, 1]
            brx = (br_sp % w) + bro.reshape(-1, 2)[br_sp, 0]
            bry = (br_sp // w) + bro.reshape(-1, 2)[br_sp, 1]
            # centripetal-shifted centers
            tcx = tlx + jnp.exp(tlc.reshape(-1, 2)[tl_sp, 0])
            tcy = tly + jnp.exp(tlc.reshape(-1, 2)[tl_sp, 1])
            bcx = brx - jnp.exp(brc.reshape(-1, 2)[br_sp, 0])
            bcy = bry - jnp.exp(brc.reshape(-1, 2)[br_sp, 1])
            bw = jnp.maximum(brx[None, :] - tlx[:, None], EPS)
            bh = jnp.maximum(bry[None, :] - tly[:, None], EPS)
            # both shifted centers must land in the central region
            close = (jnp.abs(tcx[:, None] - bcx[None, :]) < 0.3 * bw) & \
                (jnp.abs(tcy[:, None] - bcy[None, :]) < 0.3 * bh)
            same = tl_cls[:, None] == br_cls[None, :]
            geom = (brx[None, :] >= tlx[:, None]) & \
                (bry[None, :] >= tly[:, None])
            score = jnp.where(same & geom & close,
                              (tls[:, None] + brs[None, :]) / 2, 0.0)
            boxes = jnp.stack([
                jnp.broadcast_to(tlx[:, None], (k, k)) * stride,
                jnp.broadcast_to(tly[:, None], (k, k)) * stride,
                jnp.broadcast_to(brx[None, :], (k, k)) * stride,
                jnp.broadcast_to(bry[None, :], (k, k)) * stride],
                -1).reshape(-1, 4)
            score = score.reshape(-1)
            cls = jnp.broadcast_to(tl_cls[:, None], (k, k)).reshape(-1)
            sc_full = jax.nn.one_hot(cls, self.num_classes) * score[:, None]
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            return multiclass_nms(
                boxes, sc_full, cfg.get('score_thr', 0.05),
                cfg.get('nms', {}).get('iou_threshold', 0.5),
                max_per_img=cfg.get('max_per_img', 100),
                nms_cfg=cfg.get('nms', {}))

        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)(tl_heat, br_heat, tl_off, br_off,
                                   tl_ctr, br_ctr, img_hw, scale_factor)


from .classic_heads import FCOSHead  # noqa: E402


@HEADS.register_module()
class NASFCOSHead(FCOSHead):
    """NAS-FCOS head (nasfcos_head.py): identical losses/assignment to
    FCOSHead; the reference swaps the last tower conv for a DCN found by
    the architecture search. The searched wiring lives in the NAS-FCOS
    neck; the plain tower here keeps config-name compatibility."""
    pass
