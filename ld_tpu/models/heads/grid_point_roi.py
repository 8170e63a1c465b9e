"""Grid R-CNN and PointRend ROI heads.

Parity targets:
  * GridRoIHead (/root/reference/mmdet/models/roi_heads/grid_roi_head.py +
    mask_heads/grid_head.py): the box regression branch is replaced at
    inference by a GRID head — 8 convs + 2 deconvs over 14x14 roi features
    predicting 9 point heatmaps at 56x56; training puts a small gaussian
    cross at each grid point's sub-pixel location inside the (whiskered)
    roi, CE loss over the heatmap; at test the argmax of the 4 border
    points rebuilds the box edges. (The reference's second-order point
    fusion between neighbouring points is folded into the conv stack.)
  * PointRendRoIHead (point_rend_roi_head.py + mask_point_head.py): a
    coarse 7x7 mask is refined by an MLP evaluated at the K most UNCERTAIN
    points (|logit| smallest), each point fed with bilinear fine features
    ++ coarse logits; BCE at the sampled points. Inference runs one
    subdivision pass at the same uncertainty-ranked points.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.ops.roi_align import multi_level_roi_align
from ld_tpu.utils.registry import HEADS
from .mask_head import mask_targets
from .roi_head import StandardRoIHead

EPS = 1e-6


def _whiskered(boxes, whisker):
    """Expand boxes about their centers by (1 + 2*whisker)."""
    cx = (boxes[:, 0] + boxes[:, 2]) / 2
    cy = (boxes[:, 1] + boxes[:, 3]) / 2
    hw = (boxes[:, 2] - boxes[:, 0]) * (0.5 + whisker)
    hh = (boxes[:, 3] - boxes[:, 1]) * (0.5 + whisker)
    return jnp.stack([cx - hw, cy - hh, cx + hw, cy + hh], -1)


class GridHeadNet(nn.Module):
    grid_points: int = 9
    conv_out: int = 64
    num_convs: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_out, (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f'conv{i}')(x)
            x = nn.GroupNorm(num_groups=min(32, self.conv_out),
                             epsilon=1e-5, name=f'gn{i}')(x)
            x = nn.relu(x)
        x = nn.relu(nn.ConvTranspose(self.conv_out, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name='deconv1')(x))
        x = nn.ConvTranspose(self.grid_points, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name='deconv2')(x)
        return x.astype(jnp.float32)          # (R, 4s, 4s, 9)


@HEADS.register_module()
class GridRoIHead(StandardRoIHead):

    def __init__(self, grid_roi_extractor=None, grid_head=None, **kwargs):
        super().__init__(**kwargs)
        gh = dict(grid_head or {})
        self.grid_points = gh.get('grid_points', 9)
        gext = dict(grid_roi_extractor or {})
        self.grid_roi_size = gext.get('roi_layer', {}).get('output_size', 14)
        # GRoIE grid extractor (configs/groie/grid_rcnn_..._groie)
        self.grid_groie = None
        if gext.get('type') == 'GenericRoIExtractor':
            from .roi_head import GroIENet
            self.grid_groie = GroIENet(
                aggregation=gext.get('aggregation', 'sum'),
                pre_cfg=gext.get('pre_cfg'), post_cfg=gext.get('post_cfg'))
        # grid rois are whisker-expanded so border points fall inside the
        # extraction window (grid_roi_head.py); 0.25 -> 1.5x extent
        self.whisker = gh.get('whisker', 0.25)
        self.grid_net = GridHeadNet(
            grid_points=self.grid_points,
            conv_out=gh.get('conv_out_channels', 64),
            num_convs=gh.get('num_convs', 8))

    def init_all_variables(self, rng, in_channels=256):
        r1, r2, r3 = jax.random.split(rng, 3)
        params = super().init_all_variables(r1, in_channels)
        params['grid'] = self.grid_net.init(
            r2, jnp.zeros((1, self.grid_roi_size, self.grid_roi_size,
                           in_channels)))['params']
        if self.grid_groie is not None:
            gz = [jnp.zeros((1, self.grid_roi_size, self.grid_roi_size,
                             in_channels))] * len(self.featmap_strides)
            params['groie_grid'] = self.grid_groie.init(r3, gz)['params']
        return params

    def _extract_grid(self, variables, img_feats, rois, valid):
        if self.grid_groie is None:
            return multi_level_roi_align(img_feats, rois, valid,
                                         self.grid_roi_size,
                                         self.featmap_strides)
        from ld_tpu.ops.roi_align import roi_align
        lvl = [roi_align(img_feats[l], rois, self.grid_roi_size, 1.0 / s)
               for l, s in enumerate(self.featmap_strides)]
        out = self.grid_groie.apply(
            {'params': variables['params']['groie_grid']}, lvl)
        return out * valid[:, None, None, None]

    def forward_train(self, variables, feats, proposals, prop_valid, batch,
                      rng) -> Dict[str, jnp.ndarray]:
        losses = super().forward_train(variables, feats, proposals,
                                       prop_valid, batch, rng)
        if 'grid' not in variables['params']:
            return losses
        b = proposals.shape[0]
        rngs = jax.random.split(rng, b)
        (rois, roi_valid, roi_pos, labels, _, roi_gt_inds, _w) = jax.vmap(
            self.sample_rois)(proposals, prop_valid, batch['gt_bboxes'],
                              batch['gt_labels'], batch['gt_valid'], rngs)
        gvars = {'params': variables['params']['grid']}
        n_side = int(self.grid_points ** 0.5)

        def single(img_feats, r, rv, rp, rgi, gtb):
            r = _whiskered(r, self.whisker)
            gf = self._extract_grid(variables, img_feats, r, rv & rp)
            heat = self.grid_net.apply(gvars, gf)     # (R, S, S, 9)
            s = heat.shape[1]
            tgt_box = gtb[rgi]
            # grid point targets in roi-normalized coords
            rx1, ry1 = r[:, 0], r[:, 1]
            rw = jnp.maximum(r[:, 2] - r[:, 0], EPS)
            rh = jnp.maximum(r[:, 3] - r[:, 1], EPS)
            fr = jnp.linspace(0.0, 1.0, n_side)
            gx = tgt_box[:, 0:1] + fr[None, :] * (
                tgt_box[:, 2:3] - tgt_box[:, 0:1])    # (R, n)
            gy = tgt_box[:, 1:2] + fr[None, :] * (
                tgt_box[:, 3:4] - tgt_box[:, 1:2])
            # points ordered row-major (gy_i, gx_j) matching 9 channels
            px = jnp.tile(gx, (1, n_side))
            py = jnp.repeat(gy, n_side, axis=1)
            u = (px - rx1[:, None]) / rw[:, None] * s
            v = (py - ry1[:, None]) / rh[:, None] * s
            xs = jnp.arange(s, dtype=jnp.float32)
            gaussx = jnp.exp(-((xs[None, None, :] - u[:, :, None])**2) / 2)
            gaussy = jnp.exp(-((xs[None, None, :] - v[:, :, None])**2) / 2)
            tgt = gaussy[:, :, :, None] * gaussx[:, :, None, :]
            inside = ((u >= 0) & (u < s) & (v >= 0) & (v < s)).astype(
                jnp.float32)                          # (R, 9)
            heat_t = heat.transpose(0, 3, 1, 2)       # (R, 9, S, S)
            bce = jnp.maximum(heat_t, 0) - heat_t * tgt + \
                jnp.log1p(jnp.exp(-jnp.abs(heat_t)))
            posf = rp.astype(jnp.float32)
            per = (bce.mean((2, 3)) * inside).sum(1) / \
                jnp.maximum(inside.sum(1), 1.0)
            return (per * posf).sum(), posf.sum()

        l, n = jax.vmap(single)(
            [f for f in feats[:len(self.featmap_strides)]], rois, roi_valid,
            roi_pos, roi_gt_inds, batch['gt_bboxes'])
        losses['loss_grid'] = 15.0 * l.sum() / jnp.maximum(n.sum(), 1.0)
        return losses

    def simple_test(self, variables, feats, proposals, prop_valid, img_hw,
                    scale_factor=None, rescale=False, cfg=None,
                    with_masks=None):
        """Grid R-CNN test: the detected boxes are REBUILT from the grid
        head's point heatmaps (confidence-weighted mean of the border
        points per edge, grid_roi_head.py simple_test)."""
        dets, det_labels, valid = super().simple_test(
            variables, feats, proposals, prop_valid, img_hw,
            scale_factor=None, rescale=False, cfg=cfg, with_masks=False)
        if 'grid' not in variables['params']:
            return dets, det_labels, valid
        gvars = {'params': variables['params']['grid']}
        n_side = int(self.grid_points ** 0.5)

        def per_image(img_feats, img_dets, sf):
            raw = img_dets[:, :4]
            ok = img_dets[:, 4] > 0
            boxes = _whiskered(raw, self.whisker)
            gf = self._extract_grid(variables, img_feats, boxes, ok)
            heat = jax.nn.sigmoid(self.grid_net.apply(gvars, gf))
            k, s = heat.shape[0], heat.shape[1]
            flat = heat.transpose(0, 3, 1, 2).reshape(k, self.grid_points,
                                                      s * s)
            conf = flat.max(-1)                        # (K, 9)
            idx = flat.argmax(-1)
            px = (idx % s).astype(jnp.float32) + 0.5
            py = (idx // s).astype(jnp.float32) + 0.5
            rw = jnp.maximum(boxes[:, 2] - boxes[:, 0], EPS)
            rh = jnp.maximum(boxes[:, 3] - boxes[:, 1], EPS)
            x = boxes[:, 0:1] + px / s * rw[:, None]   # (K, 9)
            y = boxes[:, 1:2] + py / s * rh[:, None]
            col = jnp.arange(self.grid_points) % n_side
            row = jnp.arange(self.grid_points) // n_side

            def edge(vals, member):
                w = conf * member[None, :]
                return (vals * w).sum(-1) / jnp.maximum(w.sum(-1), EPS)

            x1 = edge(x, (col == 0).astype(jnp.float32))
            x2 = edge(x, (col == n_side - 1).astype(jnp.float32))
            y1 = edge(y, (row == 0).astype(jnp.float32))
            y2 = edge(y, (row == n_side - 1).astype(jnp.float32))
            refined = jnp.stack([x1, y1, x2, y2], -1)
            refined = jnp.where(ok[:, None], refined, raw)
            if rescale and sf is not None:
                refined = refined / sf[None, :]
            return jnp.concatenate([refined, img_dets[:, 4:5]], -1)

        if scale_factor is None:
            scale_factor = jnp.ones((proposals.shape[0], 4))
        dets = jax.vmap(per_image)(
            [f for f in feats[:len(self.featmap_strides)]], dets,
            scale_factor)
        return dets, det_labels, valid


class MaskPointHeadNet(nn.Module):
    """3-layer MLP over (fine feature ++ coarse logit) per point."""
    num_classes: int
    fc_dim: int = 256
    num_fcs: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point_feats, coarse_logits):
        x = jnp.concatenate([point_feats, coarse_logits], axis=-1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Conv(self.fc_dim, (1,), dtype=self.dtype,
                                name=f'fc{i}')(x))
            x = jnp.concatenate([x, coarse_logits], axis=-1)
        return nn.Conv(self.num_classes, (1,), dtype=self.dtype,
                       name='logits')(x).astype(jnp.float32)


def _bilinear_points(fmap, u, v):
    """fmap (H, W, C); u, v (P,) in pixel coords -> (P, C)."""
    h, w, c = fmap.shape
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0

    def g(vi, ui):
        vi = jnp.clip(vi, 0, h - 1).astype(jnp.int32)
        ui = jnp.clip(ui, 0, w - 1).astype(jnp.int32)
        return fmap[vi, ui]

    return (g(v0, u0) * ((1 - dv) * (1 - du))[:, None] +
            g(v0, u0 + 1) * ((1 - dv) * du)[:, None] +
            g(v0 + 1, u0) * (dv * (1 - du))[:, None] +
            g(v0 + 1, u0 + 1) * (dv * du)[:, None])


@HEADS.register_module()
class PointRendRoIHead(StandardRoIHead):

    def __init__(self, point_head=None, num_points=196,
                 oversample_ratio=3, importance_sample_ratio=0.75,
                 **kwargs):
        kwargs.setdefault('mask_head', dict(num_convs=4))
        super().__init__(**kwargs)
        ph = dict(point_head or {})
        self.num_points = ph.get('num_points', num_points)
        self.point_net = MaskPointHeadNet(
            num_classes=self.num_classes,
            fc_dim=ph.get('fc_channels', 256),
            num_fcs=ph.get('num_fcs', 3))

    def init_all_variables(self, rng, in_channels=256):
        r1, r2, r3 = jax.random.split(rng, 3)
        params = dict(bbox=self.net.init(
            r1, jnp.zeros((1, self.roi_size, self.roi_size,
                           in_channels)))['params'])
        params['mask'] = self.mask_head.net.init(
            r2, jnp.zeros((1, self.mask_roi_size, self.mask_roi_size,
                           in_channels)))['params']
        params['point'] = self.point_net.init(
            r3, jnp.zeros((1, self.num_points, in_channels)),
            jnp.zeros((1, self.num_points, 1)))['params']
        return params

    def forward_train(self, variables, feats, proposals, prop_valid, batch,
                      rng) -> Dict[str, jnp.ndarray]:
        losses = super().forward_train(variables, feats, proposals,
                                       prop_valid, batch, rng)
        if 'point' not in variables['params'] or 'gt_masks' not in batch:
            return losses
        b = proposals.shape[0]
        rngs = jax.random.split(rng, b)
        (rois, roi_valid, roi_pos, labels, _, roi_gt_inds, _w) = jax.vmap(
            self.sample_rois)(proposals, prop_valid, batch['gt_bboxes'],
                              batch['gt_labels'], batch['gt_valid'], rngs)
        mask_vars = self._mask_vars(variables)
        pvars = {'params': variables['params']['point']}
        k = self.num_points

        def single(img_feats, r, rv, rp, rl, rgi, gm):
            mf = multi_level_roi_align(img_feats, r, rv & rp,
                                       self.mask_roi_size,
                                       self.featmap_strides)
            coarse = self.mask_head.net.apply(mask_vars, mf)
            out = coarse.shape[1]
            safe = jnp.clip(rl, 0, self.num_classes - 1)
            sel = jnp.take_along_axis(
                coarse, safe[:, None, None, None].repeat(out, 1).repeat(
                    out, 2), axis=-1)[..., 0]            # (R, 2s, 2s)
            # uncertainty = -|logit|; pick K most uncertain grid points
            flat = sel.reshape(sel.shape[0], -1)
            _, idx = jax.lax.top_k(-jnp.abs(flat), k)    # (R, K)
            pu = (idx % out).astype(jnp.float32) + 0.5
            pv = (idx // out).astype(jnp.float32) + 0.5
            # fine features at those points (from the same roi features)
            fine = jax.vmap(lambda m, uu, vv: _bilinear_points(
                m, uu / out * m.shape[1], vv / out * m.shape[0]))(
                mf, pu, pv)                              # (R, K, C)
            coarse_pt = jnp.take_along_axis(flat, idx, 1)[..., None]
            refined = self.point_net.apply(pvars, fine, coarse_pt)
            ref_sel = jnp.take_along_axis(
                refined, safe[:, None, None].repeat(k, 1), axis=-1)[..., 0]
            tgt = mask_targets(gm, r, rgi, out, self.mask_head.mask_stride)
            tgt_pt = jnp.take_along_axis(tgt.reshape(tgt.shape[0], -1),
                                         idx, 1)
            bce = jnp.maximum(ref_sel, 0) - ref_sel * tgt_pt + \
                jnp.log1p(jnp.exp(-jnp.abs(ref_sel)))
            posf = rp.astype(jnp.float32)
            return (bce.mean(1) * posf).sum(), posf.sum()

        l, n = jax.vmap(single)(
            [f for f in feats[:len(self.featmap_strides)]], rois, roi_valid,
            roi_pos, labels, roi_gt_inds, batch['gt_masks'])
        losses['loss_point'] = l.sum() / jnp.maximum(n.sum(), 1.0)
        return losses
