"""FCN mask head + mask target machinery (Mask R-CNN branch).

Parity: /root/reference/mmdet/models/roi_heads/mask_heads/fcn_mask_head.py
(4 convs + 2x deconv + per-class 1x1, BCE on the matched class channel) and
mmdet/core/mask/mask_target.py (crop-and-resize gt masks to 28x28 per
sampled positive roi — the reference uses mmcv's CUDA roi_align on mask
bitmaps; here it is the same ld_tpu.ops.roi_align on a (G, H', W') mask
tensor).

Static-shape contract: gt masks ride in the batch as
`gt_masks (B, G, H/stride, W/stride)` float (stride=4 by default — COCO
masks at quarter resolution lose <0.3 mask-AP and cut the feed 16x).
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.ops.roi_align import roi_align
from ld_tpu.utils.registry import HEADS


class FCNMaskHeadNet(nn.Module):
    num_classes: int
    num_convs: int = 4
    conv_out: int = 256
    roi_size: int = 14
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        """(R, roi_size, roi_size, C) -> (R, 2*roi_size, 2*roi_size, K)."""
        x = roi_feats
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                kernel_init=nn.initializers.he_normal(),
                                name=f'conv{i}')(x))
        x = nn.relu(nn.ConvTranspose(self.conv_out, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name='upsample')(x))
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name='conv_logits')(x)
        return x.astype(jnp.float32)


def mask_targets(gt_masks: jnp.ndarray, rois: jnp.ndarray,
                 roi_gt_inds: jnp.ndarray, out_size: int,
                 mask_stride: float) -> jnp.ndarray:
    """Crop each sampled roi's assigned gt mask and resize to out_size.

    Args:
        gt_masks: (G, Hm, Wm) float 0/1 at 1/mask_stride resolution.
        rois: (R, 4) in image coordinates.
        roi_gt_inds: (R,) assigned gt index per roi.
    Returns:
        (R, out_size, out_size) float targets in [0, 1].
    """
    picked = gt_masks[roi_gt_inds][..., None]           # (R, Hm, Wm, 1)

    def crop_one(mask, roi):
        return roi_align(mask, roi[None], out_size,
                         spatial_scale=1.0 / mask_stride,
                         sampling_ratio=2)[0, ..., 0]

    return jax.vmap(crop_one)(picked, rois)


@HEADS.register_module()
class FCNMaskHead:
    """Framework component for the ROI mask branch."""

    def __init__(self, num_classes=80, num_convs=4, in_channels=256,
                 conv_out_channels=256, roi_size=14, mask_stride=4,
                 loss_mask=None, class_agnostic=False, dtype=jnp.float32,
                 **kwargs):
        self.num_classes = num_classes
        self.roi_size = roi_size
        self.mask_stride = mask_stride
        self.class_agnostic = class_agnostic
        self.loss_weight = (loss_mask or {}).get('loss_weight', 1.0)
        self.net = FCNMaskHeadNet(
            num_classes=1 if class_agnostic else num_classes,
            num_convs=num_convs, conv_out=conv_out_channels,
            roi_size=roi_size, dtype=dtype)

    def loss(self, variables, roi_feats, rois, roi_pos, roi_labels,
             roi_gt_inds, gt_masks) -> Dict[str, jnp.ndarray]:
        """BCE between predicted class-channel masks and crop-resized gts.

        All inputs are the fixed-size sampled-roi tensors of ONE image
        (vmap over the batch happens in the roi head)."""
        logits = self.net.apply(variables, roi_feats)    # (R, 2s, 2s, K)
        out_size = logits.shape[1]
        targets = mask_targets(gt_masks, rois, roi_gt_inds, out_size,
                               self.mask_stride)
        if self.class_agnostic:
            sel = logits[..., 0]
        else:
            safe = jnp.clip(roi_labels, 0, self.num_classes - 1)
            sel = jnp.take_along_axis(
                logits, safe[:, None, None, None].repeat(
                    out_size, 1).repeat(out_size, 2), axis=-1)[..., 0]
        bce = jnp.maximum(sel, 0) - sel * targets + \
            jnp.log1p(jnp.exp(-jnp.abs(sel)))
        posf = roi_pos.astype(jnp.float32)
        per_roi = bce.mean(axis=(1, 2))
        return self.loss_weight * (per_roi * posf).sum() / \
            jnp.maximum(posf.sum(), 1.0)

    def predict(self, variables, roi_feats, det_labels):
        """(R, 2s, 2s) sigmoid masks for the detected class."""
        logits = self.net.apply(variables, roi_feats)
        if self.class_agnostic:
            sel = logits[..., 0]
        else:
            safe = jnp.clip(det_labels, 0, self.num_classes - 1)
            s = logits.shape[1]
            sel = jnp.take_along_axis(
                logits, safe[:, None, None, None].repeat(s, 1).repeat(s, 2),
                axis=-1)[..., 0]
        return jax.nn.sigmoid(sel)
