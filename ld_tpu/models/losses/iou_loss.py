"""IoU-family regression losses (IoU / GIoU / DIoU / CIoU).

Parity: /root/reference/mmdet/models/losses/iou_loss.py:223,292,326,364,402.
The GFL/LD configs use GIoULoss (students) and CIoULoss (teacher r50 config).
"""
from __future__ import annotations

import jax.numpy as jnp

from ld_tpu.ops.boxes import bbox_overlaps
from ld_tpu.utils.registry import LOSSES
from .utils import weighted_loss


@weighted_loss
def iou_loss(pred, target, linear=False, eps=1e-6):
    ious = jnp.clip(bbox_overlaps(pred, target, is_aligned=True), eps)
    return 1 - ious if linear else -jnp.log(ious)


@weighted_loss
def giou_loss(pred, target, eps=1e-7):
    return 1 - bbox_overlaps(pred, target, mode='giou', is_aligned=True,
                             eps=eps)


@weighted_loss
def diou_loss(pred, target, eps=1e-7):
    return 1 - bbox_overlaps(pred, target, mode='diou', is_aligned=True,
                             eps=eps)


@weighted_loss
def ciou_loss(pred, target, eps=1e-7):
    return 1 - bbox_overlaps(pred, target, mode='ciou', is_aligned=True,
                             eps=eps)


class _IoUFamilyLoss:
    _fn = None
    _kwargs = {}

    def __init__(self, eps=1e-6, reduction='mean', loss_weight=1.0, **kwargs):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.extra = kwargs

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        if weight is not None and weight.ndim > 1:
            # (N, 4) box weights -> per-box scalar (all 4 components equal)
            weight = weight.mean(axis=-1)
        return self.loss_weight * type(self)._fn(
            pred, target, weight, eps=self.eps, reduction=reduction,
            avg_factor=avg_factor, **self.extra)


@LOSSES.register_module()
class IoULoss(_IoUFamilyLoss):
    _fn = staticmethod(iou_loss)

    def __init__(self, linear=False, **kwargs):
        super().__init__(linear=linear, **kwargs)


@LOSSES.register_module()
class GIoULoss(_IoUFamilyLoss):
    _fn = staticmethod(giou_loss)


@LOSSES.register_module()
class DIoULoss(_IoUFamilyLoss):
    _fn = staticmethod(diou_loss)


@LOSSES.register_module()
class CIoULoss(_IoUFamilyLoss):
    _fn = staticmethod(ciou_loss)
