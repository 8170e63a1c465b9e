"""Sigmoid focal loss.

Parity: /root/reference/mmdet/models/losses/focal_loss.py:11 (the python
fallback; the CUDA kernel computes the same math). On TPU this is a handful
of fused VPU ops — no custom kernel needed (SURVEY.md §2.4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ld_tpu.utils.registry import LOSSES
from .utils import weight_reduce_loss


def _bce_with_logits(pred, target):
    return jnp.maximum(pred, 0) - pred * target + jnp.log1p(
        jnp.exp(-jnp.abs(pred)))


def sigmoid_focal_loss(pred, target, weight=None, gamma=2.0, alpha=0.25,
                       reduction='mean', avg_factor=None):
    """Focal loss on (N, C) logits with (N,) int targets (background == C)
    or (N, C) one-hot float targets."""
    num_classes = pred.shape[-1]
    if target.ndim == pred.ndim - 1:
        pos = (target >= 0) & (target < num_classes)
        target = jax.nn.one_hot(jnp.where(pos, target, 0), num_classes,
                                dtype=pred.dtype) * pos[..., None]
    pred_sigmoid = jax.nn.sigmoid(pred)
    pt = (1 - pred_sigmoid) * target + pred_sigmoid * (1 - target)
    focal_weight = (alpha * target + (1 - alpha) * (1 - target)) * pt**gamma
    loss = _bce_with_logits(pred, target) * focal_weight
    if weight is not None and weight.ndim == loss.ndim - 1:
        weight = weight[..., None]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class FocalLoss:
    def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.25,
                 reduction='mean', loss_weight=1.0):
        assert use_sigmoid, 'only sigmoid focal loss is supported'
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * sigmoid_focal_loss(
            pred, target, weight, gamma=self.gamma, alpha=self.alpha,
            reduction=reduction, avg_factor=avg_factor)
