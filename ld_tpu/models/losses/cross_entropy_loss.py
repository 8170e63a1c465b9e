"""Cross-entropy / BCE losses.

Parity: /root/reference/mmdet/models/losses/cross_entropy_loss.py:142.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ld_tpu.utils.registry import LOSSES
from .utils import weight_reduce_loss


def cross_entropy(pred, label, weight=None, reduction='mean',
                  avg_factor=None, class_weight=None):
    logp = jax.nn.log_softmax(pred, axis=-1)
    loss = -jnp.take_along_axis(logp, label[..., None].astype(jnp.int32),
                                axis=-1)[..., 0]
    if class_weight is not None:
        loss = loss * jnp.asarray(class_weight)[label]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def binary_cross_entropy(pred, label, weight=None, reduction='mean',
                         avg_factor=None, class_weight=None):
    if label.ndim == pred.ndim - 1:
        label = jax.nn.one_hot(label, pred.shape[-1], dtype=pred.dtype)
    loss = jnp.maximum(pred, 0) - pred * label + jnp.log1p(
        jnp.exp(-jnp.abs(pred)))
    if class_weight is not None:
        loss = loss * jnp.asarray(class_weight)
    # element-wise weights (e.g. SABL bucket-cls ignore masks) apply before
    # the per-row class sum; per-row weights after (mmdet expands them)
    if weight is not None and weight.ndim == loss.ndim and loss.ndim > 1:
        loss = loss * weight
        weight = None
    loss = loss.sum(axis=-1) if loss.ndim > 1 else loss
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class CrossEntropyLoss:
    def __init__(self, use_sigmoid=False, use_mask=False, reduction='mean',
                 class_weight=None, loss_weight=1.0):
        assert not use_mask, 'mask CE is part of the mask-head path (later)'
        self.use_sigmoid = use_sigmoid
        self.reduction = reduction
        self.class_weight = class_weight
        self.loss_weight = loss_weight

    def __call__(self, cls_score, label, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        fn = binary_cross_entropy if self.use_sigmoid else cross_entropy
        return self.loss_weight * fn(
            cls_score, label, weight, reduction=reduction,
            avg_factor=avg_factor, class_weight=self.class_weight)
