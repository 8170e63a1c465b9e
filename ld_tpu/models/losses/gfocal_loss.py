"""Quality Focal Loss and Distribution Focal Loss (GFocal, arXiv:2006.04388).

Behavioural parity with /root/reference/mmdet/models/losses/gfocal_loss.py:9,54
re-expressed mask-based (no `nonzero` gathers) so the whole loss is a dense
static-shape computation that XLA fuses into a handful of VPU ops:

  QFL(x) = sum_c BCE(x_c, q_c) * |q_c - sigmoid(x_c)|^beta
  where q_c = IoU-quality for the assigned class of positives, 0 elsewhere.

  DFL(x) = -( (y_r - y) * log p_{y_l} + (y - y_l) * log p_{y_r} )
  with y_l = floor(y), y_r = y_l + 1 over the discretized distance bins.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ld_tpu.utils.registry import LOSSES
from .utils import weighted_loss, weight_reduce_loss


def _bce_with_logits(pred, target):
    # numerically-stable binary cross entropy on logits
    return jnp.maximum(pred, 0) - pred * target + jnp.log1p(
        jnp.exp(-jnp.abs(pred)))


def _bce_on_probs(pred, target, eps=1e-12):
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -(target * jnp.log(p) + (1.0 - target) * jnp.log1p(-p))


@weighted_loss
def quality_focal_loss(pred: jnp.ndarray, target, beta: float = 2.0,
                       use_sigmoid: bool = True):
    """Element-wise QFL.

    Args:
        pred: (N, C) joint cls-quality logits (use_sigmoid=True, GFLV1) or
            probabilities (use_sigmoid=False, GFLV2 — the DGQP head outputs
            sigmoid(cls)*quality directly).
        target: tuple (label (N,) int with background == C, score (N,) float).
    Returns:
        (N,) per-anchor loss (summed over classes).
    """
    label, score = target
    num_classes = pred.shape[-1]
    if use_sigmoid:
        bce = _bce_with_logits
        pred_sigmoid = jax.nn.sigmoid(pred)
    else:
        bce = _bce_on_probs
        pred_sigmoid = pred

    # all positions start as negatives: target quality 0
    loss = bce(pred, jnp.zeros_like(pred)) * pred_sigmoid**beta

    # positives: the assigned class channel is supervised by the IoU score
    pos = (label >= 0) & (label < num_classes)
    safe_label = jnp.where(pos, label, 0)
    onehot = jax.nn.one_hot(safe_label, num_classes, dtype=pred.dtype)
    onehot = onehot * pos[..., None].astype(pred.dtype)
    score_b = score[..., None]
    pos_loss = bce(pred, score_b) * jnp.abs(score_b - pred_sigmoid)**beta
    loss = loss * (1.0 - onehot) + pos_loss * onehot
    return loss.sum(axis=-1)


@weighted_loss
def distribution_focal_loss(pred: jnp.ndarray, label: jnp.ndarray):
    """Element-wise DFL.

    Args:
        pred: (N, reg_max+1) distribution logits for one box side.
        label: (N,) continuous target in [0, reg_max).
    Returns:
        (N,) loss.
    """
    n_bins = pred.shape[-1]
    dis_left = jnp.clip(label.astype(jnp.int32), 0, n_bins - 2)
    dis_right = dis_left + 1
    weight_left = dis_right.astype(label.dtype) - label
    weight_right = label - dis_left.astype(label.dtype)
    logp = jax.nn.log_softmax(pred, axis=-1)
    ce_left = -jnp.take_along_axis(logp, dis_left[..., None], axis=-1)[..., 0]
    ce_right = -jnp.take_along_axis(logp, dis_right[..., None], axis=-1)[..., 0]
    return ce_left * weight_left + ce_right * weight_right


@LOSSES.register_module()
class QualityFocalLoss:
    def __init__(self, use_sigmoid=True, beta=2.0, reduction='mean',
                 loss_weight=1.0, activated=False):
        # `activated`: inputs are probabilities (TOOD's aligned scores);
        # the TOOD head computes its activated-form QFL inline.
        self.activated = activated
        self.use_sigmoid = use_sigmoid
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * quality_focal_loss(
            pred, target, weight, beta=self.beta,
            use_sigmoid=self.use_sigmoid, reduction=reduction,
            avg_factor=avg_factor)


@LOSSES.register_module()
class DistributionFocalLoss:
    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * distribution_focal_loss(
            pred, target, weight, reduction=reduction, avg_factor=avg_factor)
