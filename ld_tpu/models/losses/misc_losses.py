"""Remaining inherited loss inventory.

Parity targets in /root/reference/mmdet/models/losses/: balanced_l1_loss.py,
varifocal_loss.py, gaussian_focal_loss.py, mse_loss.py, ghm_loss.py (GHM-C),
iou_loss.py:292 (BoundedIoULoss).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ld_tpu.utils.registry import LOSSES
from .utils import weighted_loss, weight_reduce_loss


@weighted_loss
def balanced_l1_loss(pred, target, beta=1.0, alpha=0.5, gamma=1.5):
    diff = jnp.abs(pred - target)
    b = math.e**(gamma / alpha) - 1
    return jnp.where(
        diff < beta,
        alpha / b * (b * diff + 1) * jnp.log(b * diff / beta + 1) -
        alpha * diff,
        gamma * diff + gamma / b - alpha * beta)


@LOSSES.register_module()
class BalancedL1Loss:
    def __init__(self, alpha=0.5, gamma=1.5, beta=1.0, reduction='mean',
                 loss_weight=1.0):
        self.alpha, self.gamma, self.beta = alpha, gamma, beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * balanced_l1_loss(
            pred, target, weight, beta=self.beta, alpha=self.alpha,
            gamma=self.gamma, reduction=reduction, avg_factor=avg_factor)


def _bce_with_logits(pred, target):
    return jnp.maximum(pred, 0) - pred * target + jnp.log1p(
        jnp.exp(-jnp.abs(pred)))


@LOSSES.register_module()
class VarifocalLoss:
    """IoU-aware focal loss (VFNet). Positives weighted by the target
    quality, negatives by alpha * sigmoid^gamma."""

    def __init__(self, use_sigmoid=True, alpha=0.75, gamma=2.0,
                 iou_weighted=True, reduction='mean', loss_weight=1.0):
        assert use_sigmoid
        self.alpha, self.gamma = alpha, gamma
        self.iou_weighted = iou_weighted
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        sig = jax.nn.sigmoid(pred)
        pos = (target > 0).astype(pred.dtype)
        focal = target * pos if self.iou_weighted else pos
        focal = focal + self.alpha * jnp.abs(sig - target)**self.gamma * \
            (1 - pos)
        loss = _bce_with_logits(pred, target) * focal
        loss = loss.sum(-1) if loss.ndim > 1 else loss
        return self.loss_weight * weight_reduce_loss(loss, weight, reduction,
                                                     avg_factor)


@weighted_loss
def gaussian_focal_loss(pred, gaussian_target, alpha=2.0, gamma=4.0,
                        eps=1e-12):
    pos = (gaussian_target == 1).astype(pred.dtype)
    neg_w = (1 - gaussian_target)**gamma
    return -(jnp.log(pred + eps) * (1 - pred)**alpha * pos +
             jnp.log(1 - pred + eps) * pred**alpha * neg_w * (1 - pos))


@LOSSES.register_module()
class GaussianFocalLoss:
    def __init__(self, alpha=2.0, gamma=4.0, reduction='mean',
                 loss_weight=1.0):
        self.alpha, self.gamma = alpha, gamma
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * gaussian_focal_loss(
            pred, target, weight, alpha=self.alpha, gamma=self.gamma,
            reduction=reduction, avg_factor=avg_factor)


@weighted_loss
def mse_loss(pred, target):
    return (pred - target)**2


@LOSSES.register_module()
class MSELoss:
    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * mse_loss(pred, target, weight,
                                           reduction=reduction,
                                           avg_factor=avg_factor)


@weighted_loss
def bounded_iou_loss(pred, target, beta=0.2, eps=1e-3):
    """IoU-bounded regression loss on decoded boxes (Libra R-CNN)."""
    px = (pred[..., 0] + pred[..., 2]) * 0.5
    py = (pred[..., 1] + pred[..., 3]) * 0.5
    pw = pred[..., 2] - pred[..., 0]
    ph = pred[..., 3] - pred[..., 1]
    tx = (target[..., 0] + target[..., 2]) * 0.5
    ty = (target[..., 1] + target[..., 3]) * 0.5
    tw = target[..., 2] - target[..., 0]
    th = target[..., 3] - target[..., 1]
    dx = tx - px
    dy = ty - py
    loss_dx = 1 - jnp.maximum(
        (tw - 2 * jnp.abs(dx)) / (tw + 2 * jnp.abs(dx) + eps), 0)
    loss_dy = 1 - jnp.maximum(
        (th - 2 * jnp.abs(dy)) / (th + 2 * jnp.abs(dy) + eps), 0)
    loss_dw = 1 - jnp.minimum(tw / (pw + eps), pw / (tw + eps))
    loss_dh = 1 - jnp.minimum(th / (ph + eps), ph / (th + eps))
    comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], -1)
    return jnp.where(comb < beta, 0.5 * comb * comb / beta,
                     comb - 0.5 * beta).sum(-1)


@LOSSES.register_module()
class BoundedIoULoss:
    def __init__(self, beta=0.2, eps=1e-3, reduction='mean',
                 loss_weight=1.0):
        self.beta, self.eps = beta, eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        if weight is not None and weight.ndim > 1:
            weight = weight.mean(-1)
        return self.loss_weight * bounded_iou_loss(
            pred, target, weight, beta=self.beta, eps=self.eps,
            reduction=reduction, avg_factor=avg_factor)


@LOSSES.register_module()
class GHMC:
    """Gradient-harmonized classification loss (static-bin formulation;
    the running-momentum variant is stateful and torch-specific)."""

    def __init__(self, bins=10, momentum=0.0, use_sigmoid=True,
                 loss_weight=1.0):
        assert use_sigmoid
        self.bins = bins
        self.loss_weight = loss_weight
        self.edges = jnp.linspace(0, 1, bins + 1).at[-1].set(1 + 1e-6)

    def __call__(self, pred, target, label_weight=None, avg_factor=None,
                 **kwargs):
        if target.ndim == pred.ndim - 1:
            num_classes = pred.shape[-1]
            pos = (target >= 0) & (target < num_classes)
            target = jax.nn.one_hot(jnp.where(pos, target, 0), num_classes,
                                    dtype=pred.dtype) * pos[..., None]
        if label_weight is None:
            label_weight = jnp.ones(pred.shape[:1], pred.dtype)
        lw = label_weight[..., None] if label_weight.ndim < pred.ndim \
            else label_weight
        g = jnp.abs(jax.nn.sigmoid(pred) - target)
        valid = lw > 0
        total = jnp.maximum(valid.sum(), 1.0)
        weights = jnp.zeros_like(pred)
        for i in range(self.bins):
            in_bin = (g >= self.edges[i]) & (g < self.edges[i + 1]) & valid
            num_in_bin = in_bin.sum()
            weights = weights + jnp.where(
                in_bin, total / jnp.maximum(num_in_bin, 1.0), 0.0)
        n_nonempty = jnp.maximum((weights > 0).any(-1).sum(), 1.0)
        loss = _bce_with_logits(pred, target) * weights / self.bins
        return self.loss_weight * loss.sum() / total


@LOSSES.register_module()
class GHMR:
    """Gradient-harmonized regression loss (authentic-smooth-L1 form).

    Parity: /root/reference/mmdet/models/losses/ghm_loss.py (GHM-R)."""

    def __init__(self, mu=0.02, bins=10, momentum=0.0, loss_weight=1.0):
        self.mu = mu
        self.bins = bins
        self.loss_weight = loss_weight
        self.edges = jnp.linspace(0, 1, bins + 1).at[-1].set(1e3)

    def __call__(self, pred, target, label_weight=None, avg_factor=None,
                 **kwargs):
        mu = self.mu
        diff = pred - target
        loss = jnp.sqrt(diff * diff + mu * mu) - mu
        g = jnp.abs(diff / jnp.sqrt(diff * diff + mu * mu))
        if label_weight is None:
            label_weight = jnp.ones_like(loss)
        valid = label_weight > 0
        total = jnp.maximum(valid.sum(), 1.0)
        weights = jnp.zeros_like(loss)
        for i in range(self.bins):
            in_bin = (g >= self.edges[i]) & (g < self.edges[i + 1]) & valid
            n = in_bin.sum()
            weights = weights + jnp.where(in_bin,
                                          total / jnp.maximum(n, 1.0), 0.0)
        loss = loss * weights / self.bins
        return self.loss_weight * loss.sum() / total


@LOSSES.register_module()
class AssociativeEmbeddingLoss:
    """Corner pull/push embedding loss (ae_loss.py; used by CornerHead —
    which also carries an inlined copy over its dense targets). Operates
    on gathered per-object tl/br embeddings with a validity mask."""

    def __init__(self, pull_weight=0.25, push_weight=0.25):
        self.pull_weight = pull_weight
        self.push_weight = push_weight

    def __call__(self, tl_emb, br_emb, valid):
        """tl_emb/br_emb (..., G); valid (..., G) float."""
        mean = (tl_emb + br_emb) / 2
        n = jnp.maximum(valid.sum(-1), 1.0)
        pull = (((tl_emb - mean)**2 + (br_emb - mean)**2) * valid).sum(-1) \
            / n
        diff = jnp.abs(mean[..., :, None] - mean[..., None, :])
        g = valid.shape[-1]
        pairm = valid[..., :, None] * valid[..., None, :] * \
            (1.0 - jnp.eye(g))
        push = (jnp.maximum(1.0 - diff, 0.0) * pairm).sum((-2, -1)) / \
            jnp.maximum(n * (n - 1), 1.0)
        return self.pull_weight * pull.mean(), self.push_weight * push.mean()
