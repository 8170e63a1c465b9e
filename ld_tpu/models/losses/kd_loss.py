"""Distillation losses: LD/KD KL divergence and feature-imitation MSE.

Parity targets:
  - knowledge_distillation_kl_div_loss:
    /root/reference/mmdet/models/losses/kd_loss.py:12 —
    KL(softmax(t/T) || softmax(s/T)) averaged over the last dim, scaled T^2,
    including the constant p*log(p) entropy term (torch F.kl_div semantics).
  - IMLoss: /root/reference/mmdet/models/losses/kd_loss.py:91 — plain MSE.

The reference registers a loss name `LocalizationDistillationLoss` in some
head defaults but never implements it; every shipped config uses
KnowledgeDistillationKLDivLoss. We register BOTH names to the same class so
all reference config files load unmodified (SURVEY.md §2.1 footgun note).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ld_tpu.utils.registry import LOSSES
from .utils import weighted_loss


@weighted_loss
def knowledge_distillation_kl_div_loss(pred: jnp.ndarray,
                                       soft_label: jnp.ndarray,
                                       T: float,
                                       detach_target: bool = True):
    """Element-wise KD loss.

    Args:
        pred: (N, K) student logits.
        soft_label: (N, K) teacher logits.
        T: distillation temperature.
    Returns:
        (N,) loss: mean_k[ p_k * (log p_k - log q_k) ] * T^2
    """
    assert pred.shape == soft_label.shape
    target_logp = jax.nn.log_softmax(soft_label / T, axis=-1)
    target = jnp.exp(target_logp)
    if detach_target:
        target = jax.lax.stop_gradient(target)
        target_logp = jax.lax.stop_gradient(target_logp)
    logp = jax.nn.log_softmax(pred / T, axis=-1)
    # torch.F.kl_div(input=logp, target=p) = p * (log p - logp)
    kd = target * (target_logp - logp)
    return kd.mean(axis=-1) * (T * T)


@weighted_loss
def im_loss(x: jnp.ndarray, soft_target: jnp.ndarray):
    """Feature-imitation loss: scalar MSE (the reference wraps F.mse_loss,
    which already reduces to a scalar, so weight/avg_factor are no-ops there
    as well — all shipped configs call it bare)."""
    return jnp.mean((x - soft_target)**2)


@LOSSES.register_module(name=['KnowledgeDistillationKLDivLoss',
                              'LocalizationDistillationLoss'])
class KnowledgeDistillationKLDivLoss:
    def __init__(self, reduction='mean', loss_weight=1.0, T=10):
        assert T >= 1
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.T = T

    def __call__(self, pred, soft_label, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * knowledge_distillation_kl_div_loss(
            pred, soft_label, weight, reduction=reduction,
            avg_factor=avg_factor, T=self.T)


@LOSSES.register_module()
class IMLoss:
    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, x, soft_target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * im_loss(x, soft_target, reduction=reduction)
