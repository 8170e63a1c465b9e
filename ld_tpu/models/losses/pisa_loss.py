"""PISA: Prime Sample Attention (ISR-P reweighting + CARL loss).

Parity: /root/reference/mmdet/models/losses/pisa_loss.py:8,122 —
  * isr_p: positives are ranked by IoU-HLR (rank by IoU inside each
    (class, gt) group, the group ranks interleave within the class), the
    rank maps linearly to an importance weight (bias + w*(1-bias))^k, then
    the weights are rescaled so the positive cls loss keeps its original
    magnitude.
  * carl_loss: the regression loss of each positive is scaled by
    (bias + (1-bias) * p_cls)^k where p_cls keeps its gradient — making
    classification aware of localization quality; weights normalized to
    sum to num_pos.

Static-shape design: both operate on a fixed budget of gathered positives
(the head gathers top-P positive slots), with a validity mask instead of
`nonzero` index tensors.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6


def _rank_desc_within(group_ok, key):
    """rank (0 = best) of each element by `key` desc within its group.

    group_ok: (P, P) bool — [i, j] True when j is in i's group (and valid).
    """
    better = group_ok & (key[None, :] > key[:, None])
    return better.sum(-1)


def isr_p(pos_ious, pos_labels, pos_gts, pos_valid, pos_label_weights,
          pos_cls_loss, k=2.0, bias=0.0):
    """Importance weights for a fixed set of positives.

    Args: all (P,) arrays; pos_cls_loss is the per-positive cls loss
    (reduction 'none', detached) used for magnitude renormalization.
    Returns (P,) new label weights (0 where invalid).
    """
    v = pos_valid
    same_label = (pos_labels[:, None] == pos_labels[None, :]) & v[None, :]
    same_gt = same_label & (pos_gts[:, None] == pos_gts[None, :])
    # max positives of any single class
    max_l_num = jnp.maximum(same_label.sum(-1).max(), 1).astype(jnp.float32)
    # step 1: rank inside each (label, gt) group by IoU desc
    t_rank = _rank_desc_within(same_gt, pos_ious).astype(jnp.float32)
    boosted = pos_ious + (max_l_num - t_rank)
    # step 2: rank inside each label group by the boosted key
    l_rank = _rank_desc_within(same_label, boosted).astype(jnp.float32)
    w = pos_label_weights * (max_l_num - l_rank) / max_l_num
    w = (bias + w * (1.0 - bias)) ** k
    # renormalize: keep the positive cls-loss magnitude unchanged
    ori = (pos_cls_loss * pos_label_weights * v).sum()
    new = (pos_cls_loss * w * v).sum()
    ratio = ori / jnp.maximum(new, EPS)
    return jnp.where(v, w * ratio, 0.0)


def carl_weights(pos_cls_prob, pos_valid, k=1.0, bias=0.2):
    """CARL per-positive weights from (gradient-carrying) cls probs,
    normalized so they sum to num_pos."""
    w = (bias + (1.0 - bias) * pos_cls_prob) ** k
    w = jnp.where(pos_valid, w, 0.0)
    num_pos = pos_valid.astype(jnp.float32).sum()
    return w * num_pos / jnp.maximum(w.sum(), EPS)
