"""Weighted-loss contract shared by every loss in the framework.

Matches the reference semantics exactly
(/root/reference/mmdet/models/losses/utils.py:28,57): element-wise loss is
multiplied by an optional per-element weight; `reduction` is none/mean/sum;
when `avg_factor` is given with reduction='mean' the loss is `sum / avg_factor`.

TPU-first note: in the masked static-shape design, "absent" elements carry
weight 0, so these reductions are exact replacements for the reference's
`pos_inds` gather-then-reduce pattern.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp


def reduce_loss(loss: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == 'none':
        return loss
    if reduction == 'mean':
        return jnp.mean(loss)
    if reduction == 'sum':
        return jnp.sum(loss)
    raise ValueError(f'unknown reduction {reduction}')


def weight_reduce_loss(loss: jnp.ndarray,
                       weight=None,
                       reduction: str = 'mean',
                       avg_factor=None) -> jnp.ndarray:
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return reduce_loss(loss, reduction)
    if reduction == 'mean':
        return jnp.sum(loss) / avg_factor
    if reduction == 'none':
        return loss
    raise ValueError('avg_factor can not be used with reduction="sum"')


def weighted_loss(loss_func):
    """Decorator adding (weight, reduction, avg_factor) to an element-wise loss."""

    @functools.wraps(loss_func)
    def wrapper(pred, target, weight=None, reduction='mean', avg_factor=None,
                **kwargs):
        loss = loss_func(pred, target, **kwargs)
        return weight_reduce_loss(loss, weight, reduction, avg_factor)

    return wrapper
