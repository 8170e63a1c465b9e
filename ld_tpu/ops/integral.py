"""Distribution -> scalar decode for GFL distributional box regression.

Parity: the `Integral` module at
/root/reference/mmdet/models/dense_heads/gfl_head.py:15 — softmax over
(reg_max+1) bins dotted with linspace(0, reg_max), per box side.

TPU-first: expressed as one fused softmax+matvec over the trailing axis so it
rides the VPU/MXU; works on any leading shape (..., 4*(reg_max+1)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def integral(x: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Decode distribution logits to expected distances.

    Args:
        x: (..., 4*(reg_max+1)) distribution logits.
    Returns:
        (..., 4) expected (l, t, r, b) distances in bin units.
    """
    bins = reg_max + 1
    shape = x.shape[:-1] + (4, bins)
    prob = jax.nn.softmax(x.reshape(shape), axis=-1)
    project = jnp.arange(bins, dtype=prob.dtype)
    return (prob * project).sum(axis=-1)
