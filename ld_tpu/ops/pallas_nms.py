"""Pallas TPU kernel: greedy-NMS keep-mask via on-chip fixpoint iteration.

This is the hot inference kernel (SURVEY.md §2.4 marks CUDA NMS as the hot
path). The XLA formulation in ops/nms.py re-reads the (K, K) suppression
matrix from HBM every fixpoint iteration; this kernel computes the IoU
matrix ONCE into VMEM and iterates the suppression fixpoint entirely
on-chip — each iteration is a (1, K) x (K, K) contraction on the MXU over
VMEM-resident data.

Semantics are identical to `ops.nms._cluster_nms_keep` (exact greedy NMS on
score-sorted boxes); used automatically for candidate counts that fit VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_fixpoint_kernel(boxes_ref, valid_ref, thr_ref, keep_ref, iou_scr):
    boxes = boxes_ref[:]                       # (K, 4) VMEM
    k = boxes.shape[0]
    x1 = boxes[:, 0:1]
    y1 = boxes[:, 1:2]
    x2 = boxes[:, 2:3]
    y2 = boxes[:, 3:4]
    area = (x2 - x1) * (y2 - y1)               # (K, 1)

    lt_x = jnp.maximum(x1, x1.T)               # (K, K)
    lt_y = jnp.maximum(y1, y1.T)
    rb_x = jnp.minimum(x2, x2.T)
    rb_y = jnp.minimum(y2, y2.T)
    inter = jnp.clip(rb_x - lt_x, 0) * jnp.clip(rb_y - lt_y, 0)
    union = jnp.maximum(area + area.T - inter, 1e-6)
    iou = inter / union

    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    thr = thr_ref[0, 0]
    # i suppresses j when i < j (score order) and IoU above threshold
    iou_scr[:] = jnp.where((row < col) & (iou > thr), 1.0, 0.0)

    valid = valid_ref[:].reshape(1, k)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(it < k, jnp.any(keep != prev))

    def body(state):
        keep, _, it = state
        killed = jnp.dot(keep, iou_scr[:],
                         preferred_element_type=jnp.float32) > 0.5
        new_keep = jnp.where(killed, 0.0, valid)
        return new_keep, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.asarray(0)))
    keep_ref[:] = keep


@functools.partial(jax.jit, static_argnames=('interpret', ))
def pallas_nms_keep(boxes: jnp.ndarray, valid: jnp.ndarray,
                    iou_threshold: float, interpret: bool = False
                    ) -> jnp.ndarray:
    """Keep mask of greedy NMS over score-sorted boxes (Pallas TPU kernel).

    Args:
        boxes: (K, 4) sorted by descending score; K should be a multiple of 8.
        valid: (K,) float/bool — padded entries never kept.
    Returns:
        (K,) bool keep mask.
    """
    k = boxes.shape[0]
    thr = jnp.asarray([[iou_threshold]], jnp.float32)
    keep = pl.pallas_call(
        _nms_fixpoint_kernel,
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else
                         pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else
                         pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else
                         pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret else
                               pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.float32)],
        interpret=interpret,
    )(boxes.astype(jnp.float32), valid.astype(jnp.float32).reshape(1, k),
      thr)
    return keep[0] > 0.5
