"""GI-region candidate-prefix exactness (VERDICT round-1 item 9).

The reference NMS-es EVERY anchor of a level for the GI imitation region
(/root/reference/mmdet/models/dense_heads/ld_head.py:613-638); ld_tpu runs
the greedy NMS on a `gi_candidates` top-score prefix. These tests pin the
semantics against a full-anchor numpy oracle:
  * realistic score fields: the default 512-prefix is EXACT;
  * an adversarial field (a >512-anchor cluster of mutually-suppressing
    high scorers shadowing low-score picks) breaks the prefix — and raising
    the `gi_candidates` config knob to the anchor count restores exactness.
"""
import pytest

pytestmark = pytest.mark.smoke  # high-value numerics/oracle gate (<10 min total, README)
import numpy as np
import jax
import jax.numpy as jnp

import ld_tpu
from ld_tpu.models import build_detector
from ld_tpu.ops import anchor_center, distance2bbox, integral


def _head(gi_candidates=512, gi_top=10):
    det = build_detector(dict(
        type='GFL',
        backbone=dict(type='ResNet', depth=18),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=16, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(type='LDHead', num_classes=2, in_channels=16,
                       stacked_convs=1, feat_channels=16, reg_max=16,
                       gi_candidates=gi_candidates, gi_top=gi_top,
                       teacher=None)))
    return det.bbox_head


def _field(n, centers, diffs, box_bin=8, reg_max=16):
    """Construct head inputs producing gi_score == diffs and teacher boxes
    of half-size `box_bin` at `centers` (teacher always 'bigger')."""
    def logit(p):
        p = np.clip(p, 1e-6, 1 - 1e-6)
        return np.log(p / (1 - p))

    cls_flat = np.full((n, 2), logit(0.5), np.float32)           # student .5
    soft = np.stack([logit(0.5 + diffs), np.full(n, logit(0.5))],
                    axis=-1).astype(np.float32)                   # teacher
    pred = np.zeros((n, 4 * (reg_max + 1)), np.float32)
    soft_pred = np.zeros((n, 4, reg_max + 1), np.float32)
    soft_pred[:, :, box_bin] = 20.0                               # dist ~ bin
    soft_pred = soft_pred.reshape(n, -1)
    return (jnp.asarray(cls_flat), jnp.asarray(soft), jnp.asarray(pred),
            jnp.asarray(soft_pred), jnp.asarray(centers))


def _oracle_mask(gibox, scores, iou_thr=0.3, max_out=10):
    """Full-anchor greedy NMS (the reference semantics) in numpy."""
    n = len(scores)
    order = np.argsort(-scores, kind='stable')
    keep = []
    suppressed = np.zeros(n, bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        if len(keep) >= max_out:
            break
        x1 = np.maximum(gibox[i, 0], gibox[:, 0])
        y1 = np.maximum(gibox[i, 1], gibox[:, 1])
        x2 = np.minimum(gibox[i, 2], gibox[:, 2])
        y2 = np.minimum(gibox[i, 3], gibox[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a = (gibox[:, 2] - gibox[:, 0]) * (gibox[:, 3] - gibox[:, 1])
        ai = (gibox[i, 2] - gibox[i, 0]) * (gibox[i, 3] - gibox[i, 1])
        iou = inter / np.maximum(a + ai - inter, 1e-9)
        suppressed |= iou > iou_thr
        suppressed[i] = True
    mask = np.zeros(n, np.float32)
    mask[keep] = 1.0
    return mask


def _gibox_np(centers, soft_pred, reg_max=16):
    return np.asarray(distance2bbox(
        jnp.asarray(centers), integral(jnp.asarray(soft_pred), reg_max)))


def test_gi_prefix_exact_on_realistic_field():
    rs = np.random.RandomState(0)
    n = 1600
    centers = rs.uniform(0, 2000, (n, 2)).astype(np.float32)
    diffs = rs.uniform(0.0, 0.45, n).astype(np.float32)
    inputs = _field(n, centers, diffs)
    head = _head(gi_candidates=512)
    got = np.asarray(head._gi_mask(*inputs, gi_candidates=512, gi_top=10))
    want = _oracle_mask(_gibox_np(centers, np.asarray(inputs[3])), diffs)
    np.testing.assert_array_equal(got, want)
    assert got.sum() == 10


def test_gi_prefix_breaks_adversarially_and_knob_restores_exactness():
    n = 600
    centers = np.zeros((n, 2), np.float32)
    # 550-anchor mutually-suppressing cluster with the TOP scores
    centers[:550, 0] = np.linspace(0, 5, 550)
    centers[:550, 1] = 100.0
    # 50 spread-out anchors with low scores — the oracle's picks 2..10
    centers[550:, 0] = np.arange(50) * 200.0
    centers[550:, 1] = 1000.0
    diffs = np.concatenate([
        0.45 - np.arange(550) * 1e-5,
        np.full(50, 0.05)]).astype(np.float32)
    inputs = _field(n, centers, diffs)
    oracle = _oracle_mask(_gibox_np(centers, np.asarray(inputs[3])), diffs)
    assert oracle.sum() == 10 and oracle[550:].sum() == 9

    head = _head()
    prefix512 = np.asarray(head._gi_mask(*inputs, gi_candidates=512,
                                         gi_top=10))
    # the 512-prefix never sees the low-score picks: provably NOT exact here
    assert prefix512[550:].sum() == 0
    assert not np.array_equal(prefix512, oracle)

    # gi_candidates >= anchor count -> exact match with the full oracle
    full = np.asarray(head._gi_mask(*inputs, gi_candidates=n, gi_top=10))
    np.testing.assert_array_equal(full, oracle)


def test_gi_candidates_is_a_config_knob():
    head = _head(gi_candidates=640, gi_top=7)
    assert head.gi_candidates == 640
    assert head.gi_top == 7
