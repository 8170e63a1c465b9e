"""Soft-NMS oracle tests.

The scan-based soft_nms_select must reproduce greedy soft-NMS (Bodla et
al. 2017) exactly: same emission order, same decayed scores — the
semantics the reference consumes via nms_cfg type='soft_nms'
(/root/reference/configs/faster_rcnn/faster_rcnn_r50_fpn_soft_nms_1x_coco.py,
cornernet's gaussian variant).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ld_tpu.ops.nms import multiclass_nms, soft_nms_select


def _np_iou(a, B):
    x1 = np.maximum(a[0], B[:, 0])
    y1 = np.maximum(a[1], B[:, 1])
    x2 = np.minimum(a[2], B[:, 2])
    y2 = np.minimum(a[3], B[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    union = ((a[2] - a[0]) * (a[3] - a[1]) +
             (B[:, 2] - B[:, 0]) * (B[:, 3] - B[:, 1]) - inter)
    return inter / union


def _np_soft_nms(boxes, scores, thr, max_out, method, sigma=0.5,
                 min_score=1e-3):
    s = scores.astype(np.float64).copy()
    idx, out = [], []
    for _ in range(max_out):
        i = int(np.argmax(s))
        idx.append(i)
        out.append(s[i])
        iou = _np_iou(boxes[i], boxes)
        if method == 'gaussian':
            decay = np.exp(-(iou * iou) / sigma)
        else:
            decay = np.where(iou > thr, 1.0 - iou, 1.0)
        s = s * decay
        s[i] = -np.inf
    idx, out = np.asarray(idx), np.asarray(out)
    valid = out > min_score
    return idx, np.where(valid, out, 0.0), valid


def _random_boxes(rng, n):
    xy = rng.rand(n, 2).astype(np.float32) * 100
    wh = 10 + rng.rand(n, 2).astype(np.float32) * 40
    return np.concatenate([xy, xy + wh], -1)


@pytest.mark.parametrize('method', ['linear', 'gaussian'])
def test_soft_nms_matches_numpy_oracle(method):
    rng = np.random.RandomState(3)
    boxes = _random_boxes(rng, 64)
    scores = (rng.rand(64) * 0.9 + 0.05).astype(np.float32)
    idx, sc, valid = soft_nms_select(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(64, bool),
        0.3, 32, method=method)
    ridx, rsc, rvalid = _np_soft_nms(boxes, scores, 0.3, 32, method)
    assert np.array_equal(np.asarray(idx), ridx)
    np.testing.assert_allclose(np.asarray(sc), rsc, rtol=1e-4, atol=1e-5)
    assert np.array_equal(np.asarray(valid), rvalid)


def test_soft_nms_respects_validity_mask():
    rng = np.random.RandomState(5)
    boxes = _random_boxes(rng, 16)
    scores = (rng.rand(16) * 0.9 + 0.05).astype(np.float32)
    valid = np.arange(16) < 10
    idx, _, out_valid = soft_nms_select(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        0.3, 16, method='linear')
    assert set(np.asarray(idx)[np.asarray(out_valid)]).issubset(set(range(10)))


def test_multiclass_nms_soft_path():
    """soft_nms through multiclass_nms: classes never suppress each other
    (offset trick), outputs fixed-size + masked like the hard path."""
    rng = np.random.RandomState(7)
    boxes = _random_boxes(rng, 48)
    scores = rng.rand(48, 4).astype(np.float32)
    dets, labels, valid = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.05, 0.5,
        max_per_img=20, nms_cfg=dict(type='soft_nms', iou_threshold=0.5))
    assert dets.shape == (20, 5) and labels.shape == (20,)
    assert bool(valid.any())
    # identical boxes in different classes must both survive
    bb = np.repeat(boxes[:1], 2, 0)
    ss = np.array([[0.9, 0.0], [0.0, 0.8]], np.float32)
    dets2, labels2, valid2 = multiclass_nms(
        jnp.asarray(bb), jnp.asarray(ss), 0.05, 0.5, max_per_img=4,
        nms_cfg=dict(type='soft_nms', iou_threshold=0.5))
    kept = np.asarray(labels2)[np.asarray(valid2)]
    assert set(kept.tolist()) == {0, 1}
    assert dets2.shape == (4, 5)
