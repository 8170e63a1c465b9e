"""Core box-op tests against independent numpy loop oracles."""
import pytest

pytestmark = pytest.mark.smoke  # high-value numerics/oracle gate (<10 min total, README)
import numpy as np
import jax.numpy as jnp
import pytest

from ld_tpu.ops import (bbox_overlaps, distance2bbox, bbox2distance,
                        anchor_center)


def _iou_numpy(b1, b2, mode='iou'):
    """Naive loop oracle, written from the IoU/GIoU/DIoU definitions."""
    m, n = len(b1), len(b2)
    out = np.zeros((m, n))
    for i in range(m):
        for j in range(n):
            ax1, ay1, ax2, ay2 = b1[i]
            bx1, by1, bx2, by2 = b2[j]
            iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
            ih = max(0.0, min(ay2, by2) - max(ay1, by1))
            inter = iw * ih
            a1 = (ax2 - ax1) * (ay2 - ay1)
            a2 = (bx2 - bx1) * (by2 - by1)
            union = a1 if mode == 'iof' else a1 + a2 - inter
            iou = inter / max(union, 1e-6)
            if mode in ('iou', 'iof'):
                out[i, j] = iou
                continue
            ex1, ey1 = min(ax1, bx1), min(ay1, by1)
            ex2, ey2 = max(ax2, bx2), max(ay2, by2)
            if mode == 'giou':
                ea = max((ex2 - ex1) * (ey2 - ey1), 1e-6)
                out[i, j] = iou - (ea - union) / ea
            elif mode == 'diou':
                rho2 = (((bx1 + bx2) - (ax1 + ax2))**2 +
                        ((by1 + by2) - (ay1 + ay2))**2) / 4.0
                c2 = max((ex2 - ex1)**2 + (ey2 - ey1)**2, 1e-6)
                out[i, j] = iou - rho2 / c2
    return out


@pytest.fixture
def rand_boxes():
    rng = np.random.RandomState(0)

    def make(n):
        xy = rng.uniform(0, 200, size=(n, 2))
        wh = rng.uniform(1, 100, size=(n, 2))
        return np.concatenate([xy, xy + wh], -1).astype(np.float32)

    return make


@pytest.mark.parametrize('mode', ['iou', 'iof', 'giou', 'diou'])
def test_bbox_overlaps_matches_oracle(rand_boxes, mode):
    b1, b2 = rand_boxes(23), rand_boxes(11)
    got = np.asarray(bbox_overlaps(jnp.asarray(b1), jnp.asarray(b2), mode))
    want = _iou_numpy(b1, b2, mode)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bbox_overlaps_aligned(rand_boxes):
    b1, b2 = rand_boxes(17), rand_boxes(17)
    full = np.asarray(bbox_overlaps(jnp.asarray(b1), jnp.asarray(b2)))
    aligned = np.asarray(
        bbox_overlaps(jnp.asarray(b1), jnp.asarray(b2), is_aligned=True))
    np.testing.assert_allclose(aligned, np.diag(full), rtol=1e-5)


def test_bbox_overlaps_identity():
    b = jnp.asarray([[0., 0., 10., 10.]])
    for mode in ('iou', 'giou', 'diou', 'ciou'):
        v = float(bbox_overlaps(b, b, mode=mode, is_aligned=True)[0])
        assert abs(v - 1.0) < 1e-5, mode


def test_ciou_leq_diou(rand_boxes):
    b1, b2 = rand_boxes(10), rand_boxes(10)
    diou = np.asarray(bbox_overlaps(jnp.asarray(b1), jnp.asarray(b2), 'diou'))
    ciou = np.asarray(bbox_overlaps(jnp.asarray(b1), jnp.asarray(b2), 'ciou'))
    assert (ciou <= diou + 1e-6).all()


def test_distance_bbox_roundtrip(rand_boxes):
    boxes = rand_boxes(31)
    centers = anchor_center(jnp.asarray(boxes))
    dist = bbox2distance(centers, jnp.asarray(boxes))
    back = distance2bbox(centers, dist)
    np.testing.assert_allclose(np.asarray(back), boxes, rtol=1e-4, atol=1e-3)


def test_bbox2distance_clamp():
    pts = jnp.asarray([[50., 50.]])
    box = jnp.asarray([[0., 0., 100., 100.]])
    d = bbox2distance(pts, box, max_dis=16.0)
    assert float(d.max()) <= 16.0 - 0.1 + 1e-6


def test_distance2bbox_clip_batched():
    pts = jnp.zeros((2, 3, 2)) + 50.0
    dist = jnp.full((2, 3, 4), 100.0)
    max_shape = jnp.asarray([[60., 70.], [80., 90.]])  # (B, 2) = (H, W)
    out = distance2bbox(pts, dist, max_shape=max_shape)
    assert float(out[0, :, 2].max()) <= 70.0  # x2 clipped to W of image 0
    assert float(out[0, :, 3].max()) <= 60.0  # y2 clipped to H
    assert float(out[1, :, 2].max()) <= 90.0
    assert float(out.min()) >= 0.0


def test_batched_overlaps_shape(rand_boxes):
    b1 = jnp.asarray(np.stack([rand_boxes(5), rand_boxes(5)]))
    b2 = jnp.asarray(np.stack([rand_boxes(7), rand_boxes(7)]))
    out = bbox_overlaps(b1, b2)
    assert out.shape == (2, 5, 7)
