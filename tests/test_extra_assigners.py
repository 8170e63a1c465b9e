"""Hungarian / Point assigners + Fast NMS."""
import numpy as np
import jax
import jax.numpy as jnp

from ld_tpu.ops import HungarianAssigner, PointAssigner
from ld_tpu.ops.nms import fast_nms


def test_hungarian_one_to_one():
    rng = np.random.RandomState(0)
    q, g = 12, 3
    gt = np.asarray([[0, 0, 20, 20], [40, 40, 70, 80], [100, 10, 130, 50]],
                    np.float32)
    # predictions: each gt has one near-perfect query, rest random
    pred = rng.uniform(0, 150, (q, 2))
    pred = np.concatenate([pred, pred + rng.uniform(5, 40, (q, 2))],
                          -1).astype(np.float32)
    pred[:3] = gt + rng.uniform(-1, 1, (3, 4)).astype(np.float32)
    logits = rng.randn(q, 5).astype(np.float32)
    labels = np.asarray([1, 2, 3])
    for i in range(3):
        logits[i, labels[i]] = 8.0  # confident correct class
    res = HungarianAssigner().assign(
        jnp.asarray(pred), jnp.asarray(logits), jnp.asarray(gt),
        jnp.asarray(labels), jnp.ones(g, bool), (160.0, 160.0),
        num_classes=5)
    a = np.asarray(res.assigned_gt_inds)
    assert (a >= 0).sum() == g           # exactly one query per gt
    assert set(a[a >= 0].tolist()) == {0, 1, 2}
    np.testing.assert_array_equal(a[:3], [0, 1, 2])


def test_point_assigner():
    # points on two levels (stride 8, 16)
    pts = []
    for s, n in ((8, 16), (16, 8)):
        xy = np.arange(n, dtype=np.float32) * s + s / 2
        pts.append(np.stack([xy, np.full(n, s / 2, np.float32),
                             np.full(n, s, np.float32)], -1))
    points = jnp.asarray(np.concatenate(pts))
    gt = jnp.asarray([[24., 0., 56., 8.]])  # small gt -> low level
    res = PointAssigner(scale=4, pos_num=2).assign(
        points, [16, 8], gt, jnp.asarray([2]), jnp.ones(1, bool),
        num_classes=5)
    pos = np.asarray(res.pos_mask)
    assert pos.sum() == 2
    assert (np.asarray(res.labels)[pos] == 2).all()


def test_fast_nms_suppresses_same_class_only():
    boxes = jnp.asarray([[0., 0., 10., 10.], [1., 1., 11., 11.],
                         [0., 0., 10., 10.]])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    labels = jnp.asarray([0, 0, 1])
    idx, valid = fast_nms(boxes, scores, labels, 0.5, max_out=3)
    kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == {0, 2}


def test_center_region_assigner():
    from ld_tpu.ops.extra_assigners import CenterRegionAssigner
    # anchors on an 8-stride grid over 64x64
    xs = np.arange(8, dtype=np.float32) * 8 + 4
    pts = np.stack(np.meshgrid(xs, xs), -1).reshape(-1, 2)
    anchors = np.concatenate([pts - 4, pts + 4], -1).astype(np.float32)
    gt = jnp.asarray([[8., 8., 56., 56.]])   # 48x48 box centered (32, 32)
    res = CenterRegionAssigner(pos_scale=0.2, neg_scale=0.5).assign(
        jnp.asarray(anchors), [64], gt, jnp.asarray([3]),
        jnp.ones(1, bool), num_classes=5)
    pos = np.asarray(res.pos_mask)
    # pos region: 9.6x9.6 box around (32,32) -> only centers (28,28)..(36,36)
    assert pos.sum() >= 1
    centers = (anchors[:, :2] + anchors[:, 2:]) / 2
    assert np.all(np.abs(centers[pos] - 32) <= 4.8 + 1e-3)
    ign = np.asarray(res.max_overlaps) == -1.0
    assert ign.sum() > 0 and not (ign & pos).any()
    assert (np.asarray(res.labels)[pos] == 3).all()
