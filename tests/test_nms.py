"""NMS kernels vs a naive greedy oracle."""
import pytest

pytestmark = pytest.mark.smoke  # high-value numerics/oracle gate (<10 min total, README)
import jax
import numpy as np
import jax.numpy as jnp

from ld_tpu.ops.nms import nms, multiclass_nms, multiclass_nms_voting


def _greedy_nms_oracle(boxes, scores, thr):
    order = np.argsort(-scores, kind='stable')
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a + b - inter, 1e-9) > thr:
                suppressed[j] = True
    return keep


def _rand_boxes(rng, n, span=100):
    xy = rng.uniform(0, span, (n, 2))
    wh = rng.uniform(5, 40, (n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def test_nms_matches_greedy_oracle():
    for seed in range(5):
        rng = np.random.RandomState(seed)
        boxes = _rand_boxes(rng, 64)
        scores = rng.uniform(0.01, 1, 64).astype(np.float32)
        idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                         max_out=64)
        got = list(np.asarray(idx)[np.asarray(valid)])
        want = _greedy_nms_oracle(boxes, scores, 0.5)
        assert got == want, (seed, got, want)


def test_nms_max_out_truncates():
    rng = np.random.RandomState(0)
    boxes = _rand_boxes(rng, 128, span=2000)  # mostly non-overlapping
    scores = rng.uniform(0.01, 1, 128).astype(np.float32)
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=10)
    assert valid.shape == (10, )
    want = _greedy_nms_oracle(boxes, scores, 0.5)[:10]
    assert list(np.asarray(idx)[np.asarray(valid)]) == want


def test_multiclass_nms_separates_classes():
    # two identical boxes, different classes: both must survive
    boxes = jnp.asarray([[0., 0., 10., 10.], [0., 0., 10., 10.]])
    scores = np.zeros((2, 3), np.float32)
    scores[0, 0] = 0.9
    scores[1, 1] = 0.8
    dets, labels, valid = multiclass_nms(boxes, jnp.asarray(scores),
                                         score_thr=0.05, iou_threshold=0.5,
                                         max_per_img=5)
    assert int(valid.sum()) == 2
    assert set(np.asarray(labels)[np.asarray(valid)].tolist()) == {0, 1}


def test_multiclass_nms_same_class_suppression():
    boxes = jnp.asarray([[0., 0., 10., 10.], [1., 1., 11., 11.],
                         [50., 50., 60., 60.]])
    scores = np.zeros((3, 2), np.float32)
    scores[:, 0] = [0.9, 0.85, 0.7]
    dets, labels, valid = multiclass_nms(boxes, jnp.asarray(scores),
                                         score_thr=0.05, iou_threshold=0.5,
                                         max_per_img=5)
    v = np.asarray(valid)
    assert int(v.sum()) == 2  # overlapping pair collapsed
    d = np.asarray(dets)[v]
    assert d[0, 4] >= d[1, 4]  # score-ordered output


def test_multiclass_nms_score_threshold():
    boxes = jnp.asarray([[0., 0., 10., 10.]])
    scores = jnp.asarray([[0.01]])
    dets, labels, valid = multiclass_nms(boxes, scores, score_thr=0.05,
                                         iou_threshold=0.5, max_per_img=5)
    assert int(valid.sum()) == 0


def test_voting_nms_refines_towards_cluster():
    # reference gate: only neighbours with cluster-DIoU > 0.7 vote
    # (bbox_nms.py:168 B*(B>0.7)) — use a tight cluster so voting fires
    boxes = jnp.asarray([[0., 0., 10., 10.], [0.5, 0.5, 10.5, 10.5],
                         [1., 1., 11., 11.]])
    scores = jnp.asarray([[0.9], [0.8], [0.7]])
    dets, labels, valid = multiclass_nms_voting(
        boxes, scores, score_thr=0.05, iou_threshold=0.6, max_per_img=3)
    v = np.asarray(valid)
    assert v.sum() >= 1
    top = np.asarray(dets)[0, :4]
    # voted box pulled strictly inside the cluster span by its neighbours
    assert 0.0 < top[0] < 1.0 and 10.0 < top[2] < 11.0


def test_topk_flat_exact_vs_lax():
    from ld_tpu.ops.nms import topk_flat
    rs = np.random.RandomState(3)
    for n, k in [(400000, 1024), (16800, 1000), (5000, 1024), (8191, 64),
                 (4097, 4096), (100, 10)]:
        x = jnp.asarray(rs.rand(n).astype(np.float32))
        v_ref, _ = jax.lax.top_k(x, k)
        v, idx = topk_flat(x, k)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
        # returned indices must address the returned values
        np.testing.assert_array_equal(np.asarray(x)[np.asarray(idx)],
                                      np.asarray(v_ref))


def test_exact_preprune_matches_flat_topk():
    """The serving-shape anchor pre-prune (top-k anchors by per-anchor
    class max, then flat top-k over k*C instead of N*C) must reproduce
    lax.top_k over the full flat matrix exactly — values AND original
    flat indices — on untied random scores (the topk_flat exactness
    standard). Shapes are the real GFL serving case: 5000x80 = 400k."""
    from ld_tpu.ops.nms import topk_flat
    rs = np.random.RandomState(7)
    for n, c, k in [(5000, 80, 1024), (16800, 20, 1000), (3000, 80, 1024)]:
        scores = rs.rand(n, c).astype(np.float32)
        # realistic sparsity: most pairs below the 0.05 serving threshold
        scores = np.where(rs.rand(n, c) < 0.9, scores * 0.05, scores)
        masked = jnp.asarray(np.where(scores > 0.05, scores, 0.0))
        ref_v, ref_i = jax.lax.top_k(masked.reshape(-1), k)
        anch = jnp.sort(topk_flat(masked.max(axis=1), min(k, n))[1])
        v, si = topk_flat(masked[anch].reshape(-1), k)
        idx = anch[si // c] * c + si % c
        np.testing.assert_array_equal(np.asarray(v), np.asarray(ref_v))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))


def test_multiclass_nms_preprune_wiring_identical():
    """multiclass_nms with the pre-prune engaged (auto at serving shapes)
    returns bit-identical detections to the full-flat path."""
    rs = np.random.RandomState(11)
    n, c = 3000, 20
    boxes = rs.rand(n, 4).astype(np.float32) * 64
    boxes = np.concatenate([boxes[:, :2], boxes[:, :2] + 4 +
                            boxes[:, 2:] * 0.5], axis=1)
    scores = (rs.rand(n, c) ** 4).astype(np.float32)
    args = (jnp.asarray(boxes), jnp.asarray(scores), 0.05, 0.6, 100, 1024)
    d_on, l_on, v_on = multiclass_nms(*args, exact_preprune=True)
    d_off, l_off, v_off = multiclass_nms(*args, exact_preprune=False)
    np.testing.assert_array_equal(np.asarray(d_on), np.asarray(d_off))
    np.testing.assert_array_equal(np.asarray(l_on), np.asarray(l_off))
    np.testing.assert_array_equal(np.asarray(v_on), np.asarray(v_off))
    assert bool(np.asarray(v_on).any())
