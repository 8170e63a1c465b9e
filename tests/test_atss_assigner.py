"""ATSS + VLR assignment vs an independent numpy loop oracle implementing the
published ATSS algorithm (Zhang et al., CVPR 2020) and the LD paper's VLR
band definition."""
import pytest

pytestmark = pytest.mark.smoke  # high-value numerics/oracle gate (<10 min total, README)
import numpy as np
import jax
import jax.numpy as jnp

from ld_tpu.ops import ATSSAssigner, AnchorGenerator, bbox_overlaps

NUM_CLASSES = 80


def _iou_np(b1, b2, mode='iou'):
    return np.asarray(bbox_overlaps(jnp.asarray(b1), jnp.asarray(b2), mode))


def _oracle(anchors, num_level, gts, labels, topk=9):
    N, G = len(anchors), len(gts)
    iou = _iou_np(anchors, gts)
    centers = (anchors[:, :2] + anchors[:, 2:]) / 2
    gtc = (gts[:, :2] + gts[:, 2:]) / 2
    dist = np.linalg.norm(centers[:, None] - gtc[None], axis=-1)

    cand = []
    s = 0
    for n in num_level:
        k = min(topk, n)
        idx = np.argsort(dist[s:s + n], axis=0, kind='stable')[:k] + s
        cand.append(idx)
        s += n
    cand = np.concatenate(cand, 0)  # (K, G)
    cand_iou = iou[cand, np.arange(G)[None, :]]
    thr = cand_iou.mean(0) + cand_iou.std(0, ddof=1)

    pos_grid = np.zeros((N, G), bool)
    for g in range(G):
        for idx in cand[:, g]:
            cx, cy = centers[idx]
            inside = min(cx - gts[g, 0], cy - gts[g, 1], gts[g, 2] - cx,
                         gts[g, 3] - cy) > 0.01
            if iou[idx, g] >= thr[g] and inside:
                pos_grid[idx, g] = True

    out_labels = np.full(N, NUM_CLASSES, np.int64)
    out_gt = np.full(N, -1, np.int64)
    for a in range(N):
        cands = np.nonzero(pos_grid[a])[0]
        if len(cands):
            best = cands[np.argmax(iou[a, cands])]
            out_gt[a] = best
            out_labels[a] = labels[best]
    return out_gt, out_labels, thr, iou, dist


def _vlr_oracle(anchors, num_level, gts, thr):
    iou = _iou_np(anchors, gts)
    diou = _iou_np(anchors, gts, 'diou')
    N, G = iou.shape
    out = np.zeros(N)
    for a in range(N):
        best = -1e30
        for g in range(G):
            if 0.25 * thr[g] <= diou[a, g] < thr[g]:
                best = max(best, iou[a, g])
        out[a] = best if best > -1e29 else 0.0
    return out


def _make_problem(seed=0, num_gt=6, pad_to=10):
    rng = np.random.RandomState(seed)
    gen = AnchorGenerator(strides=[8, 16, 32], ratios=[1.0],
                          octave_base_scale=8, scales_per_octave=1,
                          center_offset=0.0)
    featmap_sizes = [(16, 20), (8, 10), (4, 5)]
    anchors = np.concatenate(
        [np.asarray(a) for a in gen.grid_anchors(featmap_sizes)])
    num_level = gen.num_level_anchors(featmap_sizes)
    xy = rng.uniform(0, 100, (num_gt, 2))
    wh = rng.uniform(20, 60, (num_gt, 2))
    gts = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    labels = rng.randint(0, NUM_CLASSES, num_gt)
    gts_pad = np.zeros((pad_to, 4), np.float32)
    gts_pad[:num_gt] = gts
    labels_pad = np.zeros(pad_to, np.int32)
    labels_pad[:num_gt] = labels
    valid = np.zeros(pad_to, bool)
    valid[:num_gt] = True
    return anchors, num_level, gts, labels, gts_pad, labels_pad, valid


def test_atss_assign_matches_oracle():
    for seed in range(4):
        (anchors, num_level, gts, labels, gts_pad, labels_pad,
         valid) = _make_problem(seed)
        assigner = ATSSAssigner(topk=9)
        res = jax.jit(
            lambda a, g, l, v: assigner.assign(a, num_level, g, l, v,
                                               num_classes=NUM_CLASSES)
        )(jnp.asarray(anchors), jnp.asarray(gts_pad), jnp.asarray(labels_pad),
          jnp.asarray(valid))
        want_gt, want_labels, _, _, _ = _oracle(anchors, num_level, gts,
                                                labels)
        got_gt = np.asarray(res.assigned_gt_inds)
        got_labels = np.asarray(res.labels)
        np.testing.assert_array_equal(got_gt, want_gt)
        np.testing.assert_array_equal(got_labels, want_labels)
        # positives' recorded overlap equals the true IoU with their gt
        iou = _iou_np(anchors, gts)
        pos = got_gt >= 0
        np.testing.assert_allclose(
            np.asarray(res.max_overlaps)[pos],
            iou[np.nonzero(pos)[0], got_gt[pos]], rtol=1e-5)


def test_vlr_region_matches_oracle():
    for seed in range(3):
        (anchors, num_level, gts, labels, gts_pad, labels_pad,
         valid) = _make_problem(seed)
        assigner = ATSSAssigner(topk=9)
        got = np.asarray(
            assigner.get_vlr_region(jnp.asarray(anchors), num_level,
                                    jnp.asarray(gts_pad), jnp.asarray(valid)))
        _, _, thr, _, _ = _oracle(anchors, num_level, gts, labels)
        want = _vlr_oracle(anchors, num_level, gts, thr)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        assert (got >= 0).all()


def test_atss_no_gt():
    anchors, num_level, *_ = _make_problem(0)
    assigner = ATSSAssigner(topk=9)
    gts_pad = jnp.zeros((10, 4))
    labels_pad = jnp.zeros(10, jnp.int32)
    valid = jnp.zeros(10, bool)
    res = assigner.assign(jnp.asarray(anchors), num_level, gts_pad,
                          labels_pad, valid, num_classes=NUM_CLASSES)
    assert not bool(res.pos_mask.any())
    assert (np.asarray(res.labels) == NUM_CLASSES).all()
    vlr = assigner.get_vlr_region(jnp.asarray(anchors), num_level, gts_pad,
                                  valid)
    assert float(jnp.abs(vlr).max()) == 0.0


def test_atss_invalid_anchor_mask():
    """Anchors masked invalid must never become positive."""
    (anchors, num_level, gts, labels, gts_pad, labels_pad,
     valid) = _make_problem(1)
    assigner = ATSSAssigner(topk=9)
    anchor_valid = np.ones(len(anchors), bool)
    anchor_valid[::2] = False
    res = assigner.assign(jnp.asarray(anchors), num_level,
                          jnp.asarray(gts_pad), jnp.asarray(labels_pad),
                          jnp.asarray(valid), jnp.asarray(anchor_valid),
                          num_classes=NUM_CLASSES)
    pos = np.asarray(res.pos_mask)
    assert not pos[::2].any()
    assert pos.sum() > 0  # odd anchors still assigned


def test_atss_batch_vmap():
    (anchors, num_level, gts, labels, gts_pad, labels_pad,
     valid) = _make_problem(2)
    assigner = ATSSAssigner(topk=9)
    B = 3
    gb = jnp.asarray(np.stack([gts_pad] * B))
    lb = jnp.asarray(np.stack([labels_pad] * B))
    vb = jnp.asarray(np.stack([valid] * B))
    res = jax.vmap(lambda g, l, v: assigner.assign(
        jnp.asarray(anchors), num_level, g, l, v, num_classes=NUM_CLASSES))(
            gb, lb, vb)
    assert res.labels.shape == (B, len(anchors))
    for i in range(1, B):
        np.testing.assert_array_equal(np.asarray(res.labels[0]),
                                      np.asarray(res.labels[i]))


def test_small_topk_matches_lax():
    from ld_tpu.ops.atss_assigner import _small_topk_min
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(13, 200).astype(np.float32))
    got = np.asarray(_small_topk_min(v, 9))
    _, want = jax.lax.top_k(-v, 9)
    np.testing.assert_array_equal(got, np.asarray(want))
