"""Sampler zoo: static-shape OHEM / instance-balanced / IoU-balanced /
Score-HLR selection semantics (reference: mmdet/core/bbox/samplers/)."""
import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.ops.samplers import (
    SAMPLERS, CombinedSampler, InstanceBalancedPosSampler,
    IoUBalancedNegSampler, OHEMSampler, PseudoSampler, RandomSampler,
    ScoreHLRSampler, build_sampler, select_topk_mask)

RNG = jax.random.PRNGKey(0)


def test_select_topk_mask_basic():
    keys = jnp.asarray([0.9, 0.1, 0.5, 0.7, 0.3])
    mask = jnp.asarray([True, True, False, True, True])
    sel, n = select_topk_mask(keys, mask, 2)
    assert int(n) == 2
    assert np.asarray(sel).tolist() == [True, False, False, True, False]
    # fewer candidates than k
    sel, n = select_topk_mask(keys, mask, 10)
    assert int(n) == 4


def test_random_sampler_counts():
    s = RandomSampler(num=16, pos_fraction=0.25)
    pos = jnp.arange(100) < 10     # 10 positives
    neg = ~pos
    ps, ns, w = s.sample(RNG, pos, neg)
    assert w is None
    assert int(ps.sum()) == 4      # num * pos_fraction
    assert int((ps & ~pos).sum()) == 0
    assert int(ns.sum()) == 12     # fills to num
    assert int((ns & pos).sum()) == 0


def test_instance_balanced_round_robin():
    # gt 0 has 30 candidates, gt 1 has 3; budget of 8 positives must take
    # all 3 of gt 1 (round-robin), never 8 from gt 0 alone.
    s = InstanceBalancedPosSampler(num=32, pos_fraction=0.25)
    gt_inds = jnp.asarray([0] * 30 + [1] * 3 + [-1] * 30)
    pos = gt_inds >= 0
    neg = ~pos
    ps, _, _ = s.sample(RNG, pos, neg, gt_inds=gt_inds)
    assert int(ps.sum()) == 8
    assert int(ps[30:33].sum()) == 3


def test_iou_balanced_bins():
    # negatives spread over IoU in [0, 0.3): with 3 bins and budget 9 the
    # selection must hit every bin instead of only the densest one.
    s = IoUBalancedNegSampler(num=9, pos_fraction=0.0, floor_thr=-1,
                              num_bins=3)
    iou = jnp.concatenate([jnp.full(40, 0.05), jnp.full(5, 0.15),
                           jnp.full(5, 0.28)])
    neg = jnp.ones(50, bool)
    pos = ~neg
    _, ns, _ = s.sample(RNG, pos, neg, max_overlaps=iou)
    ns = np.asarray(ns)
    assert ns.sum() == 9
    assert ns[:40].sum() == 3 and ns[40:45].sum() == 3 and ns[45:].sum() == 3


def test_iou_balanced_floor_quota():
    s = IoUBalancedNegSampler(num=10, pos_fraction=0.0, floor_thr=0.1,
                              floor_fraction=0.4, num_bins=2)
    iou = jnp.concatenate([jnp.zeros(50), jnp.full(50, 0.2)])
    neg = jnp.ones(100, bool)
    _, ns, _ = s.sample(RNG, ~neg, neg, max_overlaps=iou)
    ns = np.asarray(ns)
    assert ns.sum() == 10
    assert ns[:50].sum() == 4        # floor_fraction * num
    assert ns[50:].sum() == 6


def test_ohem_picks_hardest():
    s = OHEMSampler(num=8, pos_fraction=0.5)
    loss = jnp.arange(100, dtype=jnp.float32)
    pos = jnp.arange(100) < 50
    ps, ns, _ = s.sample(RNG, pos, ~pos, loss=loss)
    # hardest 4 positives are indices 46..49; hardest negs 96..99
    assert np.asarray(ps)[46:50].all() and np.asarray(ps).sum() == 4
    assert np.asarray(ns)[96:100].all() and np.asarray(ns).sum() == 4


def test_score_hlr_weights():
    s = ScoreHLRSampler(num=8, pos_fraction=0.25, score_thr=0.05, k=0.5)
    n = 40
    boxes = jnp.stack([jnp.arange(n, dtype=jnp.float32) * 50,
                       jnp.zeros(n), jnp.arange(n, dtype=jnp.float32) * 50
                       + 40, jnp.full(n, 40.0)], -1)  # disjoint boxes
    scores = jnp.linspace(0.0, 0.9, n)
    pos = jnp.zeros(n, bool)
    neg = ~pos
    ps, ns, w = s.sample(RNG, pos, neg, boxes=boxes, scores=scores)
    assert int(ns.sum()) == 8
    ns_np, w_np, sc = np.asarray(ns), np.asarray(w), np.asarray(scores)
    # hard (high-score) negatives sampled first
    assert sc[ns_np].min() >= np.sort(sc)[-10]
    # weights decay with importance rank and stay in (0, 1]
    sel_w = w_np[ns_np]
    assert (sel_w > 0).all() and (sel_w <= 1.0 + 1e-6).all()
    order = np.argsort(-sc[ns_np])
    assert (np.diff(sel_w[order]) <= 1e-6).all()


def test_combined_and_registry():
    s = build_sampler(dict(type='CombinedSampler'), num=16, pos_fraction=0.5)
    assert isinstance(s, CombinedSampler)
    assert isinstance(s.pos_sampler, InstanceBalancedPosSampler)
    assert isinstance(s.neg_sampler, IoUBalancedNegSampler)
    gt_inds = jnp.asarray([0] * 5 + [1] * 5 + [-1] * 40)
    pos = gt_inds >= 0
    ps, ns, _ = s.sample(RNG, pos, ~pos, gt_inds=gt_inds,
                         max_overlaps=jnp.zeros(50))
    assert int(ps.sum()) == 8 and int(ns.sum()) == 8
    for name in ('RandomSampler', 'OHEMSampler', 'ScoreHLRSampler',
                 'IoUBalancedNegSampler', 'InstanceBalancedPosSampler',
                 'CombinedSampler', 'PseudoSampler'):
        assert name in SAMPLERS


def test_pseudo_sampler_passthrough():
    pos = jnp.asarray([True, False, True])
    neg = jnp.asarray([False, True, False])
    ps, ns, w = PseudoSampler().sample(RNG, pos, neg)
    assert (ps == pos).all() and (ns == neg).all() and w is None


def test_sampler_jit_compatible():
    s = InstanceBalancedPosSampler(num=8, pos_fraction=0.5)

    @jax.jit
    def run(rng, gt_inds):
        pos = gt_inds >= 0
        return s.sample(rng, pos, ~pos, gt_inds=gt_inds)

    ps, ns, _ = run(RNG, jnp.asarray([0] * 3 + [1] * 3 + [-1] * 14))
    assert int(ps.sum()) == 4 and int(ns.sum()) == 4
