"""Static-shape bbox samplers (TPU-first re-design of mmdet's sampler zoo).

Reference semantics: /root/reference/mmdet/core/bbox/samplers/
  random_sampler.py, instance_balanced_pos_sampler.py (equal positives per
  gt instance), iou_balanced_neg_sampler.py:9 (Libra R-CNN: negatives spread
  evenly over IoU bins, with a `floor` quota of easy low-IoU negatives),
  ohem_sampler.py:9 (top-k by current classification loss),
  score_hlr_sampler.py:11 (negatives ranked by NMS-grouped score rank with
  linearly decayed label weights), combined_sampler.py:6.

The reference samplers return variable-length index tensors via `nonzero`;
that shape dynamism is hostile to XLA. Here every sampler is a pure
*key function*: it scores each candidate with a float key (higher = sampled
first) and selection is a single fixed-k `lax.top_k` over masked keys.
The selected set is returned as a boolean mask of the candidate axis, so all
downstream loss math stays dense.  Sampling without replacement uses the
Gumbel-top-k trick where the reference uses `randperm`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ld_tpu.ops.boxes import bbox_overlaps
from ld_tpu.utils.registry import Registry

SAMPLERS = Registry('bbox_sampler')

_NEG_INF = -1e9


def select_topk_mask(keys: jnp.ndarray, mask: jnp.ndarray, k: int):
    """Boolean mask of the top-k keys among `mask` candidates.

    Returns (selection_mask, n_selected). Never selects masked-out slots,
    selects fewer than k when fewer candidates exist.
    """
    keys = jnp.where(mask, keys, _NEG_INF)
    if k >= keys.shape[0]:
        return mask, mask.sum()
    kth = jnp.sort(keys)[::-1][k - 1] if k > 0 else jnp.inf
    sel = mask & (keys >= kth)
    # tie-break overflow (identical keys) deterministically by index
    overflow = jnp.cumsum(sel) > k
    sel = sel & ~overflow
    return sel, sel.sum()


def _uniform_keys(rng, shape):
    return jax.random.uniform(rng, shape)


def _rank_within_group(group_id: jnp.ndarray, rand: jnp.ndarray,
                       mask: jnp.ndarray) -> jnp.ndarray:
    """rank of each candidate inside its group under random order (0-based).

    O(N^2) pairwise comparison — N is the proposal count (~2k), fine on MXU.
    """
    same = (group_id[:, None] == group_id[None, :]) & mask[None, :]
    earlier = same & (rand[None, :] < rand[:, None])
    return earlier.sum(-1)


@SAMPLERS.register_module()
class RandomSampler:
    """Uniform random positives + negatives (the mmdet default)."""

    def __init__(self, num=512, pos_fraction=0.25, neg_pos_ub=-1,
                 add_gt_as_proposals=True, **kw):
        self.num = num
        self.pos_fraction = pos_fraction
        self.neg_pos_ub = neg_pos_ub
        self.add_gt_as_proposals = add_gt_as_proposals

    def pos_keys(self, rng, pos_mask, **kw):
        return _uniform_keys(rng, pos_mask.shape)

    def neg_keys(self, rng, neg_mask, **kw):
        return _uniform_keys(rng, neg_mask.shape)

    def sample(self, rng, pos_mask, neg_mask, **kw):
        """Returns (pos_sel, neg_sel, neg_label_weights|None)."""
        r1, r2 = jax.random.split(rng)
        num_pos_max = int(self.num * self.pos_fraction)
        pos_sel, n_pos = select_topk_mask(
            self.pos_keys(r1, pos_mask, **kw), pos_mask, num_pos_max)
        num_neg = jnp.asarray(self.num) - n_pos
        if self.neg_pos_ub >= 0:
            num_neg = jnp.minimum(num_neg, self.neg_pos_ub *
                                  jnp.maximum(n_pos, 1))
        keys = jnp.where(neg_mask, self.neg_keys(r2, neg_mask, **kw),
                         _NEG_INF)
        # dynamic-k top-k: keep negs whose rank < num_neg
        order = jnp.argsort(keys)[::-1]
        rank = jnp.empty_like(order).at[order].set(
            jnp.arange(order.shape[0]))
        neg_sel = neg_mask & (rank < num_neg)
        return pos_sel, neg_sel, None


@SAMPLERS.register_module()
class InstanceBalancedPosSampler(RandomSampler):
    """Equal number of positives per gt instance.

    Key = -(rank within own gt group) + U(0,1): candidates are consumed
    round-robin across instances, exactly the effect of the reference's
    per-gt `num_per_gt` quota loop.
    """

    def pos_keys(self, rng, pos_mask, gt_inds=None, **kw):
        rand = _uniform_keys(rng, pos_mask.shape)
        if gt_inds is None:
            return rand
        rank = _rank_within_group(gt_inds, rand, pos_mask)
        return -rank.astype(jnp.float32) + rand


@SAMPLERS.register_module()
class IoUBalancedNegSampler(RandomSampler):
    """Libra R-CNN IoU-balanced negatives.

    Non-floor negatives (IoU >= floor_thr) are keyed by their random rank
    *within their IoU bin*, so top-k consumes bins evenly; floor negatives
    get a `floor_fraction` quota of the budget via a key offset.
    """

    def __init__(self, num=512, pos_fraction=0.25, floor_thr=-1.,
                 floor_fraction=0., num_bins=3, **kw):
        super().__init__(num=num, pos_fraction=pos_fraction, **kw)
        self.floor_thr = floor_thr
        self.floor_fraction = floor_fraction
        self.num_bins = num_bins

    def neg_keys(self, rng, neg_mask, max_overlaps=None, **kw):
        rand = _uniform_keys(rng, neg_mask.shape)
        if max_overlaps is None:
            return rand
        floor = jnp.asarray(self.floor_thr, jnp.float32)
        in_floor = (max_overlaps < floor) & neg_mask if self.floor_thr >= 0 \
            else jnp.zeros_like(neg_mask)
        binned = neg_mask & ~in_floor
        max_iou = jnp.max(jnp.where(binned, max_overlaps, 0.0))
        lo = jnp.maximum(floor, 0.0)
        interval = jnp.maximum((max_iou - lo) / self.num_bins, 1e-6)
        bin_id = jnp.clip(((max_overlaps - lo) / interval).astype(jnp.int32),
                          0, self.num_bins - 1)
        rank = _rank_within_group(bin_id, rand, binned).astype(jnp.float32)
        # interleave bins: smaller within-bin rank wins
        key_binned = -rank + rand
        if self.floor_thr < 0:
            return jnp.where(binned, key_binned, _NEG_INF / 2)
        # floor candidates: float quota — the first
        # floor_fraction*num floor candidates outrank binned ones
        frand = _uniform_keys(jax.random.fold_in(rng, 1), neg_mask.shape)
        floor_rank = _rank_within_group(jnp.zeros_like(bin_id), frand,
                                        in_floor).astype(jnp.float32)
        quota = self.num * self.floor_fraction
        key_floor = jnp.where(floor_rank < quota, 1.0 + frand,
                              -1e4 - floor_rank)
        return jnp.where(in_floor, key_floor, key_binned)


@SAMPLERS.register_module()
class OHEMSampler(RandomSampler):
    """Online hard example mining: top-k by current per-candidate cls loss.

    The caller passes `loss` (per-candidate classification loss computed
    under stop_gradient with the current head); selection is then just a
    masked top-k — the natural static form of the reference's
    `loss.topk(num_expected)` (ohem_sampler.py:46).
    """

    def pos_keys(self, rng, pos_mask, loss=None, **kw):
        if loss is None:
            return _uniform_keys(rng, pos_mask.shape)
        return loss + 1e-4 * _uniform_keys(rng, pos_mask.shape)

    neg_keys = pos_keys


@SAMPLERS.register_module()
class ScoreHLRSampler(RandomSampler):
    """Score-based hard-negative sampling with decayed label weights.

    Static re-design of score_hlr_sampler.py:99-213: valid negatives
    (max fg score > score_thr) are grouped by overlap (IoU > iou_thr with a
    higher-scored candidate puts you in that candidate's group), importance
    = num_valid - rank_in_group + score, sampled by importance; label
    weights decay linearly with global importance rank, shaped by
    (bias + (1-bias)*w)**k.
    """

    def __init__(self, num=512, pos_fraction=0.25, score_thr=0.05,
                 iou_thr=0.5, bias=0., k=0.5, **kw):
        super().__init__(num=num, pos_fraction=pos_fraction, **kw)
        self.score_thr = score_thr
        self.iou_thr = iou_thr
        self.bias = bias
        self.k = k

    def neg_with_weights(self, rng, neg_mask, boxes=None, scores=None, **kw):
        """Returns (keys, label_weights) for the negative axis."""
        rand = _uniform_keys(rng, neg_mask.shape)
        if scores is None:
            return rand, jnp.ones_like(rand)
        valid = neg_mask & (scores > self.score_thr)
        n_valid = valid.sum()
        # group leader = highest-scored overlapping candidate
        iou = bbox_overlaps(boxes, boxes)
        stronger = (iou > self.iou_thr) & (scores[None, :] > scores[:, None])
        leader_score = jnp.max(
            jnp.where(stronger & valid[None, :], scores[None, :], -1.0), -1)
        leader_score = jnp.where(leader_score < 0, scores, leader_score)
        # rank within group approx: count of stronger overlapping candidates
        rank_in_group = (stronger & valid[None, :]).sum(-1)
        imp = jnp.where(valid,
                        n_valid.astype(jnp.float32) -
                        rank_in_group.astype(jnp.float32) + scores, _NEG_INF)
        order = jnp.argsort(imp)[::-1]
        imp_rank = jnp.empty_like(order).at[order].set(
            jnp.arange(order.shape[0])).astype(jnp.float32)
        up_bound = jnp.maximum(jnp.asarray(float(self.num)),
                               n_valid.astype(jnp.float32))
        w = jnp.clip((up_bound - imp_rank) / up_bound, 0.0, 1.0)
        w = (self.bias + (1.0 - self.bias) * w) ** self.k
        # invalid (easy) negatives: sampled after all valid ones, weight =
        # min valid weight (reference fills with imp_weights.min())
        keys = jnp.where(valid, 10.0 + imp, rand)
        w = jnp.where(valid, w, jnp.min(jnp.where(valid, w, 1.0)))
        return keys, jnp.where(neg_mask, w, 0.0)

    def sample(self, rng, pos_mask, neg_mask, **kw):
        r1, r2 = jax.random.split(rng)
        num_pos_max = int(self.num * self.pos_fraction)
        pos_sel, n_pos = select_topk_mask(
            _uniform_keys(r1, pos_mask.shape), pos_mask, num_pos_max)
        keys, weights = self.neg_with_weights(r2, neg_mask, **kw)
        keys = jnp.where(neg_mask, keys, _NEG_INF)
        order = jnp.argsort(keys)[::-1]
        rank = jnp.empty_like(order).at[order].set(
            jnp.arange(order.shape[0]))
        neg_sel = neg_mask & (rank < jnp.asarray(self.num) - n_pos)
        return pos_sel, neg_sel, weights


@SAMPLERS.register_module()
class CombinedSampler(RandomSampler):
    """Independent positive and negative sub-samplers."""

    def __init__(self, pos_sampler=None, neg_sampler=None, **kw):
        super().__init__(**kw)
        base = dict(num=self.num, pos_fraction=self.pos_fraction)
        self.pos_sampler = SAMPLERS.build({**base, **(pos_sampler or dict(
            type='InstanceBalancedPosSampler'))})
        self.neg_sampler = SAMPLERS.build({**base, **(neg_sampler or dict(
            type='IoUBalancedNegSampler'))})

    def pos_keys(self, rng, pos_mask, **kw):
        return self.pos_sampler.pos_keys(rng, pos_mask, **kw)

    def neg_keys(self, rng, neg_mask, **kw):
        return self.neg_sampler.neg_keys(rng, neg_mask, **kw)


@SAMPLERS.register_module()
class PseudoSampler:
    """No sampling: every assigned candidate is used (dense-head default)."""

    def __init__(self, **kw):
        pass

    def sample(self, rng, pos_mask, neg_mask, **kw):
        return pos_mask, neg_mask, None


def build_sampler(cfg, **default_args):
    cfg = dict(cfg or dict(type='RandomSampler'))
    for k, v in default_args.items():
        cfg.setdefault(k, v)
    return SAMPLERS.build(cfg)
