"""Test-time augmentation: multi-scale / flip inference with merged NMS.

Parity: /root/reference/mmdet/datasets/pipelines/test_time_aug.py
(MultiScaleFlipAug) + mmdet/core/post_processing/merge_augs.py +
dense_test_mixins.aug_test_bboxes — each augmented view is forwarded, its
raw (pre-NMS) boxes are mapped back to original image coordinates (unflip +
descale), all views' candidates are pooled, and ONE NMS produces the final
detections.

TPU shape discipline: every (scale, flip) view is its own padded static
shape, so each view's forward compiles once; the merge itself is a fixed-
size concat + the standard padded NMS.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.data.transforms import Compose, collate_batch
from ld_tpu.ops.nms import multiclass_nms


def build_aug_views(img: np.ndarray, img_scales: Sequence[Tuple[int, int]],
                    flip: bool, mean, std, to_rgb=True,
                    size_divisor: int = 32) -> List[Dict]:
    """Produce the augmented views of one raw (BGR uint8) image."""
    from ld_tpu.data.transforms import FusedPreprocess, RandomFlip
    views = []
    for scale in img_scales:
        for do_flip in ([False, True] if flip else [False]):
            results = dict(img=img.copy(), img_shape=img.shape,
                           ori_shape=img.shape)
            if do_flip:
                results = RandomFlip(flip_ratio=1.0)(results)
            results = FusedPreprocess(img_scale=scale,
                                      size_divisor=size_divisor, mean=mean,
                                      std=std, to_rgb=to_rgb)(results)
            results['flip'] = do_flip
            views.append(results)
    return views


def aug_test(detector, variables, views: List[Dict], ori_hw: Tuple[int, int],
             cfg=None) -> Dict:
    """Merged multi-view inference for ONE image.

    Args:
        views: outputs of `build_aug_views` (each with img/scale_factor/flip).
    Returns:
        dict(boxes (n, 5) in original-image coords, labels (n,)).
    """
    cfg = cfg or detector.bbox_head.test_cfg
    all_boxes, all_scores = [], []
    for v in views:
        h, w = v['img'].shape[:2]
        batch = collate_batch([v], (h, w), max_gts=1)
        outs = detector.apply(
            {'params': variables['params'],
             'batch_stats': variables.get('batch_stats', {})},
            jnp.asarray(batch['image']))
        boxes, scores = jax.tree_util.tree_map(
            lambda x: x[0],
            detector.bbox_head.get_bboxes(
                outs, jnp.asarray(batch['img_hw']), with_nms=False))
        # back to original coordinates: descale, then unflip
        boxes = boxes / jnp.asarray(v['scale_factor'])[None, :]
        if v.get('flip'):
            ow = ori_hw[1]
            x1 = ow - boxes[:, 2]
            x2 = ow - boxes[:, 0]
            boxes = jnp.stack([x1, boxes[:, 1], x2, boxes[:, 3]], -1)
        all_boxes.append(boxes)
        all_scores.append(scores)

    boxes = jnp.concatenate(all_boxes)
    scores = jnp.concatenate(all_scores)
    dets, labels, valid = multiclass_nms(
        boxes, scores, cfg.get('score_thr', 0.05),
        cfg.get('nms', {}).get('iou_threshold', 0.6),
        max_per_img=cfg.get('max_per_img', 100),
        max_candidates=2048)
    m = np.asarray(valid)
    return dict(boxes=np.asarray(dets)[m], labels=np.asarray(labels)[m])
