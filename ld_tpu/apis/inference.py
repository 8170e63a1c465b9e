"""Single-image inference API.

Parity: /root/reference/mmdet/apis/inference.py:16,83,183 (init_detector /
inference_detector / show_result). The test pipeline (keep-ratio resize to
(1333, 800), normalize, pad/32) runs on host; the forward+decode+NMS is one
jitted call, cached per padded input shape.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import jax
import numpy as np

from ld_tpu.data.transforms import Compose, collate_batch
from ld_tpu.models import build_detector
from ld_tpu.utils.checkpoint import load_torch_checkpoint, load_variables
from ld_tpu.utils.config import Config


def init_detector(config: Union[str, Config], checkpoint: Optional[str] = None,
                  rng_seed: int = 0):
    """Build a detector and its variables from a config (+ checkpoint)."""
    cfg = Config.fromfile(config) if isinstance(config, str) else config
    detector = build_detector(cfg.model, dtype=cfg.get('dtype'))
    if checkpoint is None:
        variables = detector.init_variables(jax.random.PRNGKey(rng_seed))
    elif checkpoint.endswith('.pth'):
        variables = load_torch_checkpoint(checkpoint)
        variables.pop('_unmapped', None)
    else:
        variables = load_variables(checkpoint)
    detector.cfg = cfg
    return detector, variables


_TEST_PIPELINE = [
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='Normalize', mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375], to_rgb=True),
    dict(type='Pad', size_divisor=32),
]


def inference_detector(detector, variables, img: Union[str, np.ndarray],
                       score_thr: float = 0.0,
                       pad_hw=((800, 1344), (1344, 800)),
                       img_scale: Optional[Tuple[int, int]] = None) -> Dict:
    """Detect objects in one image (path or BGR HWC array).

    img_scale: keep-ratio resize target (max_long, max_short); defaults to
    the mmdet test scale (1333, 800). Must fit inside `pad_hw` after /32
    padding; pad_hw may be one (H, W) or a list of static buckets (default:
    one per orientation — the smallest fitting bucket is used).

    Returns dict(boxes=(n, 5) xyxy+score in original image coords, labels).
    """
    if isinstance(img, str):
        import cv2
        img = cv2.imread(img)
    steps = [dict(t) for t in _TEST_PIPELINE]
    if img_scale is not None:
        steps[0]['img_scale'] = tuple(img_scale)
    pipeline = Compose(steps)
    results = pipeline(dict(img=img, img_shape=img.shape,
                            ori_shape=img.shape))
    batch = collate_batch([results], pad_hw, max_gts=1)

    @jax.jit
    def infer(variables, image, img_hw, scale_factor):
        return detector.forward_test(
            variables, dict(image=image, img_hw=img_hw,
                            scale_factor=scale_factor), rescale=True)

    dets, labels, valid = infer(
        variables, batch['image'], batch['img_hw'], batch['scale_factor'])
    dets = np.asarray(dets[0])
    labels = np.asarray(labels[0])
    valid = np.asarray(valid[0]) & (dets[:, 4] >= score_thr)
    return dict(boxes=dets[valid], labels=labels[valid])


def _load_img(img):
    import cv2
    if isinstance(img, str):
        loaded = cv2.imread(img)
        if loaded is None:  # cv2.imread returns None instead of raising
            raise FileNotFoundError(img)
        return loaded
    return img.copy()


def _draw_boxes(img, boxes, labels, color, class_names=None, scores=None):
    import cv2
    for i, (box, label) in enumerate(zip(boxes, labels)):
        x1, y1, x2, y2 = np.asarray(box[:4]).astype(int)
        cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
        name = class_names[int(label)] if class_names else str(int(label))
        if scores is not None:
            name = f'{name}:{scores[i]:.2f}'
        cv2.putText(img, name, (x1, max(y1 - 4, 0)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return img


def show_result(img: Union[str, np.ndarray], result: Dict, class_names=None,
                score_thr: float = 0.3, out_file: Optional[str] = None):
    """Draw detections. Parity: base.py:270 show_result /
    core/visualization/image.py imshow_det_bboxes."""
    import cv2
    img = _load_img(img)
    keep = np.asarray(result['boxes'])[:, 4] >= score_thr
    _draw_boxes(img, np.asarray(result['boxes'])[keep],
                np.asarray(result['labels'])[keep], (0, 255, 0),
                class_names, scores=np.asarray(result['boxes'])[keep, 4])
    if out_file:
        cv2.imwrite(out_file, img)
    return img


def imshow_gt_det_bboxes(img, annotation: Dict, result: Dict,
                         class_names=None, score_thr: float = 0.3,
                         out_file: Optional[str] = None):
    """GT (blue) + detections (green) on one image.

    Parity: /root/reference/mmdet/core/visualization/image.py:189
    (imshow_gt_det_bboxes, used by analyze_results/browse_dataset).
    """
    img = _load_img(img)
    _draw_boxes(img, annotation.get('bboxes', []),
                annotation.get('labels', []), (255, 144, 30), class_names)
    return show_result(img, result, class_names=class_names,
                       score_thr=score_thr, out_file=out_file)


async def async_inference_detector(detector, variables, img, **kwargs):
    """Async wrapper for concurrent-request serving.

    Parity: /root/reference/mmdet/apis/inference.py:149
    (async_inference_detector) — device execution is already asynchronous in
    JAX; this offloads the host-side pre/post-processing to the default
    executor so callers can pipeline requests.
    """
    import asyncio
    loop = asyncio.get_running_loop()
    return await loop.run_in_executor(
        None, lambda: inference_detector(detector, variables, img, **kwargs))
