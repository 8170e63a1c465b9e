"""Host-side image pipeline: dict-in/dict-out transforms.

Semantics parity with /root/reference/mmdet/datasets/pipelines/transforms.py
(Resize:26 keep-ratio, RandomFlip:319, Normalize:547, Pad:476) and
formating.py (Collect:251 img_metas contract) within fp tolerance:
  * Resize keep_ratio: factor = min(long/max(h,w), short/min(h,w)),
    new = int(dim * factor + 0.5), bilinear; boxes scaled and clipped.
  * Normalize: BGR->RGB then (x - mean) / std, float32.
  * Pad: zero-pad bottom/right to size_divisor (and to the static batch
    bucket — the TPU addition: every batch tensor has ONE shape so the jitted
    step never recompiles).

These run on host CPU per image; the collate step pads GTs to a fixed count
with a validity mask (static-shape contract of the ld_tpu heads).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ld_tpu.utils.registry import PIPELINES


@PIPELINES.register_module()
class LoadImageFromFile:
    # mmcv imfrombytes flag semantics
    # (/root/reference/mmdet/datasets/pipelines/loading.py:12 passes
    # color_type straight through): 'color' -> 3-ch BGR, 'grayscale' ->
    # 2-D single channel, 'unchanged' -> as stored (incl. alpha/16-bit);
    # *_ignore_orientation skips the EXIF rotation mmcv/cv2 apply by
    # default.
    _FLAGS = {
        'color': cv2.IMREAD_COLOR,
        'grayscale': cv2.IMREAD_GRAYSCALE,
        'unchanged': cv2.IMREAD_UNCHANGED,
        'color_ignore_orientation':
            cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION,
        'grayscale_ignore_orientation':
            cv2.IMREAD_GRAYSCALE | cv2.IMREAD_IGNORE_ORIENTATION,
    }

    def __init__(self, to_float32=False, color_type='color'):
        self.to_float32 = to_float32
        assert color_type in self._FLAGS, color_type
        self.color_type = color_type

    def __call__(self, results: Dict) -> Dict:
        path = results['img_info']['filename']
        if 'img_prefix' in results and results['img_prefix']:
            import os
            path = os.path.join(results['img_prefix'], path)
        img = cv2.imread(path, self._FLAGS[self.color_type])  # BGR, HWC
        if img is None:
            raise FileNotFoundError(path)
        if self.to_float32:
            img = img.astype(np.float32)
        results['img'] = img
        results['img_shape'] = img.shape
        results['ori_shape'] = img.shape
        return results


@PIPELINES.register_module()
class LoadAnnotations:
    def __init__(self, with_bbox=True, with_label=True, with_mask=False,
                 **kwargs):
        self.with_bbox = with_bbox
        self.with_label = with_label
        self.with_mask = with_mask

    def __call__(self, results: Dict) -> Dict:
        ann = results['ann_info']
        if self.with_bbox:
            results['gt_bboxes'] = ann['bboxes'].astype(np.float32)
        if self.with_label:
            results['gt_labels'] = ann['labels'].astype(np.int64)
        if self.with_mask and 'masks' in ann:
            # rasterize COCO polygons to full-res bitmaps (host side;
            # parity: mmdet PolygonMasks -> BitmapMasks via mmcv)
            h = results['img_info'].get('height',
                                        results.get('img_shape',
                                                    (0, 0))[0])
            w = results['img_info'].get('width',
                                        results.get('img_shape',
                                                    (0, 0))[1])
            masks = []
            for polys, box in zip(ann['masks'], ann['bboxes']):
                m = np.zeros((h, w), np.uint8)
                if polys:
                    pts = [np.asarray(p, np.float32).reshape(-1, 2)
                           .astype(np.int32) for p in polys if len(p) >= 6]
                    if pts:
                        cv2.fillPoly(m, pts, 1)
                else:  # fall back to the box region
                    x1, y1, x2, y2 = box.astype(int)
                    m[y1:y2, x1:x2] = 1
                masks.append(m)
            results['gt_masks'] = masks
        return results


def rescale_size(h: int, w: int, scale: Tuple[int, int]) -> float:
    long_side, short_side = max(scale), min(scale)
    return min(long_side / max(h, w), short_side / min(h, w))


@PIPELINES.register_module()
class Resize:
    def __init__(self, img_scale=(1333, 800), keep_ratio=True,
                 ratio_range=None, multiscale_mode='range',
                 override=False, bbox_clip_border=True):
        assert multiscale_mode in ('range', 'value')
        self.img_scale = img_scale
        self.keep_ratio = keep_ratio
        self.ratio_range = ratio_range
        self.multiscale_mode = multiscale_mode
        # reference transforms.py:186 `override`: a second Resize later in
        # the pipeline (DETR's crop->re-resize aug) resamples its own scale
        # instead of reusing the first Resize's. This stack never persists
        # 'scale' into results, so a later Resize always resamples; the
        # flag only marks intent / keeps reference configs loadable.
        self.override = override
        self.bbox_clip_border = bbox_clip_border

    def set_scale_override(self, scale) -> None:
        """Arm a THREAD-LOCAL one-image scale override (the DataLoader's
        per-image mstrain draw, data/loader.py). Thread-local so concurrent
        fetch workers — and any other consumer sharing this pipeline object
        — never see each other's scales; unlike the old re-arm-in-__init__
        approach it leaves the transform's own config untouched."""
        tls = getattr(self, '_tls', None)
        if tls is None:
            import threading
            tls = self._tls = threading.local()
        tls.scale = tuple(scale) if scale is not None else None

    def _sample_scale(self) -> Tuple[int, int]:
        """Reference Resize._random_scale semantics
        (mmdet/datasets/pipelines/transforms.py:119-186):
          * ratio_range set  -> single base scale x uniform ratio
          * list + 'range'   -> long/short edges each ~ randint over the
                                [min, max] of the two bounding scales
          * list + 'value'   -> uniform pick from the given scales
        A thread-local override (set_scale_override) wins over everything.
        """
        tls = getattr(self, '_tls', None)
        if tls is not None and getattr(tls, 'scale', None) is not None:
            return tls.scale
        if getattr(self, 'batch_scale', None) is not None:
            # set by DataLoader(batch_scales=...): every image in a batch
            # shares one sampled scale, so the batch pads to that scale's
            # bucket instead of the range maximum (TPU multi-scale training)
            return tuple(self.batch_scale)
        scale = self.img_scale
        if self.ratio_range is not None:
            if isinstance(scale, list):
                assert len(scale) == 1
                scale = scale[0]
            lo, hi = self.ratio_range
            r = np.random.random_sample() * (hi - lo) + lo
            return (int(scale[0] * r), int(scale[1] * r))
        if isinstance(scale, list):
            if self.multiscale_mode == 'range':
                assert len(scale) == 2, \
                    'range mode needs exactly two bounding scales'
                longs = [max(s) for s in scale]
                shorts = [min(s) for s in scale]
                return (int(np.random.randint(min(longs), max(longs) + 1)),
                        int(np.random.randint(min(shorts), max(shorts) + 1)))
            return tuple(scale[np.random.randint(len(scale))])
        return tuple(scale)

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        h, w = img.shape[:2]
        # reference parity (transforms.py:30-33): an explicit 'scale' in the
        # results dict (MultiScaleFlipAug / per-batch override) wins
        scale = (self._sample_scale() if self.override
                 else results.get('scale') or self._sample_scale())
        if self.keep_ratio:
            factor = rescale_size(h, w, scale)
            new_w, new_h = int(w * factor + 0.5), int(h * factor + 0.5)
        else:
            new_w, new_h = scale[0], scale[1]
        out = cv2.resize(img, (new_w, new_h),
                         interpolation=cv2.INTER_LINEAR)
        w_scale = new_w / w
        h_scale = new_h / h
        results['img'] = out
        results['img_shape'] = out.shape
        results['scale_factor'] = np.array(
            [w_scale, h_scale, w_scale, h_scale], np.float32)
        if 'gt_bboxes' in results:
            bb = results['gt_bboxes'] * results['scale_factor']
            if self.bbox_clip_border:
                bb[:, 0::2] = bb[:, 0::2].clip(0, new_w)
                bb[:, 1::2] = bb[:, 1::2].clip(0, new_h)
            results['gt_bboxes'] = bb
        if 'gt_masks' in results:
            results['gt_masks'] = [
                cv2.resize(m, (new_w, new_h),
                           interpolation=cv2.INTER_NEAREST)
                for m in results['gt_masks']
            ]
        return results


@PIPELINES.register_module()
class RandomFlip:
    def __init__(self, flip_ratio=0.5, direction='horizontal'):
        self.flip_ratio = flip_ratio or 0.0
        self.direction = direction

    def __call__(self, results: Dict) -> Dict:
        flip = np.random.rand() < self.flip_ratio
        results['flip'] = flip
        results['flip_direction'] = self.direction
        if not flip:
            return results
        horiz = self.direction == 'horizontal'
        sl = (slice(None), slice(None, None, -1)) if horiz \
            else (slice(None, None, -1), )
        results['img'] = np.ascontiguousarray(results['img'][sl])
        if 'gt_bboxes' in results:
            bb = results['gt_bboxes'].copy()
            if horiz:
                w = results['img_shape'][1]
                bb[:, 0] = w - results['gt_bboxes'][:, 2]
                bb[:, 2] = w - results['gt_bboxes'][:, 0]
            else:
                h = results['img_shape'][0]
                bb[:, 1] = h - results['gt_bboxes'][:, 3]
                bb[:, 3] = h - results['gt_bboxes'][:, 1]
            results['gt_bboxes'] = bb
        if 'gt_masks' in results:
            results['gt_masks'] = [np.ascontiguousarray(m[sl])
                                   for m in results['gt_masks']]
        return results


@PIPELINES.register_module()
class Normalize:
    def __init__(self, mean, std, to_rgb=True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results: Dict) -> Dict:
        # bit-parity with mmcv.imnormalize_ (used by the reference Normalize,
        # mmdet/datasets/pipelines/transforms.py:547): BGR->RGB via cv2, then
        # cv2.subtract(float64 mean) and cv2.multiply(float64 1/std) on the
        # float32 image — NOT numpy float32 (img-mean)/std, whose last-ulp
        # rounding differs from cv2's widened arithmetic
        img = np.ascontiguousarray(results['img'], np.float32)
        mean = np.float64(self.mean.reshape(1, -1))
        stdinv = 1.0 / np.float64(self.std.reshape(1, -1))
        if self.to_rgb:
            cv2.cvtColor(img, cv2.COLOR_BGR2RGB, img)
        cv2.subtract(img, mean, img)
        cv2.multiply(img, stdinv, img)
        results['img'] = img
        results['img_norm_cfg'] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results


@PIPELINES.register_module()
class Pad:
    def __init__(self, size=None, size_divisor=32, pad_val=0):
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        h, w = img.shape[:2]
        if self.size is not None:
            th, tw = self.size
        else:
            d = self.size_divisor
            th, tw = ((h + d - 1) // d) * d, ((w + d - 1) // d) * d
        out = np.full((th, tw) + img.shape[2:], self.pad_val, img.dtype)
        out[:h, :w] = img
        results['img'] = out
        results['pad_shape'] = out.shape
        return results


@PIPELINES.register_module()
class PhotoMetricDistortion:
    """Brightness/contrast/saturation/hue jitter.

    Parity: /root/reference/mmdet/datasets/pipelines/transforms.py:810.
    """

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta

    def __call__(self, results):
        img = results['img'].astype(np.float32)
        if np.random.randint(2):
            img += np.random.uniform(-self.brightness_delta,
                                     self.brightness_delta)
        mode = np.random.randint(2)
        if mode == 1 and np.random.randint(2):
            img *= np.random.uniform(*self.contrast_range)
        hsv = cv2.cvtColor(img.clip(0, 255).astype(np.uint8),
                           cv2.COLOR_BGR2HSV).astype(np.float32)
        if np.random.randint(2):
            hsv[..., 1] *= np.random.uniform(*self.saturation_range)
        if np.random.randint(2):
            hsv[..., 0] = (hsv[..., 0] +
                           np.random.uniform(-self.hue_delta,
                                             self.hue_delta)) % 180
        img = cv2.cvtColor(hsv.clip(0, 255).astype(np.uint8),
                           cv2.COLOR_HSV2BGR).astype(np.float32)
        if mode == 0 and np.random.randint(2):
            img *= np.random.uniform(*self.contrast_range)
        results['img'] = img
        return results


@PIPELINES.register_module()
class Collect:
    def __init__(self, keys=('img', 'gt_bboxes', 'gt_labels'), meta_keys=()):
        self.keys = keys

    def __call__(self, results: Dict) -> Dict:
        out = {k: results[k] for k in self.keys if k in results}
        if 'gt_masks' in results and 'gt_masks' in self.keys:
            out['gt_masks'] = results['gt_masks']
        out['img_shape'] = results.get('img_shape')
        out['ori_shape'] = results.get('ori_shape')
        out['pad_shape'] = results.get('pad_shape', results.get('img_shape'))
        out['scale_factor'] = results.get(
            'scale_factor', np.ones(4, np.float32))
        out['img_id'] = results.get('img_info', {}).get('id', -1)
        return out


@PIPELINES.register_module()
class RandomCrop:
    """Random crop with box filtering.

    Parity: /root/reference/mmdet/datasets/pipelines/transforms.py:588."""

    def __init__(self, crop_size, crop_type='absolute',
                 allow_negative_crop=False):
        assert crop_type in ('absolute', 'absolute_range', 'relative',
                             'relative_range')
        self.crop_size = crop_size  # (h, w)
        self.crop_type = crop_type
        self.allow_negative_crop = allow_negative_crop

    def _sample_crop(self, h, w):
        """Reference transforms.py:700 _get_crop_size semantics."""
        a, b = self.crop_size
        if self.crop_type == 'absolute':
            return min(int(a), h), min(int(b), w)
        if self.crop_type == 'absolute_range':
            assert a <= b
            ch = np.random.randint(min(h, a), min(h, b) + 1)
            cw = np.random.randint(min(w, a), min(w, b) + 1)
            return ch, cw
        if self.crop_type == 'relative':
            return int(h * a + 0.5), int(w * b + 0.5)
        # relative_range
        ch = a + np.random.rand() * (1 - a)
        cw = b + np.random.rand() * (1 - b)
        return int(h * ch + 0.5), int(w * cw + 0.5)

    def __call__(self, results):
        img = results['img']
        h, w = img.shape[:2]
        ch, cw = self._sample_crop(h, w)
        y0 = np.random.randint(0, h - ch + 1)
        x0 = np.random.randint(0, w - cw + 1)
        results['img'] = img[y0:y0 + ch, x0:x0 + cw]
        results['img_shape'] = results['img'].shape
        keep = None
        if 'gt_bboxes' in results:
            bb = results['gt_bboxes'] - np.asarray(
                [x0, y0, x0, y0], np.float32)
            bb[:, 0::2] = bb[:, 0::2].clip(0, cw)
            bb[:, 1::2] = bb[:, 1::2].clip(0, ch)
            keep = (bb[:, 2] > bb[:, 0]) & (bb[:, 3] > bb[:, 1])
            if not keep.any() and not self.allow_negative_crop:
                return None
            results['gt_bboxes'] = bb[keep]
            if 'gt_labels' in results:
                results['gt_labels'] = results['gt_labels'][keep]
        if 'gt_masks' in results:
            masks = [m[y0:y0 + ch, x0:x0 + cw] for m in results['gt_masks']]
            if keep is not None:
                masks = [m for m, k in zip(masks, keep) if k]
            results['gt_masks'] = masks
        return results


@PIPELINES.register_module()
class Expand:
    """Place the image on a larger mean-filled canvas (SSD aug).

    Parity: /root/reference/mmdet/datasets/pipelines/transforms.py:916."""

    def __init__(self, mean=(0, 0, 0), to_rgb=True, ratio_range=(1, 4),
                 prob=0.5):
        self.mean = np.asarray(mean)
        self.ratio_range = ratio_range
        self.prob = prob

    def __call__(self, results):
        if np.random.rand() > self.prob:
            return results
        img = results['img']
        h, w, c = img.shape
        ratio = np.random.uniform(*self.ratio_range)
        nh, nw = int(h * ratio), int(w * ratio)
        canvas = np.full((nh, nw, c), self.mean,
                         img.dtype) if img.dtype != np.uint8 else \
            np.full((nh, nw, c), self.mean.astype(np.uint8), np.uint8)
        y0 = np.random.randint(0, nh - h + 1)
        x0 = np.random.randint(0, nw - w + 1)
        canvas[y0:y0 + h, x0:x0 + w] = img
        results['img'] = canvas
        results['img_shape'] = canvas.shape
        if 'gt_bboxes' in results:
            results['gt_bboxes'] = results['gt_bboxes'] + np.asarray(
                [x0, y0, x0, y0], np.float32)
        return results


@PIPELINES.register_module()
class MinIoURandomCrop:
    """Crop keeping boxes above a sampled min-IoU with the crop (SSD aug).

    Parity: /root/reference/mmdet/datasets/pipelines/transforms.py:1008."""

    def __init__(self, min_ious=(0.1, 0.3, 0.5, 0.7, 0.9), min_crop_size=0.3,
                 max_attempts=50):
        self.sample_modes = (1, *min_ious, 0)
        self.min_crop_size = min_crop_size
        self.max_attempts = max_attempts

    def __call__(self, results):
        img = results['img']
        h, w = img.shape[:2]
        boxes = results.get('gt_bboxes', np.zeros((0, 4), np.float32))
        while True:
            mode = self.sample_modes[np.random.randint(
                len(self.sample_modes))]
            if mode == 1:
                return results
            for _ in range(self.max_attempts):
                cw = np.random.uniform(self.min_crop_size * w, w)
                ch = np.random.uniform(self.min_crop_size * h, h)
                if ch / cw < 0.5 or ch / cw > 2:
                    continue
                x0 = np.random.uniform(0, w - cw)
                y0 = np.random.uniform(0, h - ch)
                patch = np.asarray([x0, y0, x0 + cw, y0 + ch])
                if len(boxes):
                    lt = np.maximum(boxes[:, :2], patch[:2])
                    rb = np.minimum(boxes[:, 2:], patch[2:])
                    inter = np.clip(rb - lt, 0, None).prod(1)
                    area = (boxes[:, 2] - boxes[:, 0]) * \
                        (boxes[:, 3] - boxes[:, 1])
                    ious = inter / np.maximum(area, 1e-6)
                    if ious.min() < mode:
                        continue
                    cx = (boxes[:, 0] + boxes[:, 2]) / 2
                    cy = (boxes[:, 1] + boxes[:, 3]) / 2
                    keep = (cx > patch[0]) & (cx < patch[2]) & \
                        (cy > patch[1]) & (cy < patch[3])
                    if not keep.any():
                        continue
                    bb = boxes[keep].copy()
                    bb[:, 0::2] = bb[:, 0::2].clip(patch[0], patch[2])
                    bb[:, 1::2] = bb[:, 1::2].clip(patch[1], patch[3])
                    bb -= np.asarray([patch[0], patch[1], patch[0],
                                      patch[1]], np.float32)
                    results['gt_bboxes'] = bb.astype(np.float32)
                    if 'gt_labels' in results:
                        results['gt_labels'] = results['gt_labels'][keep]
                results['img'] = img[int(patch[1]):int(patch[3]),
                                     int(patch[0]):int(patch[2])]
                results['img_shape'] = results['img'].shape
                return results


@PIPELINES.register_module()
class CutOut:
    """Random rectangular dropout.

    Parity: /root/reference/mmdet/datasets/pipelines/transforms.py:1741."""

    def __init__(self, n_holes, cutout_shape=None, cutout_ratio=None,
                 fill_in=(0, 0, 0)):
        self.n_holes = n_holes if isinstance(n_holes, tuple) else \
            (n_holes, n_holes)
        self.cutout_shape = cutout_shape
        self.cutout_ratio = cutout_ratio
        self.fill_in = fill_in

    def __call__(self, results):
        img = results['img']
        h, w = img.shape[:2]
        n = np.random.randint(self.n_holes[0], self.n_holes[1] + 1)
        for _ in range(n):
            if self.cutout_ratio is not None:
                ch = int(h * self.cutout_ratio[0])
                cw = int(w * self.cutout_ratio[1])
            else:
                ch, cw = self.cutout_shape
            y0 = np.random.randint(0, h)
            x0 = np.random.randint(0, w)
            img[y0:y0 + ch, x0:x0 + cw] = self.fill_in
        results['img'] = img
        return results


@PIPELINES.register_module()
class FusedPreprocess:
    """Resize(keep_ratio) + BGR->RGB + Normalize + Pad in ONE native pass
    (ld_tpu/native/image_prep.cpp), falling back to the separate transforms.

    Drop-in replacement for the standard [Resize, Normalize, Pad] tail; the
    host input feed is the bottleneck on CPU-poor hosts and this halves its
    memory traffic.
    """

    def __init__(self, img_scale=(1333, 800), size_divisor=32,
                 mean=(123.675, 116.28, 103.53),
                 std=(58.395, 57.12, 57.375), to_rgb=True,
                 ratio_range=None, multiscale_mode='range'):
        self.img_scale = img_scale
        self.size_divisor = size_divisor
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb
        # scale sampling (single / value / range / ratio_range modes) is
        # shared with Resize; the native kernel only needs the sampled target
        self._scale_sampler = Resize(img_scale=img_scale, keep_ratio=True,
                                     ratio_range=ratio_range,
                                     multiscale_mode=multiscale_mode)
        self._fallback = Compose([
            self._scale_sampler,
            Normalize(mean, std, to_rgb),
            Pad(size_divisor=size_divisor),
        ])

    def __call__(self, results: Dict) -> Dict:
        from ld_tpu.native.build import load_imageprep
        lib = load_imageprep()
        img = results['img']
        if lib is None or img.dtype != np.uint8:
            return self._fallback(results)
        import ctypes
        h, w = img.shape[:2]
        factor = rescale_size(h, w, results.get('scale')
                              or self._scale_sampler._sample_scale())
        new_w, new_h = int(w * factor + 0.5), int(h * factor + 0.5)
        d = self.size_divisor
        dh = ((new_h + d - 1) // d) * d
        dw = ((new_w + d - 1) // d) * d
        out = np.empty((dh, dw, 3), np.float32)
        src = np.ascontiguousarray(img)
        lib.image_prep(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw,
            new_h, new_w,
            self.mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            1 if self.to_rgb else 0)
        w_scale = new_w / w
        h_scale = new_h / h
        results['img'] = out
        results['img_shape'] = (new_h, new_w, 3)
        results['pad_shape'] = out.shape
        results['scale_factor'] = np.array(
            [w_scale, h_scale, w_scale, h_scale], np.float32)
        if 'gt_bboxes' in results:
            bb = results['gt_bboxes'] * results['scale_factor']
            bb[:, 0::2] = bb[:, 0::2].clip(0, new_w)
            bb[:, 1::2] = bb[:, 1::2].clip(0, new_h)
            results['gt_bboxes'] = bb
        if 'gt_masks' in results:
            results['gt_masks'] = [
                cv2.resize(m, (new_w, new_h),
                           interpolation=cv2.INTER_NEAREST)
                for m in results['gt_masks']
            ]
        return results


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = []
        for t in transforms:
            if isinstance(t, dict):
                self.transforms.append(PIPELINES.build(dict(t)))
            else:
                self.transforms.append(t)

    def __call__(self, results):
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results


def select_pad_bucket(pad_hw, batch_max_hw: Tuple[int, int]):
    """Pick the smallest static pad bucket that fits the batch.

    `pad_hw` is one (H, W) shape or a list of them (shape buckets). With
    buckets, the jitted step compiles once per bucket — bounded
    recompilation — and multi-scale batches resized well below the max
    scale stop paying max-shape conv FLOPs (the TPU answer to the
    reference's per-batch dynamic pad at transforms.py:476, which a traced
    program cannot have).
    """
    if isinstance(pad_hw[0], (tuple, list)):
        h, w = batch_max_hw
        fits = [(bh * bw, (bh, bw)) for bh, bw in pad_hw
                if bh >= h and bw >= w]
        if not fits:
            raise ValueError(
                f'no pad bucket in {list(pad_hw)} fits batch max {h}x{w}')
        return min(fits)[1]
    return tuple(pad_hw)


def collate_batch(samples: List[Dict], pad_hw: Tuple[int, int],
                  max_gts: int = 100,
                  mask_stride: int = 4) -> Dict[str, np.ndarray]:
    """Stack per-image dicts into one static-shape batch.

    Images are zero-padded to `pad_hw` (one shape, or a list of shape
    buckets — the smallest fitting one is used); GT boxes/labels padded to
    `max_gts` with a validity mask. `img_hw` carries the true (resized,
    un-padded) image shape used for anchor valid-flags and box clipping.
    """
    b = len(samples)
    th, tw = select_pad_bucket(
        pad_hw, (max(s['img'].shape[0] for s in samples),
                 max(s['img'].shape[1] for s in samples)))
    images = np.zeros((b, th, tw, 3), np.float32)
    gt_bboxes = np.zeros((b, max_gts, 4), np.float32)
    gt_labels = np.zeros((b, max_gts), np.int32)
    gt_valid = np.zeros((b, max_gts), bool)
    img_hw = np.zeros((b, 2), np.float32)
    scale_factor = np.ones((b, 4), np.float32)
    img_ids = np.zeros((b, ), np.int64)
    for i, s in enumerate(samples):
        img = s['img']
        h, w = img.shape[:2]
        assert h <= th and w <= tw, (img.shape, pad_hw)
        images[i, :h, :w] = img
        img_hw[i] = s['img_shape'][:2]
        scale_factor[i] = s.get('scale_factor', np.ones(4, np.float32))
        img_ids[i] = s.get('img_id', -1)
        if 'gt_bboxes' in s:
            n = min(len(s['gt_bboxes']), max_gts)
            gt_bboxes[i, :n] = s['gt_bboxes'][:n]
            gt_labels[i, :n] = s['gt_labels'][:n]
            gt_valid[i, :n] = True
    out = dict(image=images, gt_bboxes=gt_bboxes, gt_labels=gt_labels,
               gt_valid=gt_valid, img_hw=img_hw, scale_factor=scale_factor,
               img_ids=img_ids)
    if any('gt_masks' in s for s in samples):
        # masks ride at 1/mask_stride resolution (Mask R-CNN branch; crops
        # per sampled roi happen on device via roi_align)
        mh, mw = th // mask_stride, tw // mask_stride
        gt_masks = np.zeros((b, max_gts, mh, mw), np.float32)
        for i, s in enumerate(samples):
            for g, m in enumerate(s.get('gt_masks', [])[:max_gts]):
                # place the mask in the padded frame, then downsample
                canvas = np.zeros((th, tw), np.uint8)
                canvas[:m.shape[0], :m.shape[1]] = m
                gt_masks[i, g] = cv2.resize(
                    canvas, (mw, mh), interpolation=cv2.INTER_NEAREST)
        out['gt_masks'] = gt_masks
    return out


@PIPELINES.register_module()
class Albu:
    """Albumentations bridge (mmdet pipelines/transforms.py:1192).

    The albumentations package is an optional dependency (not bundled on
    this image); construction is gated with a clear error so configs that
    reference it fail loudly rather than silently skipping augmentation.
    """

    def __init__(self, transforms, bbox_params=None, keymap=None,
                 update_pad_shape=False, skip_img_without_anno=False):
        try:
            import albumentations  # noqa: F401
        except ImportError as e:
            raise ImportError(
                'Albu requires the optional `albumentations` package; '
                'install it or drop the Albu transform from the pipeline.'
            ) from e
        from albumentations import Compose as ACompose
        self.keymap = keymap or dict(img='image', gt_bboxes='bboxes')
        self.aug = ACompose([self._build(t) for t in transforms],
                            bbox_params=bbox_params)

    @staticmethod
    def _build(cfg):
        import albumentations
        cfg = dict(cfg)
        t = getattr(albumentations, cfg.pop('type'))
        return t(**cfg)

    def __call__(self, results):
        mapped = {self.keymap.get(k, k): v for k, v in results.items()
                  if k in self.keymap}
        out = self.aug(**mapped)
        inv = {v: k for k, v in self.keymap.items()}
        results.update({inv.get(k, k): v for k, v in out.items()})
        return results


@PIPELINES.register_module()
class InstaBoost:
    """InstaBoost bridge (mmdet pipelines/instaboost.py) — gated on the
    optional `instaboostfast` package, same policy as Albu."""

    def __init__(self, **kwargs):
        try:
            import instaboostfast  # noqa: F401
        except ImportError as e:
            raise ImportError(
                'InstaBoost requires the optional `instaboostfast` '
                'package.') from e
        import instaboostfast
        self.cfg = instaboostfast.InstaBoostConfig(**kwargs) \
            if kwargs else None

    def __call__(self, results):
        import instaboostfast
        anns = results.get('ann_info')
        img = results['img']
        anns, img = instaboostfast.get_new_data(anns, img, self.cfg,
                                                background=None)
        results['ann_info'] = anns
        results['img'] = img
        return results


# ---------------------------------------------------------------------------
# Formatting + aux transforms (reference pipelines/formating.py, loading.py,
# test_time_aug.py). The torch-specific ones are layout adapters here: the
# TPU stack keeps HWC numpy throughout the host pipeline (NHWC is the native
# TPU conv layout — there is no CHW tensor conversion step to perform).
# ---------------------------------------------------------------------------

@PIPELINES.register_module()
class DefaultFormatBundle:
    """Reference formating.py:174 — to-tensor + CHW + DataContainer wrap.
    Here: ensure float32 img and contiguous annotation arrays (NHWC stays)."""

    def __call__(self, results: Dict) -> Dict:
        if 'img' in results:
            results['img'] = np.ascontiguousarray(
                results['img'].astype(np.float32))
        for k in ('gt_bboxes', 'gt_bboxes_ignore'):
            if k in results:
                results[k] = np.asarray(results[k], np.float32)
        if 'gt_labels' in results:
            results['gt_labels'] = np.asarray(results['gt_labels'],
                                              np.int64)
        return results


@PIPELINES.register_module()
class ImageToTensor:
    """Reference formating.py:66 HWC->CHW tensor. NHWC is the TPU layout;
    accepted as a no-op for config compatibility."""

    def __init__(self, keys=('img', )):
        self.keys = keys

    def __call__(self, results: Dict) -> Dict:
        return results


@PIPELINES.register_module()
class ToTensor(ImageToTensor):
    pass


@PIPELINES.register_module()
class ToDataContainer(ImageToTensor):
    pass


@PIPELINES.register_module()
class WrapFieldsToLists(ImageToTensor):
    pass


@PIPELINES.register_module()
class Transpose:
    """Reference formating.py Transpose — explicit axis permutation."""

    def __init__(self, keys, order):
        self.keys = keys
        self.order = order

    def __call__(self, results: Dict) -> Dict:
        for k in self.keys:
            results[k] = results[k].transpose(self.order)
        return results


@PIPELINES.register_module()
class SegRescale:
    """Rescale gt_semantic_seg by scale_factor (reference transforms.py:772;
    HTC's 1/8-resolution semantic branch)."""

    def __init__(self, scale_factor=1, **kwargs):
        self.scale_factor = scale_factor

    def __call__(self, results: Dict) -> Dict:
        if self.scale_factor != 1 and 'gt_semantic_seg' in results:
            seg = results['gt_semantic_seg']
            h, w = seg.shape[:2]
            results['gt_semantic_seg'] = cv2.resize(
                seg, (int(w * self.scale_factor), int(h * self.scale_factor)),
                interpolation=cv2.INTER_NEAREST)
        return results


@PIPELINES.register_module()
class LoadProposals:
    """Reference loading.py:388 — clip precomputed proposals to (n, 4) and
    cap at num_max_proposals."""

    def __init__(self, num_max_proposals=None):
        self.num_max_proposals = num_max_proposals

    def __call__(self, results: Dict) -> Dict:
        proposals = np.asarray(results['proposals'], np.float32)
        if proposals.shape[1] not in (4, 5):
            raise AssertionError(
                f'proposals should be (n, 4|5) but got {proposals.shape}')
        proposals = proposals[:, :4]
        if self.num_max_proposals is not None:
            proposals = proposals[:self.num_max_proposals]
        if len(proposals) == 0:
            proposals = np.array([[0, 0, 0, 0]], np.float32)
        results['proposals'] = proposals
        return results


@PIPELINES.register_module()
class FilterAnnotations:
    """Reference loading.py:433 — drop GT boxes smaller than min_gt_bbox_wh;
    the whole sample is dropped (None) when nothing survives."""

    def __init__(self, min_gt_bbox_wh):
        self.min_gt_bbox_wh = min_gt_bbox_wh

    def __call__(self, results: Dict):
        bb = results['gt_bboxes']
        keep = ((bb[:, 2] - bb[:, 0]) > self.min_gt_bbox_wh[0]) & \
               ((bb[:, 3] - bb[:, 1]) > self.min_gt_bbox_wh[1])
        if not keep.any():
            return None
        for key in ('gt_bboxes', 'gt_labels'):
            if key in results:
                results[key] = results[key][keep]
        if 'gt_masks' in results:
            results['gt_masks'] = [m for m, k in
                                   zip(results['gt_masks'], keep) if k]
        return results


@PIPELINES.register_module()
class MultiScaleFlipAug:
    """Reference test_time_aug.py:10. Single (scale, no-flip) — the standard
    test pipeline — applies the wrapped transforms once, in place. Multiple
    views return the first view with the full list under 'aug_views'
    (consumed by ld_tpu.apis.aug_test for merged-NMS TTA)."""

    def __init__(self, transforms, img_scale=None, flip=False,
                 flip_direction='horizontal', scale_factor=None):
        # the wrapped pipeline is static — build ONCE, not per sample/view
        self.pipeline = Compose([dict(t) if isinstance(t, dict) else t
                                 for t in transforms])
        scales = img_scale if isinstance(img_scale, list) else [img_scale]
        self.img_scales = [tuple(s) if s else None for s in scales]
        self.flip = flip
        self.flip_direction = flip_direction
        self.scale_factor = scale_factor
        if len(self.img_scales) > 1 or flip:
            import warnings
            warnings.warn(
                'MultiScaleFlipAug with multiple views: the standard '
                'batched eval path consumes only the first (unflipped) '
                "view; run true TTA through ld_tpu.apis.aug_test, which "
                "reads the 'aug_views' list this transform attaches.",
                stacklevel=2)

    def __call__(self, results: Dict) -> Dict:
        import copy
        views = []
        for scale in self.img_scales:
            for do_flip in ([False, True] if self.flip else [False]):
                r = copy.deepcopy(results)
                if scale is not None:
                    r['scale'] = scale
                if do_flip:
                    r = RandomFlip(flip_ratio=1.0,
                                   direction=self.flip_direction)(r)
                r = self.pipeline(r)
                r['flip'] = do_flip
                views.append(r)
        out = views[0]
        if len(views) > 1:
            out['aug_views'] = views
        return out


@PIPELINES.register_module()
class RandomCenterCropPad:
    """CornerNet-style random center crop with around-padding.

    Parity: /root/reference/mmdet/datasets/pipelines/transforms.py:1396 —
    train: pick ratio from `ratios`, target = ratio * crop_size, pick a
    random center away from the borders, paste the overlapping region onto a
    mean-filled canvas with centers aligned, keep boxes whose centers fall
    in the patch; test: pad around the center to `test_pad_mode`
    ('logical_or' with 127 -> CornerNet's h|127, or 'size_divisor').
    The canvas fill uses the NORMALIZE mean in the image's current channel
    order (this transform runs before Normalize, on raw BGR pixels).
    """

    def __init__(self, crop_size=None, ratios=(0.9, 1.0, 1.1), border=128,
                 mean=None, std=None, to_rgb=None, test_mode=False,
                 test_pad_mode=('logical_or', 127), bbox_clip_border=True):
        assert mean is not None and std is not None and to_rgb is not None
        self.crop_size = crop_size
        self.ratios = ratios
        self.border = border
        # image is BGR at this pipeline stage; flip the (RGB-order) mean
        self.fill = np.asarray(mean[::-1] if to_rgb else mean, np.float32)
        self.test_mode = test_mode
        self.test_pad_mode = test_pad_mode
        self.bbox_clip_border = bbox_clip_border

    @staticmethod
    def _rand_border(border, size):
        # shrink the exclusion border for small images so the center range
        # stays non-empty (reference _get_border)
        k = 2 * border / size
        i = pow(2, np.ceil(np.log2(np.ceil(k))) + (k == int(k)))
        return int(border // i)

    def _paste(self, img, cy, cx, th, tw):
        h, w, c = img.shape
        x0, x1 = max(0, cx - tw // 2), min(cx + tw // 2, w)
        y0, y1 = max(0, cy - th // 2), min(cy + th // 2, h)
        canvas = np.empty((th, tw, c), img.dtype)
        canvas[:] = self.fill
        ccy, ccx = th // 2, tw // 2
        canvas[ccy - (cy - y0):ccy + (y1 - cy),
               ccx - (cx - x0):ccx + (x1 - cx)] = img[y0:y1, x0:x1]
        return canvas, (x0, y0, x1, y1)

    def _train(self, results):
        img = results['img']
        h, w = img.shape[:2]
        boxes = results.get('gt_bboxes', np.zeros((0, 4), np.float32))
        hb = self._rand_border(self.border, h)
        wb = self._rand_border(self.border, w)
        for _ in range(200):
            ratio = self.ratios[np.random.randint(len(self.ratios))]
            th = int(self.crop_size[0] * ratio)
            tw = int(self.crop_size[1] * ratio)
            cx = int(np.random.randint(wb, max(w - wb, wb + 1)))
            cy = int(np.random.randint(hb, max(h - hb, hb + 1)))
            canvas, (x0, y0, x1, y1) = self._paste(img, cy, cx, th, tw)
            centers = (boxes[:, :2] + boxes[:, 2:]) / 2
            mask = ((centers[:, 0] > x0) & (centers[:, 0] < x1) &
                    (centers[:, 1] > y0) & (centers[:, 1] < y1))
            if len(boxes) > 0 and not mask.any():
                continue
            results['img'] = canvas
            results['img_shape'] = canvas.shape
            results['pad_shape'] = canvas.shape
            shift_x = tw // 2 - (cx - x0) - x0
            shift_y = th // 2 - (cy - y0) - y0
            bb = boxes[mask].copy()
            bb[:, 0::2] += shift_x
            bb[:, 1::2] += shift_y
            if self.bbox_clip_border:
                bb[:, 0::2] = bb[:, 0::2].clip(0, tw)
                bb[:, 1::2] = bb[:, 1::2].clip(0, th)
            keep = (bb[:, 2] > bb[:, 0]) & (bb[:, 3] > bb[:, 1])
            results['gt_bboxes'] = bb[keep]
            if 'gt_labels' in results:
                results['gt_labels'] = results['gt_labels'][mask][keep]
            return results
        return results  # pathological image: give up uncropped

    def _test(self, results):
        img = results['img']
        h, w = img.shape[:2]
        results['img_shape'] = img.shape
        if self.test_pad_mode[0] == 'logical_or':
            th, tw = h | self.test_pad_mode[1], w | self.test_pad_mode[1]
        else:
            d = self.test_pad_mode[1]
            th = int(np.ceil(h / d)) * d
            tw = int(np.ceil(w / d)) * d
        # DELIBERATE deviation from the reference's centered test paste:
        # the content goes TOP-LEFT (border = 0), so predicted boxes stay in
        # image coordinates without threading the reference's `border`
        # offset through img_metas into every head's decode, and the
        # [0,h)x[0,w) valid-region mask (img_hw) still covers the content.
        canvas = np.empty((th, tw, img.shape[2]), img.dtype)
        canvas[:] = self.fill
        canvas[:h, :w] = img
        results['img'] = canvas
        results['pad_shape'] = canvas.shape
        results['border'] = np.zeros(4, np.float32)
        return results

    def __call__(self, results: Dict) -> Dict:
        return self._test(results) if self.test_mode else self._train(results)
