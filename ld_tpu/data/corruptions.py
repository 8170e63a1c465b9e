"""Image corruptions for robustness benchmarking.

Parity: the reference's corruption benchmark
(/root/reference/tools/analysis_tools/test_robustness.py + the
`imagecorruptions` package, which this image lacks) — the common corruption
families re-implemented with numpy/cv2 at 5 severities each.
"""
from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ld_tpu.utils.registry import PIPELINES


def gaussian_noise(img, severity):
    c = [0.04, 0.08, 0.12, 0.18, 0.26][severity - 1]
    x = img.astype(np.float32) / 255.0
    x = x + np.random.normal(size=x.shape, scale=c)
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def shot_noise(img, severity):
    c = [250, 100, 50, 30, 15][severity - 1]
    x = img.astype(np.float32) / 255.0
    x = np.random.poisson(x * c) / c
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def gaussian_blur(img, severity):
    c = [1, 2, 3, 4, 6][severity - 1]
    k = 2 * (2 * c) + 1
    return cv2.GaussianBlur(img, (k, k), sigmaX=c)


def motion_blur(img, severity):
    c = [5, 9, 13, 17, 21][severity - 1]
    kernel = np.zeros((c, c), np.float32)
    kernel[c // 2, :] = 1.0 / c
    angle = np.random.uniform(-45, 45)
    m = cv2.getRotationMatrix2D((c / 2 - 0.5, c / 2 - 0.5), angle, 1.0)
    kernel = cv2.warpAffine(kernel, m, (c, c))
    kernel = kernel / max(kernel.sum(), 1e-6)
    return cv2.filter2D(img, -1, kernel)


def brightness(img, severity):
    c = [0.1, 0.2, 0.3, 0.4, 0.5][severity - 1]
    x = img.astype(np.float32) / 255.0
    return (np.clip(x + c, 0, 1) * 255).astype(np.uint8)


def contrast(img, severity):
    c = [0.75, 0.5, 0.4, 0.3, 0.15][severity - 1]
    x = img.astype(np.float32)
    mean = x.mean(axis=(0, 1), keepdims=True)
    return np.clip((x - mean) * c + mean, 0, 255).astype(np.uint8)


def pixelate(img, severity):
    c = [0.6, 0.5, 0.4, 0.3, 0.25][severity - 1]
    h, w = img.shape[:2]
    small = cv2.resize(img, (max(1, int(w * c)), max(1, int(h * c))),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)


def jpeg_compression(img, severity):
    c = [65, 40, 25, 15, 10][severity - 1]
    _, enc = cv2.imencode('.jpg', img,
                          [int(cv2.IMWRITE_JPEG_QUALITY), c])
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)


CORRUPTIONS = {
    'gaussian_noise': gaussian_noise,
    'shot_noise': shot_noise,
    'gaussian_blur': gaussian_blur,
    'motion_blur': motion_blur,
    'brightness': brightness,
    'contrast': contrast,
    'pixelate': pixelate,
    'jpeg_compression': jpeg_compression,
}


@PIPELINES.register_module()
class Corrupt:
    """Pipeline transform applying a named corruption at a severity."""

    def __init__(self, corruption: str, severity: int = 1):
        assert corruption in CORRUPTIONS, (corruption, list(CORRUPTIONS))
        assert 1 <= severity <= 5
        self.corruption = corruption
        self.severity = severity

    def __call__(self, results):
        img = results['img']
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        results['img'] = CORRUPTIONS[self.corruption](img, self.severity)
        return results
