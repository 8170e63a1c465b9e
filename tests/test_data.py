"""Data pipeline tests (reference strategy: transform determinism/shape/flip
correctness — SURVEY.md §4, tests/test_data)."""
import numpy as np

from ld_tpu.data import (Compose, collate_batch, DataLoader,
                         SyntheticDetectionDataset)
from ld_tpu.data.transforms import (Normalize, Pad, RandomFlip, Resize,
                                    rescale_size)


def _sample(h=100, w=150):
    img = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    return dict(img=img, img_shape=img.shape, ori_shape=img.shape,
                gt_bboxes=np.asarray([[10., 20., 60., 80.]], np.float32),
                gt_labels=np.asarray([3]))


def test_resize_keep_ratio():
    r = Resize(img_scale=(1333, 800), keep_ratio=True)
    out = r(_sample(100, 150))
    # factor = min(1333/150, 800/100) = 8.0
    assert out['img'].shape[:2] == (800, 1200)
    np.testing.assert_allclose(out['scale_factor'], [8, 8, 8, 8])
    np.testing.assert_allclose(out['gt_bboxes'][0], [80, 160, 480, 640])


def test_resize_rounding_matches_reference():
    # mmcv rescale: int(dim * factor + 0.5)
    assert rescale_size(427, 640, (1333, 800)) * 640 // 1 <= 1333
    r = Resize(img_scale=(1333, 800), keep_ratio=True)
    out = r(_sample(427, 640))
    f = min(1333 / 640, 800 / 427)
    assert out['img'].shape[1] == int(640 * f + 0.5)
    assert out['img'].shape[0] == int(427 * f + 0.5)


def test_flip_boxes():
    f = RandomFlip(flip_ratio=1.0)
    out = f(_sample())
    # box x-coords mirrored around image width 150
    np.testing.assert_allclose(out['gt_bboxes'][0], [90, 20, 140, 80])
    # double flip restores
    out2 = RandomFlip(flip_ratio=1.0)(out)
    np.testing.assert_allclose(out2['gt_bboxes'][0], [10, 20, 60, 80])


def test_normalize_bgr_to_rgb():
    n = Normalize(mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True)
    s = _sample()
    bgr = s['img'].astype(np.float32)
    out = n(s)
    np.testing.assert_allclose(out['img'][..., 0], bgr[..., 2])


def test_pad_divisor():
    p = Pad(size_divisor=32)
    out = p(_sample(100, 150))
    assert out['img'].shape[:2] == (128, 160)
    assert out['img'][100:, :].sum() == 0


def test_collate_static_shapes():
    samples = [_sample(100, 150), _sample(80, 120)]
    for s in samples:
        s['scale_factor'] = np.ones(4, np.float32)
    batch = collate_batch(samples, pad_hw=(128, 160), max_gts=5)
    assert batch['image'].shape == (2, 128, 160, 3)
    assert batch['gt_bboxes'].shape == (2, 5, 4)
    assert batch['gt_valid'].sum() == 2
    np.testing.assert_allclose(batch['img_hw'], [[100, 150], [80, 120]])


def test_loader_deterministic_and_static():
    ds = SyntheticDetectionDataset(num_images=10, hw=(64, 96), pipeline=[
        dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=False),
        dict(type='Pad', size_divisor=32),
    ])
    loader = DataLoader(ds, batch_size=4, pad_hw=(64, 96), max_gts=8, seed=3)
    b1 = [b['image'].sum() for b in loader]
    loader2 = DataLoader(ds, batch_size=4, pad_hw=(64, 96), max_gts=8,
                         seed=3)
    b2 = [b['image'].sum() for b in loader2]
    assert b1 == b2                      # same seed+epoch -> same batches
    loader.set_epoch(1)
    b3 = [b['image'].sum() for b in loader]
    assert b1 != b3                      # epoch changes the shuffle
    for b in loader:
        assert b['image'].shape == (4, 64, 96, 3)  # full batches (padded)


def test_loader_thread_pool_matches_serial():
    ds = SyntheticDetectionDataset(num_images=10, hw=(64, 96), pipeline=[
        dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=False),
        dict(type='Pad', size_divisor=32),
    ])
    serial = DataLoader(ds, batch_size=4, pad_hw=(64, 96), max_gts=8, seed=3)
    pooled = DataLoader(ds, batch_size=4, pad_hw=(64, 96), max_gts=8, seed=3,
                        num_workers=4)
    for a, b in zip(serial, pooled):
        np.testing.assert_array_equal(a['image'], b['image'])
        np.testing.assert_array_equal(a['gt_bboxes'], b['gt_bboxes'])


def test_group_sampler_homogeneous_batches():
    ds = SyntheticDetectionDataset(num_images=16, hw=(64, 96), pipeline=[])
    ds.flag = np.array([0, 1] * 8, np.uint8)
    loader = DataLoader(ds, batch_size=4, pad_hw=(64, 96))
    for idx in loader.sampler.epoch_batches(0):
        flags = ds.flag[idx]
        assert (flags == flags[0]).all()
