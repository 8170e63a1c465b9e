"""Data pipeline tests (reference strategy: transform determinism/shape/flip
correctness — SURVEY.md §4, tests/test_data)."""
import pytest

pytestmark = pytest.mark.smoke  # high-value numerics/oracle gate (<10 min total, README)
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


def test_resize_multiscale_modes():
    # range mode (reference transforms.py:121-141): long/short edges each
    # uniform over the [min, max] of the two bounding scales
    np.random.seed(0)
    r = Resize(img_scale=[(1333, 640), (1333, 800)], multiscale_mode='range')
    for _ in range(20):
        long_e, short_e = (lambda s: (max(s), min(s)))(r._sample_scale())
        assert long_e == 1333 and 640 <= short_e <= 800
    # value mode: exact member of the list
    r = Resize(img_scale=[(1333, 480), (1333, 960)], multiscale_mode='value')
    seen = {r._sample_scale() for _ in range(50)}
    assert seen == {(1333, 480), (1333, 960)}
    # ratio_range on a single base scale
    r = Resize(img_scale=(640, 640), ratio_range=(0.5, 1.5))
    for _ in range(20):
        s = r._sample_scale()
        assert 320 <= s[0] <= 960 and s[0] == s[1]


def test_collate_pad_buckets():
    from ld_tpu.data.transforms import select_pad_bucket
    buckets = [(512, 864), (800, 1344), (1024, 1696)]
    assert select_pad_bucket(buckets, (500, 860)) == (512, 864)
    assert select_pad_bucket(buckets, (513, 100)) == (800, 1344)
    assert select_pad_bucket(buckets, (801, 1400)) == (1024, 1696)
    try:
        select_pad_bucket(buckets, (2000, 2000))
        assert False, 'expected ValueError'
    except ValueError:
        pass
    # single-shape pad_hw unchanged
    assert select_pad_bucket((800, 1344), (100, 100)) == (800, 1344)
    samples = [_sample(100, 150), _sample(80, 120)]
    for s in samples:
        s['scale_factor'] = np.ones(4, np.float32)
    batch = collate_batch(samples, pad_hw=[(96, 128), (128, 160)], max_gts=5)
    assert batch['image'].shape == (2, 128, 160, 3)


def test_loader_bucketed_pad():
    ds = SyntheticDetectionDataset(num_images=8, hw=(64, 96), pipeline=[
        dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=False),
    ])
    dl = DataLoader(ds, batch_size=4, pad_hw=[(64, 96), (128, 192)],
                    shuffle=False)
    shapes = {b['image'].shape for b in dl}
    assert shapes == {(4, 64, 96, 3)}


def test_loader_batch_scales_synchronized():
    # every image in a batch shares one sampled scale; different batches can
    # differ; selection is deterministic in (seed, epoch)
    pipeline = [
        dict(type='Resize', img_scale=(128, 96), keep_ratio=True),
        dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=False),
    ]
    ds = SyntheticDetectionDataset(num_images=16, hw=(64, 96),
                                   pipeline=pipeline)
    scales = [(128, 96), (96, 64), (64, 48)]
    dl = DataLoader(ds, batch_size=4, pad_hw=[(48, 64), (64, 96), (96, 128)],
                    max_gts=4, seed=0, batch_scales=scales,
                    scale_sampling='batch')
    shapes_epoch0 = [b['image'].shape for b in dl]
    # source images are 64x96 so resize factor = min(long/96, short/64);
    # all samples in one batch must have identical true hw
    for b in dl:
        hw = b['img_hw']
        assert (hw == hw[0]).all(), hw
    dl2 = DataLoader(ds, batch_size=4, pad_hw=[(48, 64), (64, 96), (96, 128)],
                     max_gts=4, seed=0, batch_scales=scales,
                     scale_sampling='batch')
    assert [b['image'].shape for b in dl2] == shapes_epoch0
    assert len(set(shapes_epoch0)) > 1  # multiple buckets actually exercised


def test_scale_grouped_mstrain():
    """'image_range_grouped': per-image draws (reference marginal
    distribution, identical to 'image_range' at the same seed/epoch) but
    batches are homogeneous in pad bucket — each batch pads to its own
    bucket instead of the range max. And the shared pipeline object is
    never mutated (the old re-arm-in-__init__ leak, ADVICE r3)."""
    pipeline = [
        dict(type='Resize', img_scale=(128, 96), keep_ratio=True),
        dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=False),
    ]
    buckets = [(48, 64), (64, 96), (96, 128), (128, 96), (96, 64), (64, 48)]
    mk = lambda mode: DataLoader(  # noqa: E731
        SyntheticDetectionDataset(num_images=64, hw=(64, 96),
                                  pipeline=pipeline),
        batch_size=8, pad_hw=buckets, max_gts=8, seed=3,
        batch_scales=[(128, 48), (128, 96)], scale_sampling=mode)

    dl = mk('image_range_grouped')
    resize = dl.dataset.pipeline.transforms[0]
    orig_scale = resize.img_scale
    per_batch_hw = []
    all_hw = []
    for b in dl:
        hw = np.asarray(b['img_hw'])
        per_batch_hw.append(b['image'].shape[1:3])
        all_hw.extend(map(tuple, hw.tolist()))
        # every image in the batch fits the batch's (own) bucket
        assert hw[:, 0].max() <= b['image'].shape[1]
        assert hw[:, 1].max() <= b['image'].shape[2]
    # batches landed in multiple buckets (grouping actually pays)
    assert len(set(per_batch_hw)) > 1, per_batch_hw
    # per-image variety within the epoch (not per-batch correlated draws)
    assert len(set(all_hw)) > 8
    # the shared pipeline was NOT mutated
    assert resize.img_scale == orig_scale
    assert getattr(resize, 'batch_scale', None) is None

    # identical per-image draw: same seed/epoch, the grouped and ungrouped
    # modes give every image the SAME scale (only the batching differs;
    # tail-padding may duplicate different indices, so compare per-id)
    assert dl._epoch_scales() == mk('image_range')._epoch_scales()


def test_fixed_scale_bucket_grouping():
    """Single-fixed-scale (1x/2x) training with multiple pad buckets groups
    batches by PREDICTED resized shape: each image's post-Resize dims are
    statically determined by its annotation dims + the one keep-ratio
    scale, so batches are bucket-homogeneous and pad to their own bucket
    instead of the max — pure reorder, no per-image math changes
    (loader.py DataLoader._fixed_scales). Mirrors the reference's
    aspect-ratio grouping (group_sampler.py:10) one step finer."""
    from ld_tpu.data.dataset_wrappers import ConcatDataset
    pipeline = [
        dict(type='Resize', img_scale=(96, 64), keep_ratio=True),
        dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=False),
    ]
    # 64x96 resizes to 64x96 (factor 1) -> (64, 96) bucket;
    # 48x96 resizes to 48x96 (factor 1) -> the smaller (48, 96) bucket
    ds = ConcatDataset([
        SyntheticDetectionDataset(num_images=16, hw=(64, 96),
                                  pipeline=pipeline, seed=0),
        SyntheticDetectionDataset(num_images=16, hw=(48, 96),
                                  pipeline=pipeline, seed=1),
    ])
    dl = DataLoader(ds, batch_size=4, pad_hw=[(48, 96), (64, 96)],
                    max_gts=8, seed=0)
    assert dl._fixed_scales() is not None
    shapes = [b['image'].shape for b in dl]
    # both buckets exercised: tall images never drag short ones to max pad
    assert set(shapes) == {(4, 48, 96, 3), (4, 64, 96, 3)}, shapes
    for b in dl:
        hw = np.asarray(b['img_hw'])
        assert hw[:, 0].max() <= b['image'].shape[1]
        # batch is homogeneous in true height (grouping worked)
        assert len(set(hw[:, 0].tolist())) == 1, hw

    # not statically predictable -> grouping declines (returns None):
    # mstrain-style multi-scale list
    ms_pipeline = [
        dict(type='Resize', img_scale=[(96, 64), (80, 48)],
             multiscale_mode='value', keep_ratio=True),
        dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=False),
    ]
    ds2 = SyntheticDetectionDataset(num_images=8, hw=(64, 96),
                                    pipeline=ms_pipeline)
    dl2 = DataLoader(ds2, batch_size=4, pad_hw=[(48, 96), (64, 96)],
                     max_gts=8, seed=0)
    assert dl2._fixed_scales() is None


def test_load_image_color_type(tmp_path):
    """color_type parity with the reference loader
    (/root/reference/mmdet/datasets/pipelines/loading.py:12): 'grayscale'
    decodes 2-D, 'unchanged' keeps stored channels, default stays 3-ch
    BGR."""
    import cv2
    from ld_tpu.data.transforms import LoadImageFromFile
    img = np.zeros((8, 10, 3), np.uint8)
    img[:, :, 0] = 200  # blue-ish
    p = str(tmp_path / 'x.png')
    cv2.imwrite(p, img)
    gray_p = str(tmp_path / 'g.png')
    cv2.imwrite(gray_p, np.full((8, 10), 77, np.uint8))

    res = lambda path: dict(img_info=dict(filename=path))  # noqa: E731
    out = LoadImageFromFile()(res(p))
    assert out['img'].shape == (8, 10, 3)
    out = LoadImageFromFile(color_type='grayscale')(res(p))
    assert out['img'].ndim == 2 and out['img_shape'] == (8, 10)
    out = LoadImageFromFile(color_type='unchanged')(res(gray_p))
    assert out['img'].ndim == 2  # stored single-channel stays 2-D
    out = LoadImageFromFile(color_type='color')(res(gray_p))
    assert out['img'].shape == (8, 10, 3)  # gray file -> replicated BGR
    assert (out['img'] == 77).all()
    import pytest
    with pytest.raises(AssertionError):
        LoadImageFromFile(color_type='sepia')


def _write_voc_year(root, year, ids, size=(60, 80)):
    import os
    import cv2 as _cv2
    base = os.path.join(root, year)
    os.makedirs(os.path.join(base, 'Annotations'), exist_ok=True)
    os.makedirs(os.path.join(base, 'JPEGImages'), exist_ok=True)
    os.makedirs(os.path.join(base, 'ImageSets', 'Main'), exist_ok=True)
    h, w = size
    for i in ids:
        _cv2.imwrite(os.path.join(base, 'JPEGImages', f'{i}.jpg'),
                     np.zeros((h, w, 3), np.uint8))
        with open(os.path.join(base, 'Annotations', f'{i}.xml'), 'w') as f:
            f.write(f"""<annotation><size><width>{w}</width>
<height>{h}</height></size>
<object><name>dog</name><difficult>0</difficult>
<bndbox><xmin>10</xmin><ymin>10</ymin><xmax>40</xmax><ymax>40</ymax>
</bndbox></object></annotation>""")
    split = os.path.join(base, 'ImageSets', 'Main', 'trainval.txt')
    with open(split, 'w') as f:
        f.write('\n'.join(ids) + '\n')
    return split, base + '/'


def test_voc_multi_year_ann_lists(tmp_path):
    """Reference VOC 07+12 configs pass LISTS of ann_files/img_prefixes
    (voc0712.py:39-43); the splits concatenate into one dataset with
    per-image prefixes."""
    from ld_tpu.data.voc import VOCDataset
    root = str(tmp_path)
    s07, p07 = _write_voc_year(root, 'VOC2007', ['000001', '000002'])
    s12, p12 = _write_voc_year(root, 'VOC2012', ['100001'])
    ds = VOCDataset(ann_file=[s07, s12], img_prefix=[p07, p12],
                    pipeline=[dict(type='LoadImageFromFile'),
                              dict(type='LoadAnnotations', with_bbox=True)])
    assert len(ds) == 3
    for i in range(3):
        out = ds[i]
        assert out['img'].shape == (60, 80, 3)
        assert len(out['gt_bboxes']) == 1


def test_formatting_and_aux_pipeline_classes():
    """Reference-parity formatting/aux transforms (formating.py,
    loading.py:388,433, test_time_aug.py:10)."""
    from ld_tpu.data.transforms import (DefaultFormatBundle, FilterAnnotations,
                                        LoadProposals, MultiScaleFlipAug,
                                        SegRescale)
    s = _sample()
    out = DefaultFormatBundle()(dict(s))
    assert out['img'].dtype == np.float32
    assert out['gt_labels'].dtype == np.int64

    # FilterAnnotations drops tiny boxes; all-dropped -> None
    r = dict(s, gt_bboxes=np.array([[0, 0, 1.5, 30], [5, 5, 40, 40]],
                                   np.float32),
             gt_labels=np.array([1, 2]))
    out = FilterAnnotations(min_gt_bbox_wh=(2, 2))(r)
    assert len(out['gt_bboxes']) == 1 and out['gt_labels'][0] == 2
    r2 = dict(s, gt_bboxes=np.array([[0, 0, 1, 1]], np.float32),
              gt_labels=np.array([1]))
    assert FilterAnnotations(min_gt_bbox_wh=(2, 2))(r2) is None

    out = LoadProposals(num_max_proposals=2)(dict(
        proposals=np.array([[0, 0, 5, 5, 0.9], [1, 1, 6, 6, 0.8],
                            [2, 2, 7, 7, 0.7]], np.float32)))
    assert out['proposals'].shape == (2, 4)

    seg = np.arange(64).reshape(8, 8).astype(np.uint8)
    out = SegRescale(scale_factor=0.5)(dict(gt_semantic_seg=seg))
    assert out['gt_semantic_seg'].shape == (4, 4)

    # MultiScaleFlipAug: single view applies inner transforms in place
    aug = MultiScaleFlipAug(
        img_scale=(128, 96), flip=False,
        transforms=[dict(type='Resize', keep_ratio=True),
                    dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1],
                         to_rgb=False)])
    out = aug(_sample(64, 96))
    # factor = min(128/96, 96/64) = 4/3 -> (85, 128)
    assert out['img'].shape[:2] == (85, 128)
    assert 'aug_views' not in out
    # multi view -> aug_views list
    aug2 = MultiScaleFlipAug(
        img_scale=[(128, 96), (64, 48)], flip=True,
        transforms=[dict(type='Resize', keep_ratio=True)])
    out2 = aug2(_sample(64, 96))
    assert len(out2['aug_views']) == 4
    flips = [v['flip'] for v in out2['aug_views']]
    assert flips == [False, True, False, True]


def test_legacy_delta_coder():
    import jax.numpy as jnp
    from ld_tpu.ops.coder import build_coder
    c = build_coder(dict(type='LegacyDeltaXYWHBBoxCoder'))
    boxes = jnp.asarray([[10., 10., 50., 30.]])
    gts = jnp.asarray([[12., 8., 48., 36.]])
    back = np.asarray(c.decode(boxes, c.encode(boxes, gts)))
    # corners return 0.5px outward: decode omits the +-0.5 of the true
    # legacy coder (reference legacy_delta_xywh_bbox_coder.py:203 note)
    np.testing.assert_allclose(back, [[11.5, 7.5, 48.5, 36.5]], atol=1e-3)


def test_random_crop_absolute_range_and_masks():
    # reference transforms.py:700 absolute_range: crop h,w each uniform in
    # [min(crop_size), max(crop_size)] clamped to the image
    from ld_tpu.data.transforms import RandomCrop
    np.random.seed(0)
    for _ in range(10):
        s = _sample(500, 700)
        s['gt_masks'] = [np.ones((500, 700), np.uint8)]
        c = RandomCrop(crop_size=(384, 600), crop_type='absolute_range',
                       allow_negative_crop=True)
        out = c(s)
        h, w = out['img'].shape[:2]
        assert 384 <= h <= 500 and 384 <= w <= 600
        # masks cropped in lock-step with the image
        assert all(m.shape == (h, w) for m in out['gt_masks'])
        assert len(out['gt_masks']) == len(out['gt_bboxes'])


def test_resize_override_resamples():
    # DETR double-resize (reference transforms.py:186): a Resize with
    # override=True ignores an explicit results['scale'] and resamples
    s = _sample(100, 150)
    s['scale'] = (50, 50)
    out = Resize(img_scale=(1333, 800), keep_ratio=True, override=True)(s)
    assert out['img'].shape[:2] == (800, 1200)   # not the 50x50 scale
    s2 = _sample(100, 150)
    s2['scale'] = (60, 40)
    out2 = Resize(img_scale=(1333, 800), keep_ratio=True)(s2)
    assert max(out2['img'].shape[:2]) <= 60      # honored without override


def test_detr_autoaugment_pipeline_runs():
    # the shipped DETR train aug: resize OR resize->crop->re-resize(override)
    from ld_tpu.utils.config import Config
    cfg = Config.fromfile('configs/detr/detr_r50_8x2_150e_coco.py')
    pipe = Compose(cfg['data']['train']['pipeline'][2:])  # skip Load* stages
    np.random.seed(1)
    shapes = set()
    for _ in range(8):
        out = pipe(_sample(480, 640))
        if out is None:
            continue
        shapes.add(out['img'].shape[:2])
        assert out['img'].shape[2] == 3
    assert len(shapes) > 1   # multi-scale actually varies


def test_perimage_mstrain_base_config():
    """mstrain bases keep the reference's PER-IMAGE draw. Since r5 the
    mainline default is 'image_range_grouped' (same per-image draw,
    scale-grouped batch composition — AP-clean 3-seed A/B,
    docs/EXPERIMENTS.md); the _perimage alias pins exact reference
    BATCHING, and the per-batch deviation stays opt-in (measured
    AP-negative)."""
    import os
    from ld_tpu import Config
    root = os.path.join(os.path.dirname(__file__), '..')
    expected = {
        'configs/gfl/gfl_r50_fpn_mstrain_2x_coco.py': 'image_range_grouped',
        'configs/gfl/gfl_r50_fpn_mstrain_2x_coco_perimage.py': 'image_range',
    }
    for name, want in expected.items():
        cfg = Config.fromfile(os.path.join(root, name))
        assert cfg.get('scale_sampling', 'image_range') == want, name
        assert len(cfg.pad_to) == 12
        assert tuple(cfg.batch_scales[0]) == (1333, 480)
        assert tuple(cfg.batch_scales[-1]) == (1333, 800)
    pb = Config.fromfile(os.path.join(
        root, 'configs/_base_/mstrain_480_800_perbatch.py'))
    assert pb['scale_sampling'] == 'batch'

    # drive the loader path: a fixed-scale consumer pipeline, re-armed to
    # per-image range draws between the endpoint scales
    pipeline = [
        dict(type='Resize', img_scale=(128, 96), keep_ratio=True),
        dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=False),
    ]
    ds = SyntheticDetectionDataset(num_images=32, hw=(64, 96),
                                   pipeline=pipeline)
    dl = DataLoader(ds, batch_size=8, pad_hw=(96, 128), max_gts=4, seed=0,
                    batch_scales=[(128, 48), (128, 96)])  # default image_range
    hw = {tuple(map(int, x)) for b in dl for x in b['img_hw']}
    assert len(hw) > 4   # per-image variety WITHIN an epoch
    assert all(48 - 1 <= min(x) <= 96 for x in hw)

    # value mode: only grid scales appear
    ds2 = SyntheticDetectionDataset(num_images=32, hw=(64, 96),
                                    pipeline=[
        dict(type='Resize', img_scale=(128, 96), keep_ratio=True),
        dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=False),
    ])
    dl2 = DataLoader(ds2, batch_size=8, pad_hw=(96, 128), max_gts=4, seed=0,
                     batch_scales=[(96, 64), (128, 96)],
                     scale_sampling='image_value')
    hw2 = {tuple(map(int, x)) for b in dl2 for x in b['img_hw']}
    assert len(hw2) == 2   # exactly the two grid scales (64x96 src fits both)


def test_grouped_mstrain_pure_reorder_guardrail():
    """VERDICT r04 weak #5 / next #7: turn the loader docstring's
    "grouping is a pure reorder" argument into a pinned invariant. One
    epoch of 'image_range_grouped' must fetch, for EVERY dataset index,
    the exact same resized image (same post-Resize hw) as ungrouped
    'image_range' under the same seed/epoch, and must cover the same
    index multiset (modulo the group tail-padding duplicates, whose
    per-index content is identical by determinism). Only the batch
    composition may differ — the property that distinguishes it from the
    r3-retired AP-destructive per-batch mode."""
    pipeline = [
        dict(type='Resize', img_scale=(128, 96), keep_ratio=True),
        dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=False),
    ]
    buckets = [(48, 64), (64, 96), (96, 128), (128, 96), (96, 64), (64, 48)]
    scales = [(128, 48), (128, 96)]

    def index_to_hw(mode, epoch):
        dl = DataLoader(
            SyntheticDetectionDataset(num_images=64, hw=(64, 96),
                                      pipeline=pipeline),
            batch_size=8, pad_hw=buckets, max_gts=8, seed=3,
            batch_scales=scales, scale_sampling=mode)
        dl.set_epoch(epoch)
        # reconstruct the deterministic batch index lists the loader uses
        # (same recipe as DataLoader.__iter__) and zip with yielded batches
        sc = dl._epoch_scales()
        keys = dl._bucket_keys(sc) if 'grouped' in mode else None
        batches = dl.sampler.epoch_batches(dl.epoch, keys=keys)
        out = {}
        for idx, b in zip(batches, dl):
            for j, i in enumerate(map(int, idx)):
                hw = tuple(map(int, b['img_hw'][j]))
                assert out.get(i, hw) == hw, (
                    f'index {i} fetched twice with different hw')
                out[i] = hw
        return out

    for epoch in (0, 1):
        grouped = index_to_hw('image_range_grouped', epoch)
        plain = index_to_hw('image_range', epoch)
        # full coverage: every dataset index fetched at least once in both
        assert set(grouped) == set(plain) == set(range(64))
        # pure reorder: identical per-index resized shape
        assert grouped == plain


def test_epoch_batch_count_exact_in_all_grouping_modes():
    """len(loader) must equal the ACTUAL number of yielded batches in
    every grouping mode (r5 review finding: per-group tail padding made
    grouped epochs yield up to groups-1 extra batches over ceil(n/b),
    silently corrupting steps_per_epoch and the preemption-resume skip
    arithmetic). Group tails are merged into shared batches instead."""
    pipeline = [
        dict(type='Resize', img_scale=(128, 96), keep_ratio=True),
        dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=False),
    ]
    buckets = [(48, 64), (64, 96), (96, 128), (128, 96), (96, 64), (64, 48)]
    for n in (61, 64, 67):
        for mode, scales in (('image_range_grouped', [(128, 48), (128, 96)]),
                             ('image_range', [(128, 48), (128, 96)]),
                             ('image_value_grouped', [(96, 64), (128, 96)])):
            dl = DataLoader(
                SyntheticDetectionDataset(num_images=n, hw=(64, 96),
                                          pipeline=pipeline),
                batch_size=8, pad_hw=buckets, max_gts=8, seed=3,
                batch_scales=scales, scale_sampling=mode)
            for epoch in (0, 1):
                dl.set_epoch(epoch)
                got = sum(1 for _ in dl)
                assert got == len(dl) == -(-n // 8), (mode, n, epoch, got)
        # fixed-scale bucket grouping mode too (identity-scale pipeline so
        # resized shapes stay inside the two buckets)
        from ld_tpu.data.dataset_wrappers import ConcatDataset
        fixed_pipe = [
            dict(type='Resize', img_scale=(96, 64), keep_ratio=True),
            dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1],
                 to_rgb=False),
        ]
        ds = ConcatDataset([
            SyntheticDetectionDataset(num_images=n // 2, hw=(64, 96),
                                      pipeline=fixed_pipe, seed=0),
            SyntheticDetectionDataset(num_images=n - n // 2, hw=(48, 96),
                                      pipeline=fixed_pipe, seed=1),
        ])
        dl = DataLoader(ds, batch_size=8, pad_hw=[(48, 96), (64, 96)],
                        max_gts=8, seed=0)
        assert sum(1 for _ in dl) == len(dl) == -(-n // 8)
