from .transforms import (Compose, collate_batch, LoadImageFromFile,
                         LoadAnnotations, Resize, RandomFlip, Normalize, Pad,
                         Collect, PhotoMetricDistortion)
from .coco import CocoDataset, SyntheticDetectionDataset, COCO_CLASSES
from .loader import DataLoader, GroupBatchSampler, build_dataloader
from .voc import VOCDataset
from .lvis import LVISV1Dataset
from .dataset_wrappers import (ConcatDataset, RepeatDataset,
                               ClassBalancedDataset)
from .transforms import (FusedPreprocess, RandomCrop, Expand,
                         MinIoURandomCrop, CutOut)

from . import corruptions  # noqa: F401 — registers Corrupt
from . import auto_augment  # noqa: F401 — registers Shear/Rotate/...
from .extra_datasets import (CityscapesDataset, DeepFashionDataset,
                             WIDERFaceDataset)
from ld_tpu.utils.registry import DATASETS


def build_dataset(cfg):
    return DATASETS.build(dict(cfg))


__all__ = [
    'Compose', 'collate_batch', 'LoadImageFromFile', 'LoadAnnotations',
    'Resize', 'RandomFlip', 'Normalize', 'Pad', 'Collect',
    'PhotoMetricDistortion', 'CocoDataset', 'SyntheticDetectionDataset',
    'COCO_CLASSES', 'DataLoader', 'GroupBatchSampler', 'build_dataloader',
    'build_dataset', 'VOCDataset', 'ConcatDataset', 'RepeatDataset',
    'ClassBalancedDataset', 'FusedPreprocess', 'RandomCrop', 'Expand',
    'MinIoURandomCrop', 'CutOut', 'LVISV1Dataset', 'CityscapesDataset',
    'DeepFashionDataset', 'WIDERFaceDataset'
]
