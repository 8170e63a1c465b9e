"""Dataset class-name tables. Parity:
/root/reference/mmdet/core/evaluation/class_names.py."""
from ld_tpu.data.coco import COCO_CLASSES
from ld_tpu.data.voc import VOC_CLASSES

coco_classes = lambda: list(COCO_CLASSES)  # noqa: E731
voc_classes = lambda: list(VOC_CLASSES)    # noqa: E731

_TABLES = {'coco': coco_classes, 'voc': voc_classes}


def get_classes(dataset: str):
    if dataset in _TABLES:
        return _TABLES[dataset]()
    raise KeyError(f'unknown dataset {dataset}')
