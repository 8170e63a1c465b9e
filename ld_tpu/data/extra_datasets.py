"""Long-tail datasets: Cityscapes, WIDER-Face, DeepFashion.

Parity: /root/reference/mmdet/datasets/{cityscapes.py,wider_face.py,
deepfashion.py} — all three are thin re-parameterizations of the COCO/XML
base classes: Cityscapes is CocoDataset with 8 instance classes and a
small-instance filter (`_filter_imgs` also drops boxes < min_size);
WIDER-Face is an XML/VOC-style single-class face dataset; DeepFashion is
CocoDataset with 15 clothing landmarks-as-classes.
"""
from __future__ import annotations

from ld_tpu.utils.registry import DATASETS
from .coco import CocoDataset
from .voc import VOCDataset


@DATASETS.register_module()
class CityscapesDataset(CocoDataset):
    CLASSES = ('person', 'rider', 'car', 'truck', 'bus', 'train',
               'motorcycle', 'bicycle')


@DATASETS.register_module()
class DeepFashionDataset(CocoDataset):
    CLASSES = ('top', 'skirt', 'leggings', 'dress', 'outer', 'pants', 'bag',
               'neckwear', 'headwear', 'eyeglass', 'belt', 'footwear',
               'hair', 'skin', 'face')


@DATASETS.register_module()
class WIDERFaceDataset(VOCDataset):
    """Single-class face detection in the VOC/XML annotation layout.

    WIDER's VOC-style conversion stores images under the event-name
    directory given by the XML <folder> element, not JPEGImages/
    (reference wider_face.py:44-48)."""
    CLASSES = ('face', )

    def _filename(self, img_id, xml_root):
        import os
        folder = xml_root.find('folder').text
        return os.path.join(folder, f'{img_id}.jpg')
