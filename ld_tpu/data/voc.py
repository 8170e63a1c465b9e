"""PASCAL VOC dataset (XML annotations) + AP50:95 evaluation.

Parity: /root/reference/mmdet/datasets/voc.py:7 and xml_style.py — the LD
paper evaluates VOC with COCO-style AP by looping IoU thresholds
(/root/reference/README.md:172-184).
"""
from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List

import numpy as np

from ld_tpu.utils.registry import DATASETS
from .transforms import Compose

VOC_CLASSES = ('aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus',
               'car', 'cat', 'chair', 'cow', 'diningtable', 'dog', 'horse',
               'motorbike', 'person', 'pottedplant', 'sheep', 'sofa',
               'train', 'tvmonitor')


@DATASETS.register_module(name=['VOCDataset', 'XMLDataset'])
class VOCDataset:
    """Also registered as XMLDataset (reference xml_style.py base): the
    generic Pascal-style XML annotation reader with a classes override."""
    CLASSES = VOC_CLASSES

    def __init__(self, ann_file, pipeline, img_prefix='', test_mode=False,
                 min_size=None, classes=None, **kwargs):
        if classes is not None:
            self.CLASSES = tuple(classes)
        # ann_file/img_prefix may be parallel LISTS (the reference's VOC
        # 07+12 trainval configs, e.g. gfl_r18_fpn1x_voc.py: one split file
        # per VOC year); the splits are concatenated into one dataset
        ann_files = ann_file if isinstance(ann_file, (list, tuple)) \
            else [ann_file]
        prefixes = img_prefix if isinstance(img_prefix, (list, tuple)) \
            else [img_prefix] * len(ann_files)
        assert len(prefixes) == len(ann_files)
        self.img_prefix = prefixes[0]
        self.test_mode = test_mode
        self.min_size = min_size
        self.ids, id_prefixes = [], []
        for af, pref in zip(ann_files, prefixes):
            with open(af) as f:
                new = [line.strip() for line in f if line.strip()]
            self.ids += new
            id_prefixes += [pref] * len(new)
        self._id_prefixes = id_prefixes
        self.img_infos = []
        self.annotations = []
        name_to_label = {n: i for i, n in enumerate(self.CLASSES)}
        for img_id, img_prefix in zip(self.ids, id_prefixes):
            xml_path = os.path.join(img_prefix, 'Annotations',
                                    f'{img_id}.xml')
            tree = ET.parse(xml_path)
            root = tree.getroot()
            size = root.find('size')
            w = int(size.find('width').text)
            h = int(size.find('height').text)
            bboxes, labels, ignore, ignore_labels = [], [], [], []
            for obj in root.findall('object'):
                name = obj.find('name').text
                if name not in name_to_label:
                    continue
                difficult = int(obj.find('difficult').text or 0)
                bnd = obj.find('bndbox')
                box = [float(bnd.find(k).text) - (1 if k.startswith(
                    ('xmin', 'ymin')) else 0) for k in
                    ('xmin', 'ymin', 'xmax', 'ymax')]
                small = self.min_size and (
                    box[2] - box[0] < self.min_size or
                    box[3] - box[1] < self.min_size)
                if difficult or small:
                    ignore.append(box)
                    ignore_labels.append(name_to_label[name])
                else:
                    bboxes.append(box)
                    labels.append(name_to_label[name])
            self.img_infos.append(dict(
                id=img_id, filename=self._filename(img_id, root),
                width=w, height=h))
            self.annotations.append(dict(
                bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
                labels=np.asarray(labels, np.int64),
                bboxes_ignore=np.asarray(ignore, np.float32).reshape(-1, 4),
                labels_ignore=np.asarray(ignore_labels, np.int64)))
        self.flag = np.array([
            1 if i['width'] / i['height'] > 1 else 0 for i in self.img_infos
        ], np.uint8)
        self.pipeline = Compose(pipeline)

    def _filename(self, img_id, xml_root):
        """Image path for an annotation id; WIDER-Face overrides with the
        XML <folder> layout (reference wider_face.py:44-48)."""
        return os.path.join('JPEGImages', f'{img_id}.jpg')

    def __len__(self):
        return len(self.img_infos)

    def get_ann_info(self, idx):
        return self.annotations[idx]

    def __getitem__(self, idx):
        results = dict(img_info=self.img_infos[idx],
                       ann_info=self.annotations[idx],
                       img_prefix=self._id_prefixes[idx])
        return self.pipeline(results)

    def evaluate(self, det_results, metric='mAP', iou_thr=0.5, **kwargs):
        from ld_tpu.evaluation.mean_ap import eval_map
        per_class_results = []
        for res in det_results:
            if isinstance(res, dict):
                per_cls = [
                    np.concatenate([
                        np.asarray(res['boxes'])[np.asarray(res['labels'])
                                                 == c].reshape(-1, 5)
                    ]) for c in range(len(self.CLASSES))
                ]
                per_class_results.append(per_cls)
            else:
                per_class_results.append(res)
        out = {}
        if metric == 'mAP':
            mAP, _ = eval_map(per_class_results, self.annotations,
                              iou_thr=iou_thr,
                              num_classes=len(self.CLASSES))
            out['mAP'] = mAP
        else:  # COCO-style AP50:95 (LD paper protocol)
            aps = []
            for thr in np.arange(0.5, 1.0, 0.05):
                ap, _ = eval_map(per_class_results, self.annotations,
                                 iou_thr=float(thr),
                                 num_classes=len(self.CLASSES))
                aps.append(ap)
                out[f'AP{int(thr * 100)}'] = ap
            out['mAP'] = float(np.mean(aps))
        return out
