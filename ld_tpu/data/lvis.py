"""LVIS v1 dataset (COCO-format json with LVIS field conventions).

Parity: /root/reference/mmdet/datasets/lvis.py (742 LoC over the lvis
package) — self-contained here: file names derived from coco_url, category
set taken from the json (1203 classes), federated-annotation fields
(neg_category_ids / not_exhaustive_category_ids) carried through for
evaluation; typically trained with ClassBalancedDataset oversampling.
"""
from __future__ import annotations

import json
from collections import defaultdict

import numpy as np

from ld_tpu.utils.registry import DATASETS
from .coco import CocoDataset


@DATASETS.register_module()
class LVISV1Dataset(CocoDataset):

    def __init__(self, ann_file, pipeline, img_prefix='', **kwargs):
        super().__init__(ann_file, pipeline, img_prefix=img_prefix,
                         **kwargs)

    def _load_annotations(self, ann_file):
        with open(ann_file) as f:
            data = json.load(f)
        cats = sorted(data['categories'], key=lambda c: c['id'])
        self.CLASSES = tuple(c['name'] for c in cats)
        self.cat_id_to_label = {c['id']: i for i, c in enumerate(cats)}
        self.label_to_cat_id = {v: k for k, v in
                                self.cat_id_to_label.items()}

        anns_by_img = defaultdict(list)
        for a in data.get('annotations', []):
            anns_by_img[a['image_id']].append(a)

        self.img_infos = []
        self.annotations = []
        for img in data['images']:
            if 'file_name' in img:
                filename = img['file_name']
            else:  # LVIS v1: derive from coco_url '.../train2017/xxx.jpg'
                filename = '/'.join(img['coco_url'].split('/')[-2:])
            info = dict(id=img['id'], filename=filename,
                        width=img['width'], height=img['height'],
                        neg_category_ids=img.get('neg_category_ids', []),
                        not_exhaustive_category_ids=img.get(
                            'not_exhaustive_category_ids', []))
            bboxes, labels, polys = [], [], []
            for a in anns_by_img.get(img['id'], []):
                x, y, w, h = a['bbox']
                if w < 1 or h < 1:
                    continue
                bboxes.append([x, y, x + w, y + h])
                labels.append(self.cat_id_to_label[a['category_id']])
                seg = a.get('segmentation')
                polys.append(seg if isinstance(seg, list) else None)
            self.img_infos.append(info)
            self.annotations.append(dict(
                bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
                labels=np.asarray(labels, np.int64),
                bboxes_ignore=np.zeros((0, 4), np.float32),
                masks=polys))


LVISDataset = LVISV1Dataset
DATASETS.register_module(name='LVISDataset', module=LVISV1Dataset)
