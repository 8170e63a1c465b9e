# Parity: /root/reference/configs/pascal_voc/faster_rcnn_r50_fpn_1x_voc0712_cocofmt.py
# (VOC converted to COCO json; evaluate with the COCO protocol)
_base_ = './faster_rcnn_r50_fpn_1x_voc0712.py'
data_root = 'data/VOCdevkit/'
data = dict(
    train=dict(
        _delete_=True,
        type='CocoDataset',
        ann_file=data_root + 'annotations/voc0712_trainval.json',
        img_prefix=data_root),
    val=dict(
        _delete_=True,
        type='CocoDataset',
        ann_file=data_root + 'annotations/voc07_test.json',
        img_prefix=data_root),
    test=dict(
        _delete_=True,
        type='CocoDataset',
        ann_file=data_root + 'annotations/voc07_test.json',
        img_prefix=data_root))
evaluation = dict(interval=1, metric='bbox')
