# Parity: /root/reference/configs/im/im_r101_r18_voc.py
# IM on VOC0712: GFL R-101 teacher -> R-18 student
_base_ = '../im/im_r101_r18_coco_1x.py'
model = dict(
    bbox_head=dict(num_classes=20),
    teacher_config='configs/gfl/gfl_r101_fpn_voc.py',
    teacher_ckpt='checkpoints/gfl_r101_fpn_voc.ckpt')
dataset_type = 'VOCDataset'
data_root = 'data/VOCdevkit/'
data = dict(
    train=dict(_delete_=True, type='RepeatDataset', times=3,
               dataset=dict(
                   type=dataset_type,
                   ann_file=[data_root + 'VOC2007/ImageSets/Main/trainval.txt',
                             data_root + 'VOC2012/ImageSets/Main/trainval.txt'],
                   img_prefix=[data_root + 'VOC2007/',
                               data_root + 'VOC2012/'])),
    val=dict(type=dataset_type,
             ann_file=data_root + 'VOC2007/ImageSets/Main/test.txt',
             img_prefix=data_root + 'VOC2007/'),
    test=dict(type=dataset_type,
              ann_file=data_root + 'VOC2007/ImageSets/Main/test.txt',
              img_prefix=data_root + 'VOC2007/'))
evaluation = dict(interval=1, metric='mAP')
