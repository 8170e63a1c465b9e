# Parity: /root/reference/configs/imv2/im_r18_gflv2_r101_1x_voc.py
# IMv2 on VOC: GFocalV2 R-101 teacher -> R-18 student
_base_ = './im_r50_gflv2_r101_1x.py'
model = dict(
    pretrained='torchvision://resnet18',
    backbone=dict(depth=18),
    neck=dict(in_channels=[64, 128, 256, 512]),
    bbox_head=dict(num_classes=20),
    teacher_config='configs/gfl/gflv2_r101_fpn_2x_voc.py',
    teacher_ckpt='checkpoints/gflv2_r101_fpn_2x_voc.ckpt')
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
