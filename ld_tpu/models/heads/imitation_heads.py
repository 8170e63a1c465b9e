"""Feature-imitation study heads.

The reference ships two heads used only by the configs/im + configs/imv2
ablation studies ("logit mimicking vs feature imitation", LD TPAMI paper):
  * IMHead — GFLv1 student with LD + imitation terms
    (used by /root/reference/configs/im/im_r101_r18_coco_1x.py);
  * IMv2Head — GFocalV2 student with LD + imitation + GI-imitation terms
    (/root/reference/mmdet/models/dense_heads/imitationv2_head.py:43).

Their loss surface is the LDHead/LDv2Head machinery with the imitation
branch active (the reference variants differ only in which ablation
sub-terms are zeroed — e.g. imitationv2_head.py carries extra
loss_cls_kd_neg / loss_bbox_neg terms that every shipped config disables).
Registered as aliases so every configs/im* file builds and trains.
"""
from ld_tpu.utils.registry import HEADS
from .ld_head import LDHead
from .ld_gflv2 import LDv2Head


@HEADS.register_module()
class IMHead(LDHead):
    pass


@HEADS.register_module()
class IMv2Head(LDv2Head):
    pass
