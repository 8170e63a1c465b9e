"""Feature-imitation study heads.

The reference ships these for the configs/im + configs/imv2 ablations
("logit mimicking vs feature imitation", LD TPAMI paper):

  * IMHead — referenced by /root/reference/configs/im/im_r101_r18_coco_1x.py
    but REGISTERED NOWHERE in the reference (the config cannot build there —
    the same class of footgun as the unregistered
    `LocalizationDistillationLoss`, SURVEY.md §2.1). Provided here as the
    LDHead with the imitation branch active, which is what those configs
    describe.
  * IMv2Head — /root/reference/mmdet/models/dense_heads/imitationv2_head.py:43.
    Faithful differences from LDv2Head (imitationv2_head.py:195-335):
      - the DFL term is disabled (loss_dfl = 0, :249-255);
      - VLR LD is `0.25 * loss_ld(..., avg_factor=4)` — numerically equal to
        LDv2's `loss_ld_vlr(..., avg_factor=16)` (0.25/4 == 1/16), so the
        shared machinery is reused as-is;
      - loss_cls_kd_neg / loss_bbox_neg exist but are zeroed in the
        reference (kept as logged zeros via loss_kd_neg).
"""
import jax.numpy as jnp

from ld_tpu.utils.registry import HEADS
from .ld_head import LDHead
from .ld_gflv2 import LDv2Head


@HEADS.register_module()
class IMHead(LDHead):
    pass


@HEADS.register_module()
class IMv2Head(LDv2Head):

    def loss(self, outputs, batch, featmap_sizes, soft_teacher,
             student_feats=None, teacher_feats=None):
        losses = super().loss(outputs, batch, featmap_sizes, soft_teacher,
                              student_feats, teacher_feats)
        # imitationv2_head.py zeroes the DFL term (commented out, :249-255)
        losses['loss_dfl'] = jnp.zeros(())
        return losses
