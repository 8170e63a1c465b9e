"""YOLACT detector: single-stage bbox head + protonet + semantic head.

Parity: /root/reference/mmdet/models/detectors/yolact.py — forward_train
runs the bbox head (OHEM cls + SmoothL1), the semantic segmentation head on
P3 and the protonet mask loss; simple_test assembles instance masks as
sigmoid(protos @ coeffs) cropped to each detection box.
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.utils.registry import BACKBONES, DETECTORS, HEADS, NECKS
from ld_tpu.models.heads.yolact_head import (YOLACTProtonetNet,
                                             YOLACTSegmHeadNet,
                                             _box_crop_mask)


class YOLACTNet(nn.Module):
    backbone: nn.Module
    neck: Optional[nn.Module]
    head_net: nn.Module
    proto_net: nn.Module
    segm_net: nn.Module

    @nn.compact
    def __call__(self, images, train: bool = False):
        x = self.backbone(images, train)
        if self.neck is not None:
            x = self.neck(x, train)
        outs = self.head_net(list(x), train)
        protos = self.proto_net(x[0])
        segm = self.segm_net(x[0])
        return outs, protos, segm


@DETECTORS.register_module()
class YOLACT:

    def __init__(self, backbone, neck=None, bbox_head=None, mask_head=None,
                 segm_head=None, train_cfg=None, test_cfg=None,
                 pretrained=None, **kwargs):
        self.backbone = BACKBONES.build(dict(backbone))
        self.neck = NECKS.build(dict(neck)) if neck else None
        head_cfg = dict(bbox_head)
        head_cfg.setdefault('train_cfg', train_cfg)
        head_cfg.setdefault('test_cfg', test_cfg)
        self.bbox_head = HEADS.build(head_cfg)
        self.num_classes = self.bbox_head.num_classes
        num_protos = (mask_head or {}).get('num_protos',
                                           self.bbox_head.num_protos)
        self.net = YOLACTNet(
            self.backbone, self.neck, self.bbox_head.net,
            YOLACTProtonetNet(num_protos=num_protos),
            YOLACTSegmHeadNet(num_classes=self.num_classes))

    def init_variables(self, rng, input_shape=(1, 64, 64, 3)) -> Dict:
        return self.net.init(rng, jnp.zeros(input_shape, jnp.float32))

    def frozen_param_paths(self):
        return ['backbone/' + p for p in self.backbone.frozen_param_paths()]

    def apply(self, variables, images, train=False):
        return self.net.apply(variables, images, train=train)

    def forward_train(self, variables, batch, rng=None
                      ) -> Dict[str, jnp.ndarray]:
        outs, protos, segm = self.apply(variables, batch['image'],
                                        train=True)
        featmap_sizes = [c.shape[1:3] for c in outs[0]]
        losses = self.bbox_head.loss(outs, batch, featmap_sizes)
        losses.update(self.bbox_head.segm_loss(segm, batch))
        losses.update(self.bbox_head.mask_loss(outs, protos, batch,
                                               featmap_sizes, rng=rng))
        return losses

    def forward_test(self, variables, batch, rescale=False):
        outs, protos, _ = self.apply(variables, batch['image'], train=False)
        dets, labels, n, coeffs = self.bbox_head.get_bboxes_with_coeffs(
            outs, batch['img_hw'], batch.get('scale_factor'),
            rescale=rescale)

        def assemble(proto, det, coeff):
            m = jax.nn.sigmoid(jnp.einsum('hwp,kp->khw', proto, coeff))
            crop = _box_crop_mask(proto.shape[0], proto.shape[1],
                                  det[:, :4], 4.0)
            return m * crop

        masks = jax.vmap(assemble)(protos, dets, coeffs)
        return dets, labels, n, masks

    def simple_test(self, variables, batch, rescale=False):
        return self.forward_test(variables, batch, rescale)
