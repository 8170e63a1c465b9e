"""Single-stage detector: backbone -> neck -> dense head.

Capability parity with /root/reference/mmdet/models/detectors/single_stage.py:11
plus the thin named wrappers (gfl.py, atss.py, ...). TPU-native design: the
detector is a plain component owning a single flax module tree (backbone +
neck + head net) and a head component; `forward_train` returns a dict of
scalar losses, `forward_test` returns padded fixed-size detections — both are
pure functions of (variables, batch) and are intended to be jit/pjit'd by the
caller (ld_tpu.apis / parallel).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.models.necks.seq import build_neck_maybe_seq
from ld_tpu.utils.registry import BACKBONES, DETECTORS, HEADS, NECKS


class SingleStageNet(nn.Module):
    """The jointly-initialized parameter tree of one detector."""
    backbone: nn.Module
    neck: Optional[nn.Module]
    head_net: nn.Module

    @nn.compact
    def __call__(self, images, train: bool = False,
                 output_features: bool = False):
        x = self.backbone(images, train)
        if self.neck is not None:
            x = self.neck(x, train)
        outs = self.head_net(list(x), train)
        if output_features:
            return outs, x
        return outs


@DETECTORS.register_module()
class SingleStageDetector:

    def __init__(self, backbone, neck=None, bbox_head=None, train_cfg=None,
                 test_cfg=None, pretrained=None, **kwargs):
        self.backbone = BACKBONES.build(dict(backbone))
        self.neck = build_neck_maybe_seq(neck)
        head_cfg = dict(bbox_head)
        head_cfg.setdefault('train_cfg', train_cfg)
        head_cfg.setdefault('test_cfg', test_cfg)
        self.bbox_head = HEADS.build(head_cfg)
        self.net = SingleStageNet(self.backbone, self.neck, self.bbox_head.net)
        self.pretrained = pretrained
        self.num_classes = self.bbox_head.num_classes

    # ---- parameter init ------------------------------------------------------
    def init_variables(self, rng, input_shape=(1, 64, 64, 3)) -> Dict:
        return self.net.init(rng, jnp.zeros(input_shape, jnp.float32))

    def frozen_param_paths(self):
        prefix = 'backbone/'
        return [prefix + p for p in self.backbone.frozen_param_paths()]

    # ---- forward -------------------------------------------------------------
    def apply(self, variables, images, train=False, output_features=False):
        if train:
            # BN layers with live statistics (norm_eval=False backbones,
            # RetinaSepBNHead) write momentum-updated running stats; the
            # traced collection is stashed for make_train_step to thread
            # into the next TrainState (frozen BN passes through unchanged)
            def fwd(variables, images):
                return self.net.apply(variables, images, train=True,
                                      output_features=output_features,
                                      mutable=['batch_stats'])
            if getattr(self, '_remat', False):
                # remat scoped to the student forward only: the deep conv
                # tower activations are recomputed during backward, while
                # the teacher forward (train=False path) and loss math are
                # saved as usual (make_train_step remat docstring)
                fwd = jax.checkpoint(fwd)
            outs, mut = fwd(variables, images)
            self._last_batch_stats = mut.get('batch_stats', {})
            return outs
        return self.net.apply(variables, images, train=False,
                              output_features=output_features)

    def extract_feat(self, variables, images, train=False):
        x = self.backbone.apply({'params': variables['params']['backbone'],
                                 'batch_stats': variables.get(
                                     'batch_stats', {}).get('backbone', {})},
                                images, train)
        return x

    def forward_train(self, variables, batch) -> Dict[str, jnp.ndarray]:
        outs = self.apply(variables, batch['image'], train=True)
        featmap_sizes = [c.shape[1:3] for c in outs[0]]
        return self.bbox_head.loss(outs, batch, featmap_sizes)

    def forward_test(self, variables, batch, rescale=False):
        outs = self.apply(variables, batch['image'], train=False)
        return self.bbox_head.get_bboxes(
            outs, batch['img_hw'], batch.get('scale_factor'), rescale=rescale)

    def simple_test(self, variables, batch, rescale=False):
        return self.forward_test(variables, batch, rescale)


# thin named wrappers so reference config `type=` strings resolve 1:1
# (/root/reference/mmdet/models/detectors/{gfl,atss,fcos,retinanet,paa,...}.py)
for _name in ('GFL', 'ATSS', 'FCOS', 'RetinaNet', 'SSD', 'FoveaBox', 'FSAF', 'PAA',
              'VFNet', 'YOLOV3', 'NASFCOS', 'RepPointsDetector', 'TOOD',
              'DETR', 'CornerNet', 'SOLO', 'CentripetalNet'):
    DETECTORS.register_module(name=_name, module=type(
        _name, (SingleStageDetector, ), {}))
