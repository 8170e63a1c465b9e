"""GFocalV2 head (arXiv:2011.12885): Distribution-Guided Quality Prediction.

Capability parity with /root/reference/mmdet/models/dense_heads/gfocal_head.py:
the GFL towers plus DGQP — per-side top-4(+mean) statistics of the box
distribution softmax feed a tiny 1x1-conv MLP whose sigmoid output multiplies
the classification sigmoid (forward_single, gfocal_head.py:180-217). The head
therefore outputs PROBABILITIES (cls_score = sigmoid(cls_feat) * quality)
and the raw cls logits (`cls_feat`) that LDv2 distills against.

TPU notes: top-k over the 17 distribution bins is a tiny sort on the VPU;
the whole DGQP branch fuses into the head's conv epilogue.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.utils.registry import HEADS
from .gfl_head import ConvGNBlock, GFLHead, _CLS_BIAS_INIT


class GFocalHeadNet(nn.Module):
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    reg_max: int = 16
    num_levels: int = 5
    reg_topk: int = 4
    reg_channels: int = 64
    add_mean: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.cls_convs = [ConvGNBlock(self.feat_channels, dtype=self.dtype,
                                      name=f'cls_conv{i}')
                          for i in range(self.stacked_convs)]
        self.reg_convs = [ConvGNBlock(self.feat_channels, dtype=self.dtype,
                                      name=f'reg_conv{i}')
                          for i in range(self.stacked_convs)]
        self.gfl_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(_CLS_BIAS_INIT),
            name='gfl_cls')
        self.gfl_reg = nn.Conv(
            4 * (self.reg_max + 1), (3, 3), padding=[(1, 1)] * 2,
            dtype=self.dtype, kernel_init=nn.initializers.normal(0.01),
            name='gfl_reg')
        total_dim = self.reg_topk + (1 if self.add_mean else 0)
        self.reg_conf_1 = nn.Conv(self.reg_channels, (1, 1),
                                  dtype=self.dtype, name='reg_conf_1',
                                  kernel_init=nn.initializers.normal(0.01))
        self.reg_conf_2 = nn.Conv(1, (1, 1), dtype=self.dtype,
                                  name='reg_conf_2',
                                  kernel_init=nn.initializers.normal(0.01))
        self.scales = self.param('scales', nn.initializers.ones,
                                 (self.num_levels, ))
        self._total_dim = total_dim

    def __call__(self, feats, train: bool = False):
        cls_scores, bbox_preds, cls_feats = [], [], []
        for lvl, x in enumerate(feats):
            cls_feat, reg_feat = x, x
            for conv in self.cls_convs:
                cls_feat = conv(cls_feat)
            for conv in self.reg_convs:
                reg_feat = conv(reg_feat)
            bbox_pred = (self.gfl_reg(reg_feat) *
                         self.scales[lvl]).astype(jnp.float32)
            b, h, w, _ = bbox_pred.shape
            prob = jax.nn.softmax(
                bbox_pred.reshape(b, h, w, 4, self.reg_max + 1), axis=-1)
            topk, _ = jax.lax.top_k(prob, self.reg_topk)     # (b,h,w,4,k)
            if self.add_mean:
                stat = jnp.concatenate(
                    [topk, topk.mean(axis=-1, keepdims=True)], axis=-1)
            else:
                stat = topk
            stat = stat.reshape(b, h, w, 4 * self._total_dim)
            q = nn.relu(self.reg_conf_1(stat.astype(self.dtype)))
            quality = jax.nn.sigmoid(self.reg_conf_2(q)).astype(jnp.float32)
            cls_logits = self.gfl_cls(cls_feat).astype(jnp.float32)
            cls_scores.append(jax.nn.sigmoid(cls_logits) * quality)
            bbox_preds.append(bbox_pred)
            cls_feats.append(cls_logits)
        return cls_scores, bbox_preds, cls_feats


@HEADS.register_module()
class GFocalHead(GFLHead):
    """GFLV2 framework component (probability-valued cls scores)."""

    def __init__(self, num_classes, in_channels, reg_topk=4, reg_channels=64,
                 add_mean=True, **kwargs):
        self.reg_topk = reg_topk
        self.reg_channels = reg_channels
        self.add_mean = add_mean
        kwargs.setdefault('loss_cls', dict(
            type='QualityFocalLoss', use_sigmoid=False, beta=2.0,
            loss_weight=1.0))
        super().__init__(num_classes, in_channels, **kwargs)

    def _build_net(self, dtype):
        return GFocalHeadNet(num_classes=self.num_classes,
                             feat_channels=self.feat_channels,
                             stacked_convs=self.stacked_convs,
                             reg_max=self.reg_max,
                             num_levels=self.num_levels,
                             reg_topk=self.reg_topk,
                             reg_channels=self.reg_channels,
                             add_mean=self.add_mean, dtype=dtype)

    def loss(self, outputs, batch, featmap_sizes):
        # the DGQP head's 3rd output (raw cls logits) is not used by the
        # plain GFLV2 loss — only by LDv2 distillation
        return super().loss(outputs[:2], batch, featmap_sizes)

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        return super().get_bboxes(tuple(outputs[:2]), img_hw, scale_factor,
                                  rescale, cfg, with_nms)
