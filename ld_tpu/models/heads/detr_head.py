"""DETR transformer head (set prediction, no NMS).

Parity: /root/reference/mmdet/models/dense_heads/transformer_head.py —
1x1 input projection of the C5 map, sine positional encoding, a 6+6
post-norm transformer (100 learned queries), shared per-layer FC cls
(num_classes+1 softmax) and 3-layer MLP bbox branch predicting normalized
sigmoid cxcywh; Hungarian matching (cls + L1 + GIoU costs) and per-decoder-
layer auxiliary losses: CE with background weight 0.1, L1 (5.0) on
normalized boxes, GIoU (2.0) on absolute boxes. TPU-first deviation: the
matcher is the exact on-device JV solver (ops/matching.py), so the whole
training step stays inside one jit.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.ops.boxes import bbox_overlaps
from ld_tpu.ops.extra_assigners import HungarianAssigner
from ld_tpu.utils.registry import HEADS

EPS = 1e-6


def sine_positional_encoding(h, w, num_feats=128, temperature=10000.0):
    """(H, W, 2*num_feats) — mmdet SinePositionalEncoding (normalize=True)."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 1.0) / h * 2 * np.pi
    xs = (jnp.arange(w, dtype=jnp.float32) + 1.0) / w * 2 * np.pi
    dim_t = temperature ** (2 * (jnp.arange(num_feats) // 2) / num_feats)
    pos_x = xs[:, None] / dim_t[None, :]
    pos_y = ys[:, None] / dim_t[None, :]

    def interleave(p):
        return jnp.stack([jnp.sin(p[:, 0::2]), jnp.cos(p[:, 1::2])],
                         -1).reshape(p.shape[0], -1)

    px = interleave(pos_x)                                   # (W, F)
    py = interleave(pos_y)                                   # (H, F)
    pos = jnp.concatenate([
        jnp.broadcast_to(py[:, None, :], (h, w, num_feats)),
        jnp.broadcast_to(px[None, :, :], (h, w, num_feats))], -1)
    return pos


class FFN(nn.Module):
    dim: int
    hidden: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.hidden, dtype=self.dtype, name='fc1')(x)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name='fc2')(y)
        return x + y


class EncoderLayer(nn.Module):
    dim: int
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos):
        q = k = x + pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name='self_attn')(
                q, k, x)
        x = nn.LayerNorm(name='norm1')(x + attn)
        x = nn.LayerNorm(name='norm2')(FFN(self.dim, dtype=self.dtype,
                                           name='ffn')(x))
        return x


class DecoderLayer(nn.Module):
    dim: int
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, query_pos, pos):
        q = k = tgt + query_pos
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name='self_attn')(
                q, k, tgt)
        tgt = nn.LayerNorm(name='norm1')(tgt + sa)
        ca = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name='cross_attn')(
                tgt + query_pos, memory + pos, memory)
        tgt = nn.LayerNorm(name='norm2')(tgt + ca)
        tgt = nn.LayerNorm(name='norm3')(FFN(self.dim, dtype=self.dtype,
                                             name='ffn')(tgt))
        return tgt


class DETRHeadNet(nn.Module):
    num_classes: int
    num_queries: int = 100
    embed_dims: int = 256
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[-1]                                       # C5 (B,H,W,C)
        b, h, w, _ = x.shape
        d = self.embed_dims
        x = nn.Conv(d, (1, 1), dtype=self.dtype, name='input_proj')(x)
        pos = sine_positional_encoding(h, w, d // 2).astype(x.dtype)
        mem = x.reshape(b, h * w, d)
        pos = jnp.broadcast_to(pos.reshape(1, h * w, d), mem.shape)
        for i in range(self.num_encoder_layers):
            mem = EncoderLayer(d, self.num_heads, dtype=self.dtype,
                               name=f'enc{i}')(mem, pos)
        query_embed = self.param('query_embed', nn.initializers.normal(1.0),
                                 (self.num_queries, d))
        qp = jnp.broadcast_to(query_embed[None], (b, self.num_queries, d))
        tgt = jnp.zeros_like(qp)
        cls_fc = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          name='fc_cls')
        reg1 = nn.Dense(d, dtype=self.dtype, name='reg_ffn1')
        reg2 = nn.Dense(d, dtype=self.dtype, name='reg_ffn2')
        fc_reg = nn.Dense(4, dtype=self.dtype, name='fc_reg')
        all_cls, all_box = [], []
        for i in range(self.num_decoder_layers):
            tgt = DecoderLayer(d, self.num_heads, dtype=self.dtype,
                               name=f'dec{i}')(tgt, mem, qp, pos)
            out = nn.LayerNorm(name='post_norm')(tgt) \
                if i == self.num_decoder_layers - 1 else tgt
            all_cls.append(cls_fc(out).astype(jnp.float32))
            all_box.append(jax.nn.sigmoid(fc_reg(
                nn.relu(reg2(nn.relu(reg1(out))))).astype(jnp.float32)))
        # lists over decoder layers: (B, Q, C+1), (B, Q, 4) cxcywh in [0,1]
        return all_cls, all_box


@HEADS.register_module()
class DETRHead:

    def __init__(self, num_classes=80, in_channels=2048, num_query=100,
                 embed_dims=256, num_encoder_layers=6, num_decoder_layers=6,
                 bg_cls_weight=0.1, loss_cls=None, loss_bbox=None,
                 loss_iou=None, train_cfg=None, test_cfg=None,
                 transformer=None, positional_encoding=None,
                 dtype=jnp.float32, **kwargs):
        self.num_classes = num_classes
        self.cls_out_channels = num_classes + 1
        self.num_query = num_query
        self.bg_cls_weight = bg_cls_weight
        self.l1_weight = (loss_bbox or {}).get('loss_weight', 5.0)
        self.iou_weight = (loss_iou or {}).get('loss_weight', 2.0)
        self.cls_weight = (loss_cls or {}).get('loss_weight', 1.0)
        self.train_cfg = train_cfg or {}
        self.test_cfg = test_cfg or dict(max_per_img=100)
        a_cfg = dict(self.train_cfg.get('assigner', {}))
        self.assigner = HungarianAssigner(
            cls_cost_weight=a_cfg.get('cls_cost', {}).get('weight', 1.0),
            reg_cost_weight=a_cfg.get('reg_cost', {}).get('weight', 5.0),
            iou_cost_weight=a_cfg.get('iou_cost', {}).get('weight', 2.0))
        tf = dict(transformer or {})
        self.net = DETRHeadNet(
            num_classes=num_classes, num_queries=num_query,
            embed_dims=embed_dims,
            num_encoder_layers=tf.get('num_encoder_layers',
                                      num_encoder_layers),
            num_decoder_layers=tf.get('num_decoder_layers',
                                      num_decoder_layers), dtype=dtype)

    @staticmethod
    def _cxcywh_to_xyxy(box, hw):
        cx, cy, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
        scale_x, scale_y = hw[..., 1:2], hw[..., 0:1]
        return jnp.stack([(cx - w / 2) * scale_x, (cy - h / 2) * scale_y,
                          (cx + w / 2) * scale_x, (cy + h / 2) * scale_y],
                         -1)

    def _layer_loss(self, cls_logits, boxes_norm, batch):
        """One decoder layer's loss over the batch."""
        def single(logits, bn, gtb, gtl, gtv, hw):
            boxes_abs = self._cxcywh_to_xyxy(bn, hw)
            res = self.assigner.assign(boxes_abs, logits, gtb, gtl, gtv,
                                       hw, num_classes=self.num_classes)
            safe = jnp.clip(res.assigned_gt_inds, 0)
            tgt_box = gtb[safe]
            # normalized cxcywh targets
            scale = jnp.stack([hw[1], hw[0], hw[1], hw[0]])
            t = tgt_box / scale
            t_cxcywh = jnp.stack([
                (t[:, 0] + t[:, 2]) / 2, (t[:, 1] + t[:, 3]) / 2,
                t[:, 2] - t[:, 0], t[:, 3] - t[:, 1]], -1)
            posf = res.pos_mask.astype(jnp.float32)
            # CE with background down-weighted
            logp = jax.nn.log_softmax(logits, -1)
            lab = jnp.where(res.pos_mask, res.labels, self.num_classes)
            ce = -jnp.take_along_axis(logp, lab[:, None], 1)[:, 0]
            cw = jnp.where(res.pos_mask, 1.0, self.bg_cls_weight)
            l_cls = (ce * cw).sum()
            l_l1 = (jnp.abs(bn - t_cxcywh).sum(-1) * posf).sum()
            giou = bbox_overlaps(boxes_abs, tgt_box, mode='giou',
                                 is_aligned=True)
            l_iou = ((1.0 - giou) * posf).sum()
            return l_cls, l_l1, l_iou, posf.sum(), cw.sum()

        l_cls, l_l1, l_iou, n_pos, cw_sum = jax.vmap(single)(
            cls_logits, boxes_norm, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'], batch['img_hw'])
        num_pos = jnp.maximum(n_pos.sum(), 1.0)
        cls_avg = jnp.maximum(cw_sum.sum(), 1.0)
        return (self.cls_weight * l_cls.sum() / cls_avg,
                self.l1_weight * l_l1.sum() / num_pos,
                self.iou_weight * l_iou.sum() / num_pos)

    def loss(self, outputs, batch, featmap_sizes=None
             ) -> Dict[str, jnp.ndarray]:
        all_cls, all_box = outputs
        losses = {}
        n_layers = len(all_cls)
        for i in range(n_layers):
            l_cls, l_l1, l_iou = self._layer_loss(all_cls[i], all_box[i],
                                                  batch)
            if i == n_layers - 1:
                losses['loss_cls'] = l_cls
                losses['loss_bbox'] = l_l1
                losses['loss_iou'] = l_iou
            else:
                losses[f'd{i}.loss_cls'] = l_cls
                losses[f'd{i}.loss_bbox'] = l_l1
                losses[f'd{i}.loss_iou'] = l_iou
        return losses

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        cfg = cfg or self.test_cfg
        all_cls, all_box = outputs
        logits = all_cls[-1]
        boxes_norm = all_box[-1]
        max_per_img = cfg.get('max_per_img', 100)

        def per_image(lg, bn, hw, sf):
            probs = jax.nn.softmax(lg, -1)[:, :-1]           # drop bg
            scores = probs.max(-1)
            labels = probs.argmax(-1)
            boxes = self._cxcywh_to_xyxy(bn, hw)
            k = min(max_per_img, scores.shape[0])
            top_s, idx = jax.lax.top_k(scores, k)
            boxes = boxes[idx]
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            dets = jnp.concatenate([boxes, top_s[:, None]], -1)
            return dets, labels[idx], jnp.asarray(k, jnp.int32)

        b = logits.shape[0]
        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)(logits, boxes_norm, img_hw, scale_factor)
