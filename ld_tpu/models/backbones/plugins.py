"""Backbone stage plugins: ContextBlock (GCNet) and GeneralizedAttention.

Parity targets:
  * plugin mechanism — /root/reference/mmdet/models/backbones/resnet.py:109-118
    (Bottleneck `plugins` with positions after_conv1/2/3, per-stage gating
    via `stages`), consumed by configs/gcnet/ and configs/empirical_attention/.
  * ContextBlock — mmcv ops ContextBlock ("GCNet: Non-local Networks Meet
    Squeeze-Excitation Networks", arXiv:1904.11492): attention-pooled global
    context -> bottleneck channel transform (1x1 -> LayerNorm -> ReLU -> 1x1,
    last conv zero-init) added to every position.
  * GeneralizedAttention — mmcv ops GeneralizedAttention ("An Empirical Study
    of Spatial Attention Mechanisms in Deep Networks", arXiv:1904.05873):
    multi-head attention whose energy is a sum of up to four terms selected
    by `attention_type` bits: [0] query content x key content, [1] query
    content x relative-position embedding, [2] learned bias x key content
    ('0010' is the paper's deformable-like favourite), [3] learned bias x
    position. Zero-init gamma residual: the block starts as identity.

TPU notes: everything is dense NHWC; the attention energies are plain
batched matmuls (MXU) over (h*w, h_kv*w_kv); position embeddings are
shape-dependent compile-time constants under jit.
"""
from __future__ import annotations

import math
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ContextBlock(nn.Module):
    """GCNet global-context block (in/out channels preserved)."""
    ratio: float = 1.0 / 4
    pooling_type: str = 'att'          # 'att' | 'avg'
    fusion_types: Tuple[str, ...] = ('channel_add', )

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        planes = max(int(c * self.ratio), 1)
        if self.pooling_type == 'att':
            # per-position logits -> softmax over HW -> weighted sum of x
            attn = nn.Conv(1, (1, 1), name='conv_mask')(x)       # (B,H,W,1)
            attn = jax.nn.softmax(attn.reshape(b, h * w, 1), axis=1)
            context = jnp.einsum('bpc,bpo->boc', x.reshape(b, h * w, c),
                                 attn)                           # (B,1,C)
            context = context.reshape(b, 1, 1, c)
        else:
            context = x.mean(axis=(1, 2), keepdims=True)

        out = x
        for fusion in self.fusion_types:
            t = nn.Conv(planes, (1, 1), name=f'{fusion}_conv0')(context)
            t = nn.LayerNorm(epsilon=1e-5, name=f'{fusion}_ln')(t)
            t = nn.relu(t)
            # last transform conv zero-init: the block starts as identity
            t = nn.Conv(c, (1, 1), name=f'{fusion}_conv1',
                        kernel_init=nn.initializers.zeros)(t)
            if fusion == 'channel_mul':
                out = out * jax.nn.sigmoid(t)
            else:
                out = out + t
        return out


def _position_embedding(h, w, h_kv, w_kv, q_stride, kv_stride, feat_dim,
                        magnitude, wave_length=1000):
    """Sine/cosine embeddings of relative x/y offsets (host-side constants)."""
    h_idxs = np.arange(h, dtype=np.float32)[:, None] * q_stride
    w_idxs = np.arange(w, dtype=np.float32)[:, None] * q_stride
    h_kv_idxs = np.arange(h_kv, dtype=np.float32)[:, None] * kv_stride
    w_kv_idxs = np.arange(w_kv, dtype=np.float32)[:, None] * kv_stride

    h_diff = (h_idxs[:, None, :] - h_kv_idxs[None, :, :]) * magnitude
    w_diff = (w_idxs[:, None, :] - w_kv_idxs[None, :, :]) * magnitude

    feat_range = np.arange(feat_dim // 4, dtype=np.float32)
    dim_mat = np.power(wave_length, (4.0 / feat_dim) * feat_range)
    emb_x = np.concatenate([np.sin(w_diff / dim_mat),
                            np.cos(w_diff / dim_mat)], axis=2)
    emb_y = np.concatenate([np.sin(h_diff / dim_mat),
                            np.cos(h_diff / dim_mat)], axis=2)
    return jnp.asarray(emb_x), jnp.asarray(emb_y)   # (w,w_kv,D/2),(h,h_kv,D/2)


class GeneralizedAttention(nn.Module):
    """Empirical-attention block (in/out channels preserved)."""
    spatial_range: int = -1
    num_heads: int = 9
    position_embedding_dim: int = -1
    position_magnitude: int = 1
    kv_stride: int = 2
    q_stride: int = 1
    attention_type: str = '1111'

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        at = [bool(int(t)) for t in self.attention_type]
        heads = self.num_heads
        qk_dim = c // heads
        v_dim = c // heads
        pe_dim = self.position_embedding_dim \
            if self.position_embedding_dim > 0 else c

        x_q = x
        if self.q_stride > 1:
            x_q = nn.max_pool(x, (self.q_stride, ) * 2,
                              strides=(self.q_stride, ) * 2)
        x_kv = x
        if self.kv_stride > 1:
            x_kv = nn.max_pool(x, (self.kv_stride, ) * 2,
                               strides=(self.kv_stride, ) * 2)
        hq, wq = x_q.shape[1:3]
        hk, wk = x_kv.shape[1:3]

        scale = 1.0 / math.sqrt(qk_dim)

        def heads_last(t, d):
            # (B,H,W,heads*d) -> (B,heads,H*W,d)
            return t.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)

        proj_query = None
        if at[0] or at[1]:
            proj_query = heads_last(
                nn.Conv(qk_dim * heads, (1, 1), use_bias=False,
                        name='query_conv')(x_q), qk_dim)        # (B,N,hq*wq,d)
        proj_key = None
        if at[0] or at[2]:
            proj_key = heads_last(
                nn.Conv(qk_dim * heads, (1, 1), use_bias=False,
                        name='key_conv')(x_kv), qk_dim)         # (B,N,hk*wk,d)

        if at[2]:
            appr_bias = self.param(
                'appr_bias', nn.initializers.normal(1.0 / math.sqrt(qk_dim)),
                (heads, qk_dim))[None, :, None, :]              # (1,N,1,d)

        # content energy (B, N, hq*wq, hk*wk)
        if at[0]:
            q = proj_query + appr_bias if at[2] else proj_query
            energy = jnp.einsum('bnqd,bnkd->bnqk', q, proj_key) * scale
        elif at[2]:
            energy = jnp.einsum('bnqd,bnkd->bnqk',
                                jnp.broadcast_to(
                                    appr_bias, (b, heads, 1, qk_dim)),
                                proj_key) * scale               # (B,N,1,K)
            energy = jnp.broadcast_to(energy,
                                      (b, heads, hq * wq, hk * wk))
        else:
            energy = jnp.zeros((b, heads, hq * wq, hk * wk), x.dtype)

        # position energy
        if at[1] or at[3]:
            emb_x, emb_y = _position_embedding(
                hq, wq, hk, wk, self.q_stride, self.kv_stride, pe_dim,
                self.position_magnitude)
            # (w,w_kv,D/2) -> (N heads) x qk_dim, / sqrt(2) as in mmcv
            feat_x = nn.Dense(qk_dim * heads, use_bias=False,
                              name='appr_geom_fc_x')(emb_x)
            feat_y = nn.Dense(qk_dim * heads, use_bias=False,
                              name='appr_geom_fc_y')(emb_y)
            feat_x = feat_x.reshape(wq, wk, heads, qk_dim) / math.sqrt(2)
            feat_y = feat_y.reshape(hq, hk, heads, qk_dim) / math.sqrt(2)
            if at[1]:
                q = proj_query.reshape(b, heads, hq, wq, qk_dim)
                if at[3]:
                    geom_bias = self.param(
                        'geom_bias',
                        nn.initializers.normal(1.0 / math.sqrt(qk_dim)),
                        (heads, qk_dim))
                    q = q + geom_bias[None, :, None, None, :]
            else:  # only geom_bias x position
                geom_bias = self.param(
                    'geom_bias',
                    nn.initializers.normal(1.0 / math.sqrt(qk_dim)),
                    (heads, qk_dim))
                q = jnp.broadcast_to(geom_bias[None, :, None, None, :],
                                     (b, heads, hq, wq, qk_dim))
            # separable relative-position energies: x with x-offsets,
            # y with y-offsets, broadcast-added over the other axis
            e_x = jnp.einsum('bnhwd,wvnd->bnhwv', q, feat_x) * scale
            e_y = jnp.einsum('bnhwd,hund->bnhwu', q, feat_y) * scale
            pos = e_x[:, :, :, :, None, :] + e_y[:, :, :, :, :, None]
            energy = energy + pos.reshape(b, heads, hq * wq, hk * wk)

        if self.spatial_range >= 0:
            # locality mask: query attends only within spatial_range (input
            # pixels) of its own location
            qyy = np.repeat(np.arange(hq) * self.q_stride, wq)
            qxx = np.tile(np.arange(wq) * self.q_stride, hq)
            kyy = np.repeat(np.arange(hk) * self.kv_stride, wk)
            kxx = np.tile(np.arange(wk) * self.kv_stride, hk)
            ok = ((np.abs(qyy[:, None] - kyy[None, :]) <= self.spatial_range)
                  & (np.abs(qxx[:, None] - kxx[None, :])
                     <= self.spatial_range))
            energy = jnp.where(jnp.asarray(ok)[None, None], energy,
                               jnp.float32(-1e9))

        attention = jax.nn.softmax(energy, axis=3)
        proj_value = heads_last(
            nn.Conv(v_dim * heads, (1, 1), use_bias=False,
                    name='value_conv')(x_kv), v_dim)            # (B,N,K,vd)
        out = jnp.einsum('bnqk,bnkd->bnqd', attention, proj_value)
        out = out.transpose(0, 2, 1, 3).reshape(b, hq, wq, v_dim * heads)
        if self.q_stride > 1:
            out = jax.image.resize(out, (b, h, w, out.shape[-1]),
                                   method='nearest')
        out = nn.Conv(c, (1, 1), name='proj_conv')(out)
        gamma = self.param('gamma', nn.initializers.zeros, (1, ))
        return x + gamma * out


_PLUGIN_TYPES = {
    'ContextBlock': ContextBlock,
    'GeneralizedAttention': GeneralizedAttention,
}


def _snake(name: str) -> str:
    out = []
    for i, ch in enumerate(name):
        if ch.isupper() and i > 0:
            out.append('_')
        out.append(ch.lower())
    return ''.join(out)


def build_plugin(cfg, name=None):
    """Build a plugin module from its config dict (type key removed)."""
    cfg = dict(cfg)
    t = cfg.pop('type')
    if t not in _PLUGIN_TYPES:
        raise KeyError(f'unknown backbone plugin type {t!r} '
                       f'(known: {sorted(_PLUGIN_TYPES)})')
    return _PLUGIN_TYPES[t](name=name or _snake(t), **cfg)
