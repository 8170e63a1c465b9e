"""Packed-canvas head tower == per-level tower, on the same parameters.

The packed tower (ld_tpu/models/heads/packed_tower.py) is a pure execution
strategy: identical param tree, outputs equal up to float reassociation in
the GroupNorm reductions. These tests pin that contract on geometries that
exercise single-column AND multi-column shelf packing.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ld_tpu  # noqa: F401
from ld_tpu.models.heads.gfl_head import GFLHeadNet
from ld_tpu.models.heads.packed_tower import (PackedGFLHeadNet, pack_masks,
                                              plan_pack)


def _fpn_sizes(h, w, levels=5):
    sizes = []
    for i in range(levels):
        sizes.append((max(1, -(-h // (8 * 2 ** i))),
                      max(1, -(-w // (8 * 2 ** i)))))
    return sizes


@pytest.mark.parametrize('hw', [(160, 224), (800, 1344)])
def test_plan_pack_geometry(hw):
    sizes = _fpn_sizes(*hw)
    plan = plan_pack(sizes)
    (hc, wc), offsets = plan
    # every level inside the canvas, pairwise Chebyshev-separated by the gap
    boxes = []
    for (h, w), (y, x) in zip(sizes, offsets):
        assert 0 <= y and y + h <= hc and 0 <= x and x + w <= wc
        boxes.append((y, x, y + h, x + w))
    for i in range(len(boxes)):
        for j in range(i + 1, len(boxes)):
            y0, x0, y1, x1 = boxes[i]
            u0, v0, u1, v1 = boxes[j]
            sep_y = max(u0 - y1, y0 - u1)
            sep_x = max(v0 - x1, x0 - v1)
            assert max(sep_y, sep_x) >= 1, (i, j)
    valid, onehot, counts = pack_masks(sizes, plan)
    assert float(valid.sum()) == sum(h * w for h, w in sizes)
    np.testing.assert_array_equal(np.asarray(onehot.sum(0)),
                                  np.asarray(counts))


@pytest.mark.parametrize('hw', [(160, 224), (64, 96)])
def test_packed_tower_matches_unpacked(hw):
    sizes = _fpn_sizes(*hw)
    rng = jax.random.PRNGKey(0)
    feats = [
        jax.random.normal(jax.random.fold_in(rng, i), (2, h, w, 32))
        for i, (h, w) in enumerate(sizes)
    ]
    kw = dict(num_classes=4, feat_channels=32, stacked_convs=2, reg_max=8,
              num_levels=5)
    ref = GFLHeadNet(**kw)
    packed = PackedGFLHeadNet(**kw)
    variables = ref.init(jax.random.PRNGKey(1), feats)
    # identical parameter trees: packed accepts the unpacked init verbatim
    chex = jax.tree_util.tree_structure(variables)
    assert chex == jax.tree_util.tree_structure(
        packed.init(jax.random.PRNGKey(1), feats))

    cls_a, reg_a = jax.jit(ref.apply)(variables, feats)
    cls_b, reg_b = jax.jit(packed.apply)(variables, feats)
    for lvl in range(5):
        np.testing.assert_allclose(np.asarray(cls_a[lvl]),
                                   np.asarray(cls_b[lvl]),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(reg_a[lvl]),
                                   np.asarray(reg_b[lvl]),
                                   rtol=2e-4, atol=2e-5)


def test_packed_grads_match():
    sizes = _fpn_sizes(96, 96)
    rng = jax.random.PRNGKey(2)
    feats = [
        jax.random.normal(jax.random.fold_in(rng, i), (1, h, w, 16))
        for i, (h, w) in enumerate(sizes)
    ]
    kw = dict(num_classes=3, feat_channels=16, stacked_convs=1, reg_max=4,
              num_levels=5)
    ref = GFLHeadNet(**kw)
    packed = PackedGFLHeadNet(**kw)
    variables = ref.init(jax.random.PRNGKey(3), feats)

    def loss(net):
        def f(params):
            cls, reg = net.apply({'params': params}, feats)
            return sum(jnp.mean(c ** 2) for c in cls) + \
                sum(jnp.mean(r ** 2) for r in reg)
        return f

    ga = jax.jit(jax.grad(loss(ref)))(variables['params'])
    gb = jax.jit(jax.grad(loss(packed)))(variables['params'])
    flat_a = jax.tree_util.tree_leaves(ga)
    flat_b = jax.tree_util.tree_leaves(gb)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_level_pack_knob_through_head():
    """cfg-level knob: GFLHead(level_pack=True) builds the packed net and
    produces the same detections as the default on shared params."""
    from ld_tpu.models.heads.gfl_head import GFLHead
    kw = dict(num_classes=4, in_channels=16, feat_channels=16,
              stacked_convs=1, reg_max=4,
              anchor_generator=dict(ratios=[1.0], octave_base_scale=8,
                                    scales_per_octave=1,
                                    strides=[8, 16, 32, 64, 128]))
    head_a = GFLHead(**kw)
    head_b = GFLHead(level_pack=True, **kw)
    sizes = _fpn_sizes(96, 128)
    feats = [
        jax.random.normal(jax.random.PRNGKey(i), (1, h, w, 16))
        for i, (h, w) in enumerate(sizes)
    ]
    variables = head_a.net.init(jax.random.PRNGKey(9), feats)
    cls_a, reg_a = head_a.net.apply(variables, feats)
    cls_b, reg_b = head_b.net.apply(variables, feats)
    for lvl in range(5):
        np.testing.assert_allclose(np.asarray(cls_a[lvl]),
                                   np.asarray(cls_b[lvl]),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(reg_a[lvl]),
                                   np.asarray(reg_b[lvl]),
                                   rtol=2e-4, atol=2e-5)
