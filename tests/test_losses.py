"""Loss tests. The KD/QFL/DFL oracles are computed with torch (CPU) ops —
an implementation-independent check of the math, not a port of the reference."""
import pytest

pytestmark = pytest.mark.smoke  # high-value numerics/oracle gate (<10 min total, README)
import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from ld_tpu.models.losses import (quality_focal_loss, distribution_focal_loss,
                                  knowledge_distillation_kl_div_loss,
                                  GIoULoss, QualityFocalLoss,
                                  DistributionFocalLoss,
                                  KnowledgeDistillationKLDivLoss,
                                  weight_reduce_loss, sigmoid_focal_loss)

RNG = np.random.RandomState(42)


def test_kd_kl_matches_torch():
    s = RNG.randn(37, 17).astype(np.float32) * 3
    t = RNG.randn(37, 17).astype(np.float32) * 3
    for T in (2, 10):
        got = np.asarray(
            knowledge_distillation_kl_div_loss(
                jnp.asarray(s), jnp.asarray(t), reduction='none', T=T))
        want = (F.kl_div(
            F.log_softmax(torch.from_numpy(s) / T, dim=1),
            F.softmax(torch.from_numpy(t) / T, dim=1),
            reduction='none').mean(1) * T * T).numpy()
        # fp32 softmax accumulation order differs between XLA and torch
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


def test_dfl_matches_torch():
    pred = RNG.randn(29, 17).astype(np.float32)
    label = RNG.uniform(0, 15.9, size=(29, )).astype(np.float32)
    got = np.asarray(
        distribution_focal_loss(jnp.asarray(pred), jnp.asarray(label),
                                reduction='none'))
    tp = torch.from_numpy(pred)
    tl = torch.from_numpy(label)
    dl = tl.long()
    dr = dl + 1
    wl = dr.float() - tl
    wr = tl - dl.float()
    want = (F.cross_entropy(tp, dl, reduction='none') * wl +
            F.cross_entropy(tp, dr, reduction='none') * wr).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_qfl_matches_torch():
    N, C = 41, 20
    pred = (RNG.randn(N, C) * 2).astype(np.float32)
    label = RNG.randint(0, C + 1, size=(N, ))  # C == background
    score = RNG.uniform(0, 1, size=(N, )).astype(np.float32)
    score = np.where(label < C, score, 0.0).astype(np.float32)
    got = np.asarray(
        quality_focal_loss(jnp.asarray(pred),
                           (jnp.asarray(label), jnp.asarray(score)),
                           reduction='none', beta=2.0))
    # independent torch oracle (gather-style, matching the GFL paper)
    tp = torch.from_numpy(pred)
    sig = tp.sigmoid()
    loss = F.binary_cross_entropy_with_logits(
        tp, torch.zeros_like(tp), reduction='none') * sig.pow(2.0)
    pos = np.nonzero(label < C)[0]
    tl = torch.from_numpy(label[pos]).long()
    ts = torch.from_numpy(score[pos])
    sf = ts - sig[pos, tl]
    loss[pos, tl] = F.binary_cross_entropy_with_logits(
        tp[pos, tl], ts, reduction='none') * sf.abs().pow(2.0)
    want = loss.sum(1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_focal_matches_torch():
    N, C = 23, 11
    pred = (RNG.randn(N, C) * 2).astype(np.float32)
    label = RNG.randint(0, C + 1, size=(N, ))
    got = float(sigmoid_focal_loss(jnp.asarray(pred), jnp.asarray(label),
                                   reduction='sum'))
    tp = torch.from_numpy(pred)
    onehot = torch.zeros(N, C)
    m = label < C
    onehot[np.arange(N)[m], label[m]] = 1.0
    sig = tp.sigmoid()
    pt = (1 - sig) * onehot + sig * (1 - onehot)
    fw = (0.25 * onehot + 0.75 * (1 - onehot)) * pt.pow(2.0)
    want = float((F.binary_cross_entropy_with_logits(
        tp, onehot, reduction='none') * fw).sum())
    assert abs(got - want) / abs(want) < 1e-4


def test_weight_reduce_contract():
    loss = jnp.asarray([1.0, 1.0, 2.0])
    w = jnp.asarray([1.0, 0.0, 1.0])
    assert abs(float(weight_reduce_loss(loss, None, 'mean')) - 4 / 3) < 1e-6
    assert abs(float(weight_reduce_loss(loss, w, 'mean')) - 1.0) < 1e-6
    assert abs(float(weight_reduce_loss(loss, w, 'mean', avg_factor=2)) -
               1.5) < 1e-6
    np.testing.assert_allclose(
        np.asarray(weight_reduce_loss(loss, None, 'none')), [1., 1., 2.])


def test_loss_classes_weighting():
    qfl = QualityFocalLoss(loss_weight=1.0)
    pred = jnp.asarray(RNG.randn(10, 5).astype(np.float32))
    label = jnp.asarray(RNG.randint(0, 6, size=(10, )))
    score = jnp.asarray(RNG.uniform(0, 1, 10).astype(np.float32))
    w = jnp.ones((10, ))
    full = float(qfl(pred, (label, score), weight=w, avg_factor=10))
    half = float(qfl(pred, (label, score), weight=w * 0.5, avg_factor=10))
    assert abs(full - 2 * half) < 1e-5

    kd = KnowledgeDistillationKLDivLoss(loss_weight=0.25, T=10)
    a = jnp.asarray(RNG.randn(8, 17).astype(np.float32))
    b = jnp.asarray(RNG.randn(8, 17).astype(np.float32))
    v = float(kd(a, b, weight=jnp.ones(8), avg_factor=4.0))
    v2 = float(kd(a, b, weight=jnp.ones(8), avg_factor=8.0))
    assert abs(v - 2 * v2) < 1e-5


def test_giou_loss_zero_for_identical():
    giou = GIoULoss(loss_weight=2.0)
    b = jnp.asarray([[0., 0., 10., 10.], [5., 5., 8., 9.]])
    v = float(giou(b, b, weight=jnp.ones(2), avg_factor=2.0))
    assert abs(v) < 1e-5


def test_dfl_grad_finite():
    import jax
    pred = jnp.asarray(RNG.randn(6, 17).astype(np.float32))
    label = jnp.asarray(RNG.uniform(0, 15.9, 6).astype(np.float32))
    g = jax.grad(lambda p: distribution_focal_loss(p, label, reduction='sum')
                 .sum())(pred)
    assert np.isfinite(np.asarray(g)).all()
