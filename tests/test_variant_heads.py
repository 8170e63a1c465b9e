"""LD variant heads (FCOS-GFL, Retina-GFL) integration tests."""
import jax
import numpy as np, jax.numpy as jnp
import ld_tpu
from ld_tpu.models import build_detector

rs = np.random.RandomState(0)
B,G = 2,6
gt = np.zeros((B,G,4),np.float32); gt[:,0]=[5,5,40,50]; gt[:,1]=[20,15,80,60]
valid = np.zeros((B,G),bool); valid[:,:2]=True
batch = dict(image=jnp.asarray(rs.randn(B,64,96,3).astype(np.float32)),
             gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B,G),np.int32),
             gt_valid=jnp.asarray(valid), img_hw=jnp.asarray([[64.,96.]]*B))

base = dict(backbone=dict(type='ResNet', depth=18, frozen_stages=1, norm_eval=True),
    neck=dict(type='FPN', in_channels=[64,128,256,512], out_channels=32,
              start_level=1, add_extra_convs='on_output', num_outs=5),
    test_cfg=dict(nms_pre=100, score_thr=0.05, nms=dict(type='nms', iou_threshold=0.6), max_per_img=10))

def run(tag, head_cfg, train_cfg, ld=False, teacher_head=None):
    cfg = dict(type='KnowledgeDistillationSingleStageDetector' if ld else 'GFL',
               bbox_head=head_cfg, train_cfg=train_cfg, **base)
    if ld:
        tcfg = dict(type='GFL', bbox_head=teacher_head, train_cfg=train_cfg, **base)
        cfg['teacher_config'] = dict(model=tcfg)
        cfg['output_feature'] = False
    det = build_detector(cfg)
    sv = det.init_variables(jax.random.PRNGKey(0), (1,64,96,3))
    if ld:
        tv = det.init_teacher_variables(jax.random.PRNGKey(1), (1,64,96,3))
        losses = det.forward_train(sv, batch, teacher_variables=tv)
    else:
        losses = det.forward_train(sv, batch)
    print(tag, {k: round(float(x),4) for k,x in losses.items()})
    assert all(np.isfinite(float(x)) for x in losses.values()), tag
    d,l,v = det.forward_test(sv, dict(image=batch['image'], img_hw=batch['img_hw']))
    assert d.shape == (2,10,5), tag

common = dict(num_classes=6, in_channels=32, stacked_convs=1, feat_channels=32)
fl = dict(type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25, loss_weight=1.0)
gi = dict(type='GIoULoss', loss_weight=2.0)
maxiou = dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0), allowed_border=-1, pos_weight=-1)

# FCOS-GFL + LD
fcos_head = dict(type='FCOSGFLHead', strides=[8,16,32,64,128], loss_cls=fl, loss_bbox=gi,
                 center_sampling=True, centerness_on_reg=True, **common)

# Retina-GFL + LD
ag = dict(type='AnchorGenerator', octave_base_scale=4, scales_per_octave=3,
          ratios=[0.5,1.0,2.0], strides=[8,16,32,64,128])
ret_head = dict(type='RetinaGFLHead', anchor_generator=ag, loss_cls=fl, loss_bbox=gi, **common)

def test_fcos_gfl():
    fh = dict(fcos_head)
    run('fcos', fh, maxiou)


def test_ld_fcos():
    run('ld_fcos', dict(fcos_head, type='LDFCOSHead',
        loss_ld=dict(type='KnowledgeDistillationKLDivLoss', loss_weight=0.25, T=10),
        loss_kd=dict(type='KnowledgeDistillationKLDivLoss', loss_weight=10, T=2)),
        maxiou, ld=True, teacher_head=fcos_head)


def test_ld_fcos_compare():
    # compare.py ablation variant: cls KD off by default (loss_kd=None)
    run('ld_fcos_compare', dict(fcos_head, type='LDFCOSCompareHead',
        loss_ld=dict(type='KnowledgeDistillationKLDivLoss', loss_weight=0.25, T=10)),
        maxiou, ld=True, teacher_head=fcos_head)


def test_retina_gfl():
    run('retina', ret_head, maxiou)


def test_ld_retina():
    run('ld_retina', dict(ret_head, type='LDRetinaHead',
        loss_ld=dict(type='KnowledgeDistillationKLDivLoss', loss_weight=5, T=10),
        loss_kd=dict(type='KnowledgeDistillationKLDivLoss', loss_weight=10, T=8)),
        maxiou, ld=True, teacher_head=ret_head)



def test_ldv2_gibox_imitation_trains():
    """Regression: LDv2Head._gi_mask must keep the parent call signature —
    the shipped ldv2 config (imitation_method='gibox', loss_im weight 2,
    output_feature=True) crashed with a TypeError before the fix."""
    atss = dict(assigner=dict(type='ATSSAssigner', topk=9),
                allowed_border=-1, pos_weight=-1)
    qfl = dict(type='QualityFocalLoss', use_sigmoid=False, beta=2.0,
               loss_weight=1.0)
    ag2 = dict(type='AnchorGenerator', ratios=[1.0], octave_base_scale=8,
               scales_per_octave=1, strides=[8, 16, 32, 64, 128])
    v2_teacher = dict(type='GFocalHead', anchor_generator=ag2, loss_cls=qfl,
                      loss_bbox=gi, reg_topk=4, reg_channels=16,
                      add_mean=True, reg_max=16, **common)
    v2_student = dict(v2_teacher, type='LDv2Head',
                      loss_ld=dict(type='KnowledgeDistillationKLDivLoss',
                                   loss_weight=0.25, T=10),
                      loss_im=dict(type='IMLoss', loss_weight=2.0),
                      imitation_method='gibox')
    cfg = dict(type='KnowledgeDistillationSingleStageDetector',
               bbox_head=v2_student, train_cfg=atss,
               teacher_config=dict(model=dict(type='GFL',
                                              bbox_head=v2_teacher,
                                              train_cfg=atss, **base)),
               output_feature=True, **base)
    det = build_detector(cfg)
    sv = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    tv = det.init_teacher_variables(jax.random.PRNGKey(1), (1, 64, 96, 3))
    losses = det.forward_train(sv, batch, teacher_variables=tv)
    assert float(losses['loss_im']) != 0.0
    assert all(np.isfinite(float(x)) for x in losses.values())
