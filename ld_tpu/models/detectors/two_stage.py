"""Two-stage detector (Faster R-CNN family) + its KD/LD wrapper.

Parity:
  * TwoStageDetector — /root/reference/mmdet/models/detectors/two_stage.py:10
    (backbone -> neck -> RPN -> proposals -> ROI head).
  * KnowledgeDistillationTwoStageDetector —
    /root/reference/mmdet/models/detectors/kd_two_stage.py:10: frozen teacher
    built from teacher_config; distillation flows through the RPN head
    (kd_two_stage.py:80-111 passes teacher RPN outputs + FPN features into
    rpn_head.forward_train); the ROI head trains normally. The reference
    ships no config for it — this implementation is exercised by unit tests.
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.utils.config import Config
from ld_tpu.models.necks.seq import build_neck_maybe_seq
from ld_tpu.utils.registry import BACKBONES, DETECTORS, HEADS, NECKS
from .kd_one_stage import _resolve_config


class TwoStageNet(nn.Module):
    """Backbone + neck + RPN parameter tree (the ROI net has its own tree —
    it consumes data-dependent roi features, so it is applied separately)."""
    backbone: nn.Module
    neck: Optional[nn.Module]
    rpn_net: nn.Module

    @nn.compact
    def __call__(self, images, train: bool = False):
        x = self.backbone(images, train)
        if self.neck is not None:
            x = self.neck(x, train)
        rpn_outs = self.rpn_net(list(x), train)
        return x, rpn_outs


@DETECTORS.register_module()
class TwoStageDetector:

    def __init__(self, backbone, neck=None, rpn_head=None, roi_head=None,
                 train_cfg=None, test_cfg=None, pretrained=None, **kwargs):
        train_cfg = train_cfg or {}
        test_cfg = test_cfg or {}
        self.backbone = BACKBONES.build(dict(backbone))
        self.neck = build_neck_maybe_seq(neck)
        rpn_cfg = dict(rpn_head or dict(type='RPNHead', in_channels=256))
        rpn_cfg.setdefault('train_cfg', train_cfg.get('rpn'))
        rpn_cfg.setdefault('test_cfg', test_cfg.get('rpn'))
        self.rpn_head = HEADS.build(rpn_cfg)
        roi_cfg = dict(roi_head or dict(type='StandardRoIHead'))
        roi_cfg.setdefault('train_cfg', train_cfg.get('rcnn'))
        roi_cfg.setdefault('test_cfg', test_cfg.get('rcnn'))
        # reference sabl configs express SABL as bbox_head type='SABLHead'
        # inside Standard/CascadeRoIHead — route to the bucketing roi heads
        bh = roi_cfg.get('bbox_head') or {}
        if isinstance(bh, list):
            if any((h or {}).get('type') == 'SABLHead' for h in bh) and \
                    roi_cfg.get('type') == 'CascadeRoIHead':
                roi_cfg['type'] = 'CascadeSABLRoIHead'
        elif bh.get('type') == 'SABLHead' and \
                roi_cfg.get('type') == 'StandardRoIHead':
            roi_cfg['type'] = 'SABLRoIHead'
        self.roi_head = HEADS.build(roi_cfg)
        self.net = TwoStageNet(self.backbone, self.neck, self.rpn_head.net)
        self.num_classes = self.roi_head.num_classes
        self.train_cfg = train_cfg
        self.test_cfg = test_cfg

    def init_variables(self, rng, input_shape=(1, 64, 64, 3)) -> Dict:
        r1, r2 = jax.random.split(rng)
        backbone_vars = self.net.init(r1, jnp.zeros(input_shape))
        # ROI nets initialized with dummy roi batches (channel count from
        # the extractor's out_channels when given — C4 configs pool raw
        # 1024-ch backbone features — else from the neck)
        c = getattr(self.roi_head, 'ext_channels', None) or \
            (getattr(self.neck, 'out_channels', 256) if self.neck else 256)
        r2, r3 = jax.random.split(r2)
        if hasattr(self.roi_head, 'init_all_variables'):
            variables = dict(backbone_vars)
            variables['params'] = dict(variables['params'])
            variables['params']['roi_head'] = \
                self.roi_head.init_all_variables(r2, c)
            return variables
        roi_vars = self.roi_head.net.init(
            r2, jnp.zeros((1, self.roi_head.roi_size,
                           self.roi_head.roi_size, c)))
        variables = dict(backbone_vars)
        variables['params'] = dict(variables['params'])
        variables['params']['roi_head'] = dict(bbox=roi_vars['params'])
        if self.roi_head.mask_head is not None:
            mask_vars = self.roi_head.mask_head.net.init(
                r3, jnp.zeros((1, self.roi_head.mask_roi_size,
                               self.roi_head.mask_roi_size, c)))
            variables['params']['roi_head']['mask'] = mask_vars['params']
        return variables

    def frozen_param_paths(self):
        paths = ['backbone/' + p for p in self.backbone.frozen_param_paths()]
        roi_frozen = getattr(self.roi_head, 'frozen_param_paths', None)
        if callable(roi_frozen):
            paths += roi_frozen()
        return paths

    def _split(self, variables):
        params = dict(variables['params'])
        roi_params = {'params': params.pop('roi_head')}
        main = {'params': params,
                'batch_stats': variables.get('batch_stats', {})}
        return main, roi_params

    def extract(self, variables, images, train=False):
        main, roi = self._split(variables)
        if train:
            # live-BN support (norm_eval=False): see single_stage.py apply —
            # stats stashed for make_train_step to thread into TrainState
            def fwd(main, images):
                return self.net.apply(main, images, train=True,
                                      mutable=['batch_stats'])
            if getattr(self, '_remat', False):
                # student-forward-scoped remat (see single_stage.py apply)
                fwd = jax.checkpoint(fwd)
            (feats, rpn_outs), mut = fwd(main, images)
            self._last_batch_stats = mut.get('batch_stats', {})
        else:
            feats, rpn_outs = self.net.apply(main, images, train=False)
        return feats, rpn_outs, roi

    def forward_train(self, variables, batch, rng=None
                      ) -> Dict[str, jnp.ndarray]:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        feats, rpn_outs, roi_vars = self.extract(variables, batch['image'],
                                                 train=True)
        featmap_sizes = [c.shape[1:3] for c in rpn_outs[0]]
        losses = dict(self.rpn_head.loss(rpn_outs, batch, featmap_sizes,
                                         rng=jax.random.fold_in(rng, 1)))
        proposals, prop_valid = self.rpn_head.get_proposals(
            rpn_outs, batch['img_hw'],
            cfg=self.train_cfg.get('rpn_proposal'))
        proposals = jax.lax.stop_gradient(proposals)
        roi_losses = self.roi_head.forward_train(
            roi_vars, list(feats), proposals, prop_valid, batch,
            rng=jax.random.fold_in(rng, 2))
        losses.update(roi_losses)
        return losses

    def forward_test(self, variables, batch, rescale=False):
        feats, rpn_outs, roi_vars = self.extract(variables, batch['image'])
        proposals, prop_valid = self.rpn_head.get_proposals(
            rpn_outs, batch['img_hw'])
        return self.roi_head.simple_test(
            roi_vars, list(feats), proposals, prop_valid, batch['img_hw'],
            batch.get('scale_factor'), rescale=rescale)

    simple_test = forward_test


for _name in ('FasterRCNN', 'MaskRCNN', 'CascadeRCNN', 'MaskScoringRCNN',
              'DynamicRCNN', 'GridRCNN', 'DoubleHeadRCNN',
              'HybridTaskCascade', 'SCNet', 'PointRend'):
    DETECTORS.register_module(name=_name, module=type(
        _name, (TwoStageDetector, ), {}))


@DETECTORS.register_module()
class FastRCNN(TwoStageDetector):
    """Fast R-CNN: the ROI head trained/tested on PRECOMPUTED proposals.

    Parity: /root/reference/mmdet/models/detectors/fast_rcnn.py — the config
    carries no rpn_head and the dataloader provides `proposals` per image.
    Here proposals arrive as batch['proposals'] (B, P, 4) with
    batch['proposals_valid'] (B, P) masks (TPU static shapes); without them
    the detector falls back to its own RPN (so shared two-stage tests and
    the default-RPN build path still work).
    """

    def forward_train(self, variables, batch, rng=None):
        if 'proposals' not in batch:
            return super().forward_train(variables, batch, rng)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        feats, _rpn_outs, roi_vars = self.extract(variables, batch['image'],
                                                  train=True)
        proposals = batch['proposals']
        prop_valid = batch.get(
            'proposals_valid',
            jnp.ones(proposals.shape[:2], bool))
        return dict(self.roi_head.forward_train(
            roi_vars, list(feats), proposals, prop_valid, batch,
            rng=jax.random.fold_in(rng, 2)))

    def forward_test(self, variables, batch, rescale=False):
        if 'proposals' not in batch:
            return super().forward_test(variables, batch, rescale)
        feats, _rpn_outs, roi_vars = self.extract(variables, batch['image'])
        proposals = batch['proposals']
        prop_valid = batch.get(
            'proposals_valid',
            jnp.ones(proposals.shape[:2], bool))
        return self.roi_head.simple_test(
            roi_vars, list(feats), proposals, prop_valid, batch['img_hw'],
            batch.get('scale_factor'), rescale=rescale)

    simple_test = forward_test


@DETECTORS.register_module()
class RPN(TwoStageDetector):
    """Standalone region-proposal network (reference detectors/rpn.py):
    trains only the RPN losses; testing returns the proposals as
    class-agnostic detections (B, max_per_img, 5)."""

    def __init__(self, backbone, neck=None, rpn_head=None, train_cfg=None,
                 test_cfg=None, pretrained=None, **kwargs):
        train_cfg = dict(train_cfg or {})
        test_cfg = dict(test_cfg or {})
        # reference rpn configs put the cfgs at top level, not under
        # 'rpn'/'rcnn' — normalize
        if 'rpn' not in train_cfg and train_cfg:
            train_cfg = dict(rpn=train_cfg)
        if 'rpn' not in test_cfg and test_cfg:
            test_cfg = dict(rpn=test_cfg)
        super().__init__(backbone, neck=neck, rpn_head=rpn_head,
                         roi_head=dict(type='StandardRoIHead',
                                       bbox_head=dict(num_classes=1)),
                         train_cfg=train_cfg, test_cfg=test_cfg,
                         pretrained=pretrained)

    def init_variables(self, rng, input_shape=(1, 64, 64, 3)):
        # no ROI head in a pure RPN: backbone + neck + rpn params only
        return self.net.init(rng, jnp.zeros(input_shape, jnp.float32))

    def _split(self, variables):
        main = {'params': dict(variables['params']),
                'batch_stats': variables.get('batch_stats', {})}
        main['params'].pop('roi_head', None)
        return main, {'params': {}}

    def forward_train(self, variables, batch, rng=None):
        _rng = rng if rng is not None else jax.random.PRNGKey(0)
        feats, rpn_outs, _ = self.extract(variables, batch['image'],
                                          train=True)
        featmap_sizes = [c.shape[1:3] for c in rpn_outs[0]]
        return dict(self.rpn_head.loss(rpn_outs, batch, featmap_sizes,
                                       rng=jax.random.fold_in(_rng, 1)))

    def forward_test(self, variables, batch, rescale=False):
        feats, rpn_outs, _ = self.extract(variables, batch['image'])
        proposals, prop_valid = self.rpn_head.get_proposals(
            rpn_outs, batch['img_hw'], cfg=self.test_cfg.get('rpn'))
        # proposals carry objectness in col 4 when the head provides it;
        # otherwise rank order is the score
        b, p = proposals.shape[:2]
        if proposals.shape[-1] == 4:
            scores = jnp.broadcast_to(
                jnp.linspace(1.0, 0.0, p, endpoint=False)[None], (b, p))
            dets = jnp.concatenate([proposals, scores[..., None]], -1)
        else:
            dets = proposals
        if rescale and batch.get('scale_factor') is not None:
            sf = batch['scale_factor']
            dets = dets.at[..., :4].set(dets[..., :4] / sf[:, None, :])
        labels = jnp.zeros((b, p), jnp.int32)
        return dets, labels, prop_valid

    simple_test = forward_test


@DETECTORS.register_module()
class KnowledgeDistillationTwoStageDetector(TwoStageDetector):

    def __init__(self, backbone, neck, rpn_head, roi_head, teacher_config,
                 teacher_ckpt=None, eval_teacher=True, output_feature=False,
                 train_cfg=None, test_cfg=None, pretrained=None, **kwargs):
        super().__init__(backbone, neck, rpn_head, roi_head, train_cfg,
                         test_cfg, pretrained)
        if isinstance(teacher_config, str):
            teacher_config = Config.fromfile(_resolve_config(teacher_config))
        self.teacher = DETECTORS.build(dict(teacher_config['model']))
        self.teacher_ckpt = teacher_ckpt
        self.output_feature = output_feature

    def init_teacher_variables(self, rng, input_shape=(1, 64, 64, 3)):
        return self.teacher.init_variables(rng, input_shape)

    def forward_train(self, variables, batch, teacher_variables=None,
                      rng=None) -> Dict[str, jnp.ndarray]:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        feats, rpn_outs, roi_vars = self.extract(variables, batch['image'],
                                                 train=True)
        t_feats, t_rpn_outs, _ = self.teacher.extract(teacher_variables,
                                                      batch['image'])
        t_rpn_outs = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                            t_rpn_outs)
        featmap_sizes = [c.shape[1:3] for c in rpn_outs[0]]
        rpn_loss_fn = getattr(self.rpn_head, 'loss_with_teacher', None)
        if rpn_loss_fn is not None:
            losses = dict(rpn_loss_fn(rpn_outs, batch, featmap_sizes,
                                      t_rpn_outs,
                                      rng=jax.random.fold_in(rng, 1)))
        else:
            losses = dict(self.rpn_head.loss(rpn_outs, batch, featmap_sizes,
                                             rng=jax.random.fold_in(rng, 1)))
        proposals, prop_valid = self.rpn_head.get_proposals(
            rpn_outs, batch['img_hw'],
            cfg=self.train_cfg.get('rpn_proposal'))
        proposals = jax.lax.stop_gradient(proposals)
        roi_losses = self.roi_head.forward_train(
            roi_vars, list(feats), proposals, prop_valid, batch,
            rng=jax.random.fold_in(rng, 2))
        losses.update(roi_losses)
        return losses


@DETECTORS.register_module()
class TridentFasterRCNN(TwoStageDetector):
    """Faster R-CNN over TridentResNet (trident_faster_rcnn.py): the
    backbone folds its three weight-shared branches into the batch axis
    (B -> 3B), so training tiles the ground truth per branch (exactly the
    reference's image/proposal concat) and testing keeps only the
    `test_branch_idx` slice of every feature/RPN map."""

    def _num_branch(self):
        return getattr(self.backbone, 'num_branch', 3)

    def forward_train(self, variables, batch, rng=None):
        nb = self._num_branch()
        tiled = dict(batch)
        for k in ('gt_bboxes', 'gt_labels', 'gt_valid', 'img_hw',
                  'gt_masks'):
            if k in tiled:
                v = tiled[k]
                tiled[k] = jnp.tile(v, (nb, ) + (1, ) * (v.ndim - 1))
        return super().forward_train(variables, tiled, rng)

    def forward_test(self, variables, batch, rescale=False):
        feats, rpn_outs, roi_vars = self.extract(variables, batch['image'])
        nb = self._num_branch()
        idx = getattr(self.backbone, 'test_branch_idx', 1)
        b = batch['image'].shape[0]
        sl = slice(idx * b, (idx + 1) * b)
        feats = [f[sl] for f in feats]
        rpn_outs = jax.tree_util.tree_map(lambda x: x[sl], rpn_outs)
        proposals, prop_valid = self.rpn_head.get_proposals(
            rpn_outs, batch['img_hw'])
        return self.roi_head.simple_test(
            roi_vars, list(feats), proposals, prop_valid, batch['img_hw'],
            batch.get('scale_factor'), rescale=rescale)

    simple_test = forward_test
