"""Teacher-student distillation detector (single stage).

Capability parity with /root/reference/mmdet/models/detectors/kd_one_stage.py:12:
a student single-stage detector plus a frozen teacher built from
`teacher_config` / `teacher_ckpt`; the teacher runs forward-only and its
outputs (and optionally FPN features, `output_feature=True`) feed the LD head.

TPU-first: the reference hides the teacher from `parameters()` via a
`__setattr__` hack and wraps its forward in `torch.no_grad`
(kd_one_stage.py:69-108). Functionally that's just "teacher params are not in
the optimized tree and its outputs carry stop_gradient" — here teacher
variables are a separate pytree argument of the jitted train step, and
`jax.lax.stop_gradient` is applied to every teacher output, so XLA never
builds a teacher backward graph at all.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ld_tpu.utils.config import Config
from ld_tpu.utils.registry import DETECTORS
from .single_stage import SingleStageDetector


def _resolve_config(path: str) -> str:
    if os.path.exists(path):
        return path
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    cand = os.path.join(here, path)
    if os.path.exists(cand):
        return cand
    raise FileNotFoundError(f'teacher config {path} not found')


@DETECTORS.register_module()
class KnowledgeDistillationSingleStageDetector(SingleStageDetector):

    def __init__(self, backbone, neck, bbox_head, teacher_config,
                 teacher_ckpt=None, eval_teacher=True, output_feature=False,
                 train_cfg=None, test_cfg=None, pretrained=None, **kwargs):
        super().__init__(backbone, neck, bbox_head, train_cfg, test_cfg,
                         pretrained)
        # NOTE: the teacher always runs with frozen statistics here (all
        # backbones default to norm_eval, and its params are stop-gradient
        # pytrees) — with eval_teacher=False the reference merely lets
        # teacher BN follow train mode, which is a no-op under frozen BN.
        self.eval_teacher = eval_teacher
        self.output_feature = output_feature
        if isinstance(teacher_config, str):
            teacher_config = Config.fromfile(_resolve_config(teacher_config))
        # kept for gates that need the raw teacher config (e.g. the
        # fold_teacher_bn ConvWS check in apis/train.py)
        self.teacher_model_cfg = dict(teacher_config['model'])
        self.teacher = DETECTORS.build(self.teacher_model_cfg)
        self.teacher_ckpt = teacher_ckpt

    def init_teacher_variables(self, rng, input_shape=(1, 64, 64, 3)):
        """Random-init teacher variables (load real ones via
        ld_tpu.utils.checkpoint.load_checkpoint / torch converter)."""
        return self.teacher.init_variables(rng, input_shape)

    def forward_train(self, variables, batch,
                      teacher_variables=None) -> Dict[str, jnp.ndarray]:
        outs, feats = self.apply(variables, batch['image'], train=True,
                                 output_features=True)
        t_outs, t_feats = self.teacher.apply(
            teacher_variables, batch['image'], train=False,
            output_features=True)
        # frozen teacher: no gradient ever flows into it
        t_outs = jax.tree_util.tree_map(jax.lax.stop_gradient, t_outs)
        t_feats = jax.tree_util.tree_map(jax.lax.stop_gradient, t_feats)

        featmap_sizes = [c.shape[1:3] for c in outs[0]]
        # full teacher output tuple: (cls, bbox[, cls_feat]) — LDv2 teachers
        # carry the pre-DGQP logits as a 3rd element
        return self.bbox_head.loss(
            outs, batch, featmap_sizes, tuple(t_outs),
            student_feats=feats if self.output_feature else None,
            teacher_feats=t_feats if self.output_feature else None)


@DETECTORS.register_module()
class IMDetector(KnowledgeDistillationSingleStageDetector):
    """Pure feature-imitation detector (no teacher FPN features to the head's
    LD terms; imitation only). Parity:
    /root/reference/mmdet/models/detectors/imitation.py:11."""
    pass
