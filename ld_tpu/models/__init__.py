from . import losses  # noqa: F401 — registers loss types
from . import backbones  # noqa: F401
from . import necks  # noqa: F401
from . import heads  # noqa: F401
from . import detectors  # noqa: F401

import inspect

import jax.numpy as jnp

from ld_tpu.utils.registry import BACKBONES, DETECTORS, HEADS, NECKS

# model-cfg keys that name sub-modules whose compute dtype can be lowered,
# and the registry their 'type' lives in
_DTYPE_SLOTS = (('backbone', BACKBONES), ('neck', NECKS),
                ('bbox_head', HEADS), ('rpn_head', HEADS))


def _accepts_dtype(cls) -> bool:
    if hasattr(cls, '__dataclass_fields__'):  # flax nn.Module
        return 'dtype' in cls.__dataclass_fields__
    for c in inspect.getmro(cls):
        init = c.__dict__.get('__init__')
        if init is not None and \
                'dtype' in inspect.signature(init).parameters:
            return True
    return False


def apply_model_dtype(model_cfg: dict, dtype) -> dict:
    """Inject a compute dtype into every sub-module config that supports it.

    Implements the top-level `dtype = 'bfloat16'` key of the fp16 config
    family (configs/fp16/ — the TPU-native stand-in for the reference's
    fp16+loss-scale training, /root/reference/configs/fp16/*.py +
    mmcv Fp16OptimizerHook): backbone/neck/head towers compute in bf16
    while params, predictions, losses, and the optimizer stay fp32 (each
    head casts its outputs back to fp32 — e.g. gfl_head.py GFLHeadNet).
    Sub-modules whose class does not take `dtype` are left untouched; an
    explicit per-module `dtype` in the config wins. Returns a new dict.
    """
    dtype = jnp.dtype(dtype)
    out = dict(model_cfg)
    for key, registry in _DTYPE_SLOTS:
        sub = out.get(key)
        if not isinstance(sub, dict) or 'dtype' in sub:
            continue
        cls = registry.get(sub.get('type')) if isinstance(
            sub.get('type'), str) else sub.get('type')
        if cls is not None and _accepts_dtype(cls):
            out[key] = dict(sub, dtype=dtype)
    tc = out.get('teacher_config')
    if isinstance(tc, dict) and isinstance(tc.get('model'), dict):
        out['teacher_config'] = dict(tc,
                                     model=apply_model_dtype(tc['model'],
                                                             dtype))
    return out


def build_detector(cfg, train_cfg=None, test_cfg=None, dtype=None):
    """Config-driven detector construction.

    Parity: /root/reference/mmdet/models/builder.py:15-35. `dtype` (or a
    top-level `dtype` key in the surrounding config, threaded here by the
    train/inference APIs) lowers supporting towers via apply_model_dtype.
    """
    cfg = dict(cfg)
    if train_cfg is not None:
        cfg.setdefault('train_cfg', train_cfg)
    if test_cfg is not None:
        cfg.setdefault('test_cfg', test_cfg)
    if dtype is not None:
        cfg = apply_model_dtype(cfg, dtype)
    return DETECTORS.build(cfg)
