"""Post-training int8 quantization for TPU serving.

The reference ships TensorRT int8 deployment through onnx
(/root/reference/docs/tutorials/onnx2tensorrt.md); the TPU-native
equivalent quantizes the conv compute path directly in JAX.

MEASURED REALITY CHECK (docs/PERF.md int8 section): although v5e+ MXUs
rate int8 at ~2x bf16 on paper, XLA's TPU conv lowering does NOT hit an
int8 fast path at detection shapes — end-to-end GFL-R50 int8 measured
0.26x the fp32 rate (35.8 vs 139.6 img/s batch 1), so this module is a
correctness-complete deployment OPTION, not a speed lever on current
XLA. bf16 is the serving dtype. Revisit with a Pallas int8 kernel if
int8 serving becomes a requirement.

Design — an execution-strategy transform, NOT a model rewrite:
  * flax `nn.intercept_methods` swaps every intercepted `nn.Conv.__call__`
    for: quantize activations (per-tensor static scale, symmetric int8) ->
    int8 conv (`preferred_element_type=int32`) -> dequantize with the
    per-output-channel weight scales -> fp bias add. The parameter tree,
    checkpoints, and every module definition are untouched; weights are
    re-quantized from the live fp params inside the jitted graph (a cheap
    elementwise op on weight-sized tensors, constant-folded when params
    are donated/cached by XLA).
  * Activation scales come from `calibrate`: a jitted forward whose
    interceptor RETURNS each conv input's max-abs as an auxiliary output
    (keyed by module path + kernel shape), max-accumulated over
    calibration batches on the host.
  * BatchNorm/GN/ReLU epilogues stay in fp exactly as the float graph has
    them — XLA fuses them into the int32->fp dequant epilogue, so the only
    numerics change is the int8 rounding of conv inputs/weights.
  * Prediction convs (cls/reg outputs, DGQP reg_conf, RPN heads, ...)
    are AP-critical and excluded by default (`DEFAULT_SKIP`); DCN/CARAFE/
    grid-sample ops are custom (not nn.Conv) and never intercepted.

Accuracy contract is empirical, like every PTQ pipeline: use
tools/analysis_tools/quant_agreement.py to measure det-set agreement vs
the fp graph before deploying (tests/test_quant.py pins >0.9 on the
synthetic-trained miniature detector and exact dequant algebra on a
controlled conv).
"""
from __future__ import annotations

import re
from typing import Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# substrings of module paths that must stay fp (prediction layers; the
# integral/DFL decode consumes gfl_reg logits whose fine structure a
# per-tensor activation scale would crush)
DEFAULT_SKIP: Tuple[str, ...] = (
    'gfl_cls', 'gfl_reg', 'conv_cls', 'conv_reg', 'conv_centerness',
    'retina_cls', 'retina_reg', 'rpn_cls', 'rpn_reg', 'fc_cls', 'fc_reg',
    'cls_score', 'bbox_pred', 'reg_conf', 'conf_pred', 'objectness',
    'mask_pred', 'vfnet_cls', 'atss_cls', 'atss_reg', 'tood_cls',
    'tood_reg',
)


def _conv_key(mod) -> str:
    kernel = mod.variables['params']['kernel']
    return '/'.join(str(p) for p in mod.path) + ':' + \
        'x'.join(str(s) for s in kernel.shape)


def _is_plain_conv(mod) -> bool:
    # exact type: subclasses (weight-standardized variants etc.) transform
    # the kernel inside __call__, which a raw-param requantization would
    # silently skip. quantized_conv also assumes an unmasked 2-D NHWC conv
    # (ADVICE r3): masked or 1-D/3-D convs take the fp fallback path
    # rather than being quantized with wrong semantics.
    return (type(mod) is nn.Conv and mod.mask is None
            and len(mod.kernel_size) == 2)


def _should_quant(mod, skip: Sequence[str]) -> bool:
    if not _is_plain_conv(mod):
        return False
    path = '/'.join(str(p) for p in mod.path)
    return not any(s in path for s in skip)


def make_calibration_interceptor(records: Dict[str, jnp.ndarray],
                                 skip: Sequence[str] = DEFAULT_SKIP):
    """Interceptor that records each quantizable conv input's max-abs
    (a traced scalar) into `records` — call inside the traced function and
    return `records` as an output."""
    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if _should_quant(mod, skip) and args and isinstance(
                args[0], jnp.ndarray):
            key = _conv_key(mod)
            amax = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
            records[key] = jnp.maximum(records[key], amax) \
                if key in records else amax
        return next_fn(*args, **kwargs)
    return interceptor


def calibrate(forward: Callable, variables, batches,
              skip: Sequence[str] = DEFAULT_SKIP) -> Dict[str, float]:
    """Run `forward(variables, batch)` over calibration batches and return
    {conv_key: activation max-abs} as host floats.

    `forward` must execute the model's applies directly (it is wrapped in
    one jit here; do not pre-jit it).
    """
    @jax.jit
    def one(variables, batch):
        records: Dict[str, jnp.ndarray] = {}
        with nn.intercept_methods(
                make_calibration_interceptor(records, skip)):
            forward(variables, batch)
        return records

    out: Dict[str, float] = {}
    for batch in batches:
        recs = jax.device_get(one(variables, batch))
        for k, v in recs.items():
            out[k] = max(out.get(k, 0.0), float(v))
    return out


def _norm_pair(v):
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def quantized_conv(mod: nn.Conv, x: jnp.ndarray, amax: float) -> jnp.ndarray:
    """int8 execution of one nn.Conv call: per-tensor activation scale
    (symmetric, from calibration), per-output-channel weight scales
    (from the live fp kernel), int32 accumulation, fp epilogue."""
    params = mod.variables['params']
    kernel = params['kernel'].astype(jnp.float32)
    # per-C_out symmetric scale over (kh, kw, C_in)
    sw = jnp.max(jnp.abs(kernel), axis=tuple(range(kernel.ndim - 1)))
    sw = jnp.maximum(sw / 127.0, 1e-12)
    qw = jnp.clip(jnp.round(kernel / sw), -127, 127).astype(jnp.int8)
    sx = max(float(amax) / 127.0, 1e-12)
    qx = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / sx)),
                  -127, 127).astype(jnp.int8)

    pad = mod.padding
    if isinstance(pad, str):
        padding = pad
    elif isinstance(pad, int):
        padding = [(pad, pad)] * 2
    else:
        padding = [tuple(p) if not isinstance(p, int) else (p, p)
                   for p in pad]
    y = jax.lax.conv_general_dilated(
        qx, qw,
        window_strides=_norm_pair(mod.strides or 1),
        padding=padding,
        lhs_dilation=_norm_pair(mod.input_dilation or 1),
        rhs_dilation=_norm_pair(mod.kernel_dilation or 1),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=mod.feature_group_count,
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * sw)
    if mod.use_bias:
        y = y + params['bias'].astype(jnp.float32)
    out_dtype = mod.dtype or x.dtype
    return y.astype(out_dtype)


def make_int8_interceptor(amax: Dict[str, float],
                          skip: Sequence[str] = DEFAULT_SKIP):
    """Interceptor that runs every calibrated, non-skipped nn.Conv in int8.

    Convs without a calibration record (e.g. newly added modules) fall
    back to the fp path — quantization is strictly opt-in per conv.
    """
    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if (_should_quant(mod, skip) and args
                and isinstance(args[0], jnp.ndarray)):
            key = _conv_key(mod)
            if key in amax:
                return quantized_conv(mod, args[0], amax[key])
        return next_fn(*args, **kwargs)
    return interceptor


def int8_forward(forward: Callable, amax: Dict[str, float],
                 skip: Sequence[str] = DEFAULT_SKIP) -> Callable:
    """Wrap a forward callable so all calibrated convs execute in int8.

    `forward(variables, batch, ...)` must execute module applies directly;
    jit the RETURNED callable.
    """
    def wrapped(*args, **kwargs):
        with nn.intercept_methods(make_int8_interceptor(amax, skip)):
            return forward(*args, **kwargs)
    return wrapped


def calibrate_detector(detector, variables, images,
                       skip: Sequence[str] = DEFAULT_SKIP,
                       img_hw=None) -> Dict[str, float]:
    """Convenience: calibrate a detector's forward_test over (B, H, W, 3)
    image arrays (already normalized/padded, as fed to forward_test)."""
    def fwd(variables, image):
        h = jnp.full((image.shape[0], 2), 0.0).at[:, 0].set(
            image.shape[1]).at[:, 1].set(image.shape[2]) \
            if img_hw is None else img_hw
        detector.forward_test(
            variables, dict(image=image, img_hw=h,
                            scale_factor=jnp.ones((image.shape[0], 4))),
            rescale=False)
    return calibrate(fwd, variables, images, skip)
