"""Conv+BN algebraic folding — the reference's --fuse-conv-bn
(mmcv.cnn.fuse_conv_bn, used by /root/reference/tools/test.py:26 and
tools/analysis_tools/benchmark.py:22).

At eval a BatchNorm is y = (x - mean) * gamma / sqrt(var + eps) + beta.
When x is the output of a conv that is LINEAR in its kernel (nn.Conv, DCN,
SpaceToDepthStem — everything this repo pairs with BN), the multiplicative
factor folds exactly into the kernel's output channels:

    kernel' = kernel * f,   f = gamma / sqrt(var + eps)
    and the BN collapses to a bias add:
    scale' = 1, bias' = beta - mean * f, mean' = 0, var' = 1 - eps

so post-fold BN computes (x - 0) * 1/sqrt((1-eps)+eps) + bias' = x + bias'
— value-identical to the unfused graph in exact arithmetic.

TPU note: unlike torch eager (where the fold removes a separate BN kernel
launch), XLA already fuses the eval-mode BN elementwise math into the conv
epilogue, so the measured speedup here is ~0. The transform is provided
for CLI parity and for exporting minimal inference weight trees.

Do NOT apply to ConvWS backbones (conv_cfg type='ConvWS'): weight
standardization renormalizes the kernel per output channel, making the
fold a silent no-op on the kernel while still zeroing the BN — wrong
numerics. In practice WS is always paired with GN (which has no
batch_stats and is therefore never touched), but callers passing a model
config should gate on it; `fuse_conv_bn_cfg_ok` does the check.
"""
import numpy as np


def fuse_conv_bn_cfg_ok(model_cfg) -> bool:
    """True when the model config has no ConvWS conv_cfg anywhere."""
    def scan(node):
        if isinstance(node, dict):
            if node.get('type') == 'ConvWS':
                return False
            return all(scan(v) for v in node.values())
        if isinstance(node, (list, tuple)):
            return all(scan(v) for v in node)
        return True
    return scan(model_cfg)


def fuse_conv_bn(variables, eps: float = 1e-5):
    """Fold every conv→BN pair in a variables tree; returns a new tree.

    Pairs are discovered from the batch_stats tree (only BatchNorm nodes
    have running stats): a stats node `<name>/bn/{mean,var}` pairs with
    the sibling conv whose name is `<name>` with 'norm' → 'conv'
    (norm1→conv1, stem_norm2→stem_conv2, downsample_norm→downsample_conv —
    the repo-wide convention, ld_tpu/models/backbones/resnet.py). Unpaired
    BNs (e.g. after an add, or RetinaSepBN per-level towers) are left
    untouched.

    The arithmetic runs in HOST numpy (device arrays are pulled once):
    per-leaf device ops would be hundreds of tiny dispatches, which is
    pathological through a relay-attached TPU (~0.4 s each, docs/PERF.md).
    Pass the result straight to a jitted step — upload happens once there.
    """
    import jax
    variables = jax.device_get(variables)
    params = _copy(variables.get('params', {}))
    stats = _copy(variables.get('batch_stats', {}))
    _walk(params, stats, eps)
    out = dict(variables)
    out['params'] = params
    out['batch_stats'] = stats
    return out


def _copy(node):
    if isinstance(node, dict):
        return {k: _copy(v) for k, v in node.items()}
    return node


def _walk(pnode, snode, eps):
    if not isinstance(snode, dict) or not isinstance(pnode, dict):
        return
    for key, sval in snode.items():
        if (isinstance(sval, dict) and isinstance(sval.get('bn'), dict)
                and 'mean' in sval['bn'] and 'norm' in key):
            conv_key = key.replace('norm', 'conv')
            conv = pnode.get(conv_key)
            bnp = pnode.get(key, {}).get('bn')
            if (isinstance(conv, dict) and 'kernel' in conv
                    and isinstance(bnp, dict) and 'scale' in bnp):
                kernel = conv['kernel']
                mean, var = sval['bn']['mean'], sval['bn']['var']
                gamma, beta = bnp['scale'], bnp['bias']
                if kernel.ndim >= 2 and kernel.shape[-1] == gamma.shape[0]:
                    kernel = np.asarray(kernel)
                    f = np.asarray(gamma) / np.sqrt(np.asarray(var) + eps)
                    conv['kernel'] = (kernel * f).astype(kernel.dtype)
                    bnp['scale'] = np.ones_like(gamma)
                    bnp['bias'] = (np.asarray(beta) -
                                   np.asarray(mean) * f).astype(beta.dtype)
                    sval['bn']['mean'] = np.zeros_like(mean)
                    sval['bn']['var'] = np.full_like(var, 1.0 - eps)
    for key, pval in pnode.items():
        if isinstance(pval, dict):
            _walk(pval, snode.get(key, {}), eps)
