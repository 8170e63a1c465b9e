"""Upgrade mmdet-v1.x torch checkpoints to v2 layout before conversion.

Parity: /root/reference/tools/model_converters/upgrade_model_version.py.
mmdet v1 checkpoints differ from v2 in class-channel conventions; published
v1 detector weights need this surgery before `load_torch_checkpoint` can
map them onto ld_tpu:

  * v1 put background FIRST in softmax classifiers; v2 puts it LAST —
    cls weights/biases are rolled by one class group.
  * v1 regressed boxes for the background class too — class-aware reg
    channels drop the background group (4 fewer outputs).
  * v1 mask heads predicted a background mask — channel 0 is dropped.
  * two-stage v1 checkpoints keep heads at the top level; v2 nests them
    under `roi_head.` .
  * pre-0.5.3 RetinaNet used bare nn.Conv2d towers (`cls_convs.0.weight`);
    later ConvModule (`cls_convs.0.conv.weight`).

Operates torch .pth -> torch .pth (v2 naming), which
`ld_tpu.utils.checkpoint.load_torch_checkpoint` then consumes.

Usage:
    python tools/model_converters/upgrade_model_version.py in.pth out.pth \
        [--num-classes 81] [--two-stage] [--retina-pre053] [--ssd] \
        [--reg-class-agnostic]
"""
import argparse
import re

import numpy as np

HEAD_PREFIXES = ('bbox_head', 'mask_head', 'semantic_head', 'grid_head',
                 'mask_iou_head')
CLS_KEY = re.compile(
    r'(conv_cls|retina_cls|rpn_cls|fc_cls|fcos_cls|fovea_cls)\.'
    r'(weight|bias)')
REG_KEY = re.compile(r'(fc_reg|rpn_reg)\.(weight|bias)')
MASK_KEY = re.compile(r'conv_logits\.(weight|bias)')
TOWER_KEY = re.compile(r'(cls_convs|reg_convs)\.\d+\.(weight|bias)')


def bg_first_to_last(val, num_classes):
    """Roll softmax-classifier channels: v1 [bg, c1..cK] -> v2 [c1..cK, bg].
    Handles fc (out == num_classes), per-anchor conv (out % num_classes == 0)
    and leaves sigmoid/agnostic heads untouched."""
    val = np.asarray(val)
    if val.ndim == 1:
        return np.concatenate([val[1:], val[:1]], axis=0)
    out = val.shape[0]
    if out == num_classes:
        return np.concatenate([val[1:], val[:1]], axis=0)
    if out % num_classes == 0:
        g = val.reshape(-1, num_classes, *val.shape[1:])
        g = np.concatenate([g[:, 1:], g[:, :1]], axis=1)
        return g.reshape(val.shape)
    return val


def drop_bg_reg_group(val, num_classes):
    """Class-aware regression: drop the leading background 4-vector."""
    val = np.asarray(val)
    if val.shape[0] % num_classes != 0:
        return val
    g = val.reshape(num_classes, -1, *val.shape[1:])[1:]
    return g.reshape(-1, *val.shape[1:])


def drop_bg_mask_channel(val, num_classes):
    val = np.asarray(val)
    if val.shape[0] % num_classes != 0:
        return val
    if val.ndim == 1:
        return val[1:]
    g = val.reshape(num_classes, -1, *val.shape[1:])[1:]
    return g.reshape(-1, *val.shape[1:])


def upgrade_state_dict(state_dict, num_classes=81, two_stage=False,
                       retina_pre053=False, ssd=False,
                       reg_class_agnostic=False, upgrade_rpn=True):
    out = {}
    for key, val in state_dict.items():
        arr = np.asarray(val)
        new_key = key
        if two_stage and key.startswith(HEAD_PREFIXES):
            new_key = f'roi_head.{key}'

        if retina_pre053 and TOWER_KEY.search(key):
            # cls_convs.0.weight -> cls_convs.0.conv.weight
            leaf = key.rsplit('.', 1)[1]
            out[key[:-len(leaf)] + f'conv.{leaf}'] = arr
            continue

        m = CLS_KEY.search(new_key)
        if m is not None and (upgrade_rpn or m.group(1) != 'rpn_cls'):
            arr = bg_first_to_last(arr, num_classes)
        elif ssd and re.search(r'cls_convs\.\d+\.(weight|bias)', key):
            arr = bg_first_to_last(arr, num_classes)

        m = REG_KEY.search(new_key)
        if m is not None and not reg_class_agnostic and \
                (upgrade_rpn or m.group(1) != 'rpn_reg'):
            arr = drop_bg_reg_group(arr, num_classes)

        if MASK_KEY.search(new_key):
            arr = drop_bg_mask_channel(arr, num_classes)

        out[new_key] = arr
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('src')
    ap.add_argument('dst')
    ap.add_argument('--num-classes', type=int, default=81,
                    help='v1 class count INCLUDING background (COCO: 81)')
    ap.add_argument('--two-stage', action='store_true')
    ap.add_argument('--retina-pre053', action='store_true')
    ap.add_argument('--ssd', action='store_true')
    ap.add_argument('--reg-class-agnostic', action='store_true')
    args = ap.parse_args()

    import torch
    ckpt = torch.load(args.src, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: (v.numpy() if hasattr(v, 'numpy') else v) for k, v in sd.items()}
    upgraded = upgrade_state_dict(
        sd, num_classes=args.num_classes, two_stage=args.two_stage,
        retina_pre053=args.retina_pre053, ssd=args.ssd,
        reg_class_agnostic=args.reg_class_agnostic)
    torch.save({'state_dict': {k: torch.from_numpy(np.ascontiguousarray(v))
                               for k, v in upgraded.items()}}, args.dst)
    print(f'wrote {args.dst}')


if __name__ == '__main__':
    main()
