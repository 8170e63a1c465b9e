"""Sequential neck composition (mmdet supports `neck=[cfg1, cfg2]`,
e.g. Libra R-CNN's FPN + BFP)."""
from __future__ import annotations

import flax.linen as nn

from ld_tpu.utils.registry import NECKS


class SequentialNeck(nn.Module):
    necks: tuple

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, neck in enumerate(self.necks):
            x = neck(x, train)
        return x

    @property
    def out_channels(self):
        for n in reversed(self.necks):
            oc = getattr(n, 'out_channels', None) or \
                getattr(n, 'in_channels', None)
            if isinstance(oc, int):
                return oc
        return 256


def build_neck_maybe_seq(neck):
    if not neck:
        return None
    if isinstance(neck, (list, tuple)):
        return SequentialNeck(tuple(NECKS.build(dict(n)) for n in neck))
    return NECKS.build(dict(neck))
