"""Whole-zoo config smoke: every config under configs/ (minus _base_)
parses and its model builds through the registries — the reference's
tests/test_config.py strategy."""
import glob
import os

import pytest

import ld_tpu  # noqa: F401
from ld_tpu import Config
from ld_tpu.models import build_detector

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m "not slow"


ROOT = os.path.join(os.path.dirname(__file__), '..', 'configs')
CONFIGS = sorted(
    p for p in glob.glob(os.path.join(ROOT, '**', '*.py'), recursive=True)
    if os.sep + '_base_' + os.sep not in p)


def test_zoo_nonempty():
    assert len(CONFIGS) > 30


@pytest.mark.parametrize(
    'path', CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds(path):
    cfg = Config.fromfile(path)
    assert 'model' in cfg
    model_cfg = dict(cfg.model)
    if 'train_cfg' in cfg and 'train_cfg' not in model_cfg:
        model_cfg['train_cfg'] = cfg.train_cfg
    if 'test_cfg' in cfg and 'test_cfg' not in model_cfg:
        model_cfg['test_cfg'] = cfg.test_cfg
    det = build_detector(model_cfg)
    assert det is not None
    assert hasattr(det, 'forward_train')
