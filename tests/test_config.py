"""Config system: _base_ inheritance, _delete_, dotted overrides, registry."""
import os
import tempfile

import pytest

from ld_tpu import Config
from ld_tpu.utils.registry import Registry


def _write(dir_, name, text):
    p = os.path.join(dir_, name)
    with open(p, 'w') as f:
        f.write(text)
    return p


@pytest.fixture
def cfg_dir():
    with tempfile.TemporaryDirectory() as d:
        yield d


def test_base_inheritance(cfg_dir):
    _write(cfg_dir, 'base.py',
           "model = dict(type='GFL', backbone=dict(type='ResNet', depth=50))\n"
           "lr = 0.01\n")
    child = _write(
        cfg_dir, 'child.py',
        "_base_ = ['./base.py']\n"
        "model = dict(backbone=dict(depth=18))\n")
    cfg = Config.fromfile(child)
    assert cfg.model.type == 'GFL'
    assert cfg.model.backbone.depth == 18
    assert cfg.model.backbone.type == 'ResNet'
    assert cfg.lr == 0.01


def test_delete_key(cfg_dir):
    _write(cfg_dir, 'base.py',
           "opt = dict(type='SGD', momentum=0.9, weight_decay=1e-4)\n")
    child = _write(cfg_dir, 'child.py',
                   "_base_ = ['./base.py']\n"
                   "opt = dict(_delete_=True, type='AdamW', lr=1e-3)\n")
    cfg = Config.fromfile(child)
    assert cfg.opt.type == 'AdamW'
    assert 'momentum' not in cfg.opt
    assert '_delete_' not in cfg.opt


def test_nested_bases(cfg_dir):
    _write(cfg_dir, 'a.py', "x = dict(a=1, b=2)\n")
    _write(cfg_dir, 'b.py', "_base_ = ['./a.py']\nx = dict(b=3, c=4)\n")
    leaf = _write(cfg_dir, 'c.py', "_base_ = ['./b.py']\nx = dict(c=5)\n")
    cfg = Config.fromfile(leaf)
    assert dict(cfg.x) == dict(a=1, b=3, c=5)


def test_merge_from_dict(cfg_dir):
    p = _write(cfg_dir, 'c.py', "model = dict(backbone=dict(depth=50))\n")
    cfg = Config.fromfile(p)
    cfg.merge_from_dict({'model.backbone.depth': 18, 'new.key': 7})
    assert cfg.model.backbone.depth == 18
    assert cfg.new.key == 7


def test_registry_build():
    REG = Registry('thing')

    @REG.register_module()
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = REG.build(dict(type='Foo', a=1))
    assert obj.a == 1 and obj.b == 2
    with pytest.raises(KeyError):
        REG.build(dict(type='Bar'))
    with pytest.raises(KeyError):
        @REG.register_module()  # duplicate
        class Foo:  # noqa: F811
            pass
