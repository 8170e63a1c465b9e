from .registry import (Registry, build_from_cfg, BACKBONES, NECKS, HEADS,
                       LOSSES, DETECTORS, ASSIGNERS, IOU_CALCULATORS,
                       DATASETS, PIPELINES)
from .config import Config, ConfigDict

__all__ = [
    'Registry', 'build_from_cfg', 'BACKBONES', 'NECKS', 'HEADS', 'LOSSES',
    'DETECTORS', 'ASSIGNERS', 'IOU_CALCULATORS', 'DATASETS', 'PIPELINES',
    'Config', 'ConfigDict'
]
