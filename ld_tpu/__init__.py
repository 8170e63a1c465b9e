"""ld_tpu — a TPU-native (JAX/XLA/Pallas) re-design of the LD detection
framework (Localization Distillation for Dense Object Detection, CVPR 2022):
GFocal-family dense detectors with teacher-student distillation, built SPMD
over jax.sharding meshes.

Reference capability target: HikariTJU/LD (MMDetection v2.10 fork).
"""

__version__ = '0.1.0'

from ld_tpu.utils.registry import (BACKBONES, DETECTORS, HEADS, LOSSES, NECKS,
                                   ASSIGNERS, DATASETS)
from ld_tpu.utils.config import Config

# importing the subpackages populates the registries
import ld_tpu.ops  # noqa: F401,E402
import ld_tpu.models  # noqa: F401,E402
import ld_tpu.data  # noqa: F401,E402

__all__ = ['BACKBONES', 'DETECTORS', 'HEADS', 'LOSSES', 'NECKS', 'ASSIGNERS',
           'DATASETS', 'Config', '__version__']
