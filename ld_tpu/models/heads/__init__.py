from .gfl_head import GFLHead, GFLHeadNet
from .ld_head import LDHead

__all__ = ['GFLHead', 'GFLHeadNet', 'LDHead']
