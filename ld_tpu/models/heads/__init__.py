from .gfl_head import GFLHead, GFLHeadNet
from .ld_head import LDHead
from .gfocal_head import GFocalHead, GFocalHeadNet
from .ld_gflv2 import LDv2Head
from .imitation_heads import IMHead, IMv2Head
from .rpn_head import RPNHead, RPNHeadNet
from .roi_head import StandardRoIHead, Shared2FCBBoxHeadNet
from .cascade_roi_head import CascadeRoIHead
from .retina_head import RetinaHead, RetinaHeadNet
from .classic_heads import FCOSHead, ATSSHead, FCOSHeadNet, ATSSHeadNet
from .fovea_head import FoveaHead, FoveaHeadNet
from .ssd_head import SSDHead, SSDHeadNet, SSDAnchorGenerator
from .yolo_head import YOLOV3Head, YOLOV3HeadNet, YOLOV3Neck
from .mask_head import FCNMaskHead, FCNMaskHeadNet
from .atss_gfl_head import ATSSGFLHead, ATSSGFLHeadNet, LDATSSHead
from .fcos_gfl_head import FCOSGFLHead, FCOSGFLHeadNet, LDFCOSHead
from .retina_gfl_head import RetinaGFLHead, RetinaGFLHeadNet, LDRetinaHead
from .fsaf_head import FSAFHead
from .free_anchor_head import FreeAnchorRetinaHead
from .sabl_retina_head import SABLRetinaHead, SABLRetinaHeadNet
from .paa_head import PAAHead

__all__ = ['GFLHead', 'GFLHeadNet', 'LDHead', 'GFocalHead', 'GFocalHeadNet',
           'LDv2Head', 'ATSSGFLHead', 'ATSSGFLHeadNet', 'LDATSSHead',
           'FCOSGFLHead', 'FCOSGFLHeadNet', 'LDFCOSHead', 'RetinaGFLHead',
           'RetinaGFLHeadNet', 'LDRetinaHead', 'IMHead', 'IMv2Head', 'RPNHead', 'RPNHeadNet', 'StandardRoIHead', 'Shared2FCBBoxHeadNet', 'SSDHead', 'SSDHeadNet',
           'SSDAnchorGenerator', 'FCNMaskHead', 'FCNMaskHeadNet', 'YOLOV3Head',
           'YOLOV3HeadNet', 'YOLOV3Neck', 'CascadeRoIHead', 'RetinaHead', 'RetinaHeadNet', 'FCOSHead', 'ATSSHead', 'FCOSHeadNet',
           'ATSSHeadNet', 'FoveaHead', 'FoveaHeadNet', 'FSAFHead',
           'FreeAnchorRetinaHead', 'SABLRetinaHead', 'SABLRetinaHeadNet',
           'PAAHead']
