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
from .fcos_gfl_head import (FCOSGFLHead, FCOSGFLHeadNet, LDFCOSCompareHead,
                            LDFCOSHead)
from .retina_gfl_head import RetinaGFLHead, RetinaGFLHeadNet, LDRetinaHead
from .fsaf_head import FSAFHead
from .free_anchor_head import FreeAnchorRetinaHead
from .sabl_retina_head import SABLRetinaHead, SABLRetinaHeadNet
from .paa_head import PAAHead
from .vfnet_head import VFNetHead, VFNetHeadNet
from .reppoints_head import RepPointsHead, RepPointsHeadNet
from .tood_head import TOODHead, TOODHeadNet
from .detr_head import DETRHead, DETRHeadNet
from .yolact_head import YOLACTHead, YOLACTHeadNet
from .corner_head import CornerHead, CornerHeadNet
from .solo_head import SOLOHead, SOLOHeadNet, DiceLoss, matrix_nms
from .roi_variants import (DoubleHeadRoIHead, MaskScoringRoIHead,
                           DynamicRoIHead, DoubleBBoxHeadNet,
                           MaskIoUHeadNet)
from .htc_roi_head import (HybridTaskCascadeRoIHead, HTCMaskNet,
                           SemanticHeadNet, SCNetRoIHead,
                           GlobalContextNet)
from .pisa_heads import PISARetinaHead, PISASSDHead
from .guided_anchor_head import (GARetinaHead, GARPNHead, GARetinaHeadNet,
                                 calc_region)
from .cascade_rpn_head import (CascadeRPNHead, cascade_rpn_loss,
                               cascade_rpn_proposals, anchor_offsets)
from .centripetal_head import (CentripetalHead, CentripetalHeadNet,
                               NASFCOSHead)
from .grid_point_roi import (GridRoIHead, PointRendRoIHead, GridHeadNet,
                             MaskPointHeadNet)

__all__ = ['GFLHead', 'GFLHeadNet', 'LDHead', 'GFocalHead', 'GFocalHeadNet',
           'LDv2Head', 'ATSSGFLHead', 'ATSSGFLHeadNet', 'LDATSSHead',
           'FCOSGFLHead', 'FCOSGFLHeadNet', 'LDFCOSCompareHead', 'LDFCOSHead', 'RetinaGFLHead',
           'RetinaGFLHeadNet', 'LDRetinaHead', 'IMHead', 'IMv2Head', 'RPNHead', 'RPNHeadNet', 'StandardRoIHead', 'Shared2FCBBoxHeadNet', 'SSDHead', 'SSDHeadNet',
           'SSDAnchorGenerator', 'FCNMaskHead', 'FCNMaskHeadNet', 'YOLOV3Head',
           'YOLOV3HeadNet', 'YOLOV3Neck', 'CascadeRoIHead', 'RetinaHead', 'RetinaHeadNet', 'FCOSHead', 'ATSSHead', 'FCOSHeadNet',
           'ATSSHeadNet', 'FoveaHead', 'FoveaHeadNet', 'FSAFHead',
           'FreeAnchorRetinaHead', 'SABLRetinaHead', 'SABLRetinaHeadNet',
           'PAAHead', 'VFNetHead', 'VFNetHeadNet', 'RepPointsHead',
           'RepPointsHeadNet', 'TOODHead', 'TOODHeadNet', 'DETRHead',
           'DETRHeadNet', 'YOLACTHead', 'YOLACTHeadNet', 'CornerHead',
           'CornerHeadNet', 'SOLOHead', 'SOLOHeadNet', 'DiceLoss',
           'matrix_nms', 'DoubleHeadRoIHead', 'MaskScoringRoIHead',
           'DynamicRoIHead', 'DoubleBBoxHeadNet', 'MaskIoUHeadNet',
           'HybridTaskCascadeRoIHead', 'HTCMaskNet', 'SemanticHeadNet',
           'SCNetRoIHead', 'GlobalContextNet',
           'PISARetinaHead', 'PISASSDHead', 'GARetinaHead', 'GARPNHead',
           'GARetinaHeadNet', 'calc_region', 'CascadeRPNHead',
           'cascade_rpn_loss', 'cascade_rpn_proposals', 'anchor_offsets',
           'CentripetalHead', 'CentripetalHeadNet', 'NASFCOSHead',
           'GridRoIHead', 'PointRendRoIHead', 'GridHeadNet',
           'MaskPointHeadNet']
