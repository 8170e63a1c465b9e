from .coco_eval import CocoEvaluator
from .mean_ap import eval_map, eval_recalls, average_precision, tpfp_default
from .segm_eval import SegmEvaluator, paste_mask, mask_iou

__all__ = ['CocoEvaluator', 'eval_map', 'eval_recalls', 'average_precision',
           'tpfp_default', 'SegmEvaluator', 'paste_mask', 'mask_iou']
