from .coco_eval import CocoEvaluator
from .mean_ap import eval_map, eval_recalls, average_precision, tpfp_default

__all__ = ['CocoEvaluator', 'eval_map', 'eval_recalls', 'average_precision',
           'tpfp_default']
