from .train import train_detector, set_random_seed
from .test import eval_detector
from .inference import (init_detector, inference_detector,
                        show_result, imshow_gt_det_bboxes)
from .aug_test import aug_test, build_aug_views
from .inference import async_inference_detector

__all__ = ['train_detector', 'set_random_seed', 'eval_detector',
           'init_detector', 'inference_detector', 'show_result',
           'imshow_gt_det_bboxes', 'aug_test',
           'build_aug_views', 'async_inference_detector']
