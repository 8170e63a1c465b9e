from .utils import reduce_loss, weight_reduce_loss, weighted_loss
from .gfocal_loss import (QualityFocalLoss, DistributionFocalLoss,
                          quality_focal_loss, distribution_focal_loss)
from .kd_loss import (KnowledgeDistillationKLDivLoss, IMLoss,
                      knowledge_distillation_kl_div_loss, im_loss)
from .iou_loss import IoULoss, GIoULoss, DIoULoss, CIoULoss
from .focal_loss import FocalLoss, sigmoid_focal_loss
from .smooth_l1_loss import SmoothL1Loss, L1Loss
from .cross_entropy_loss import CrossEntropyLoss
from .misc_losses import (BalancedL1Loss, VarifocalLoss, GaussianFocalLoss,
                          MSELoss, BoundedIoULoss, GHMC, GHMR,
                          AssociativeEmbeddingLoss)

__all__ = [
    'reduce_loss', 'weight_reduce_loss', 'weighted_loss', 'QualityFocalLoss',
    'DistributionFocalLoss', 'quality_focal_loss', 'distribution_focal_loss',
    'KnowledgeDistillationKLDivLoss', 'IMLoss',
    'knowledge_distillation_kl_div_loss', 'im_loss', 'IoULoss', 'GIoULoss',
    'DIoULoss', 'CIoULoss', 'FocalLoss', 'sigmoid_focal_loss', 'SmoothL1Loss',
    'L1Loss', 'CrossEntropyLoss', 'BalancedL1Loss', 'VarifocalLoss',
    'GaussianFocalLoss', 'MSELoss', 'BoundedIoULoss', 'GHMC', 'GHMR',
    'AssociativeEmbeddingLoss'
]
