from .boxes import (bbox_overlaps, distance2bbox, bbox2distance,
                    anchor_center, bbox_flip)
from .anchors import (AnchorGenerator, PointGenerator,
                      LegacyAnchorGenerator)
from .integral import integral
from .nms import topk_flat
from .atss_assigner import ATSSAssigner, AssignResult
from .max_iou_assigner import MaxIoUAssigner
from .extra_assigners import (HungarianAssigner, PointAssigner,
                               CenterRegionAssigner)

__all__ = [
    'bbox_overlaps', 'distance2bbox', 'bbox2distance', 'anchor_center',
    'bbox_flip', 'AnchorGenerator', 'PointGenerator',
    'LegacyAnchorGenerator', 'integral', 'topk_flat',
    'ATSSAssigner', 'AssignResult', 'MaxIoUAssigner', 'HungarianAssigner',
    'PointAssigner', 'CenterRegionAssigner'
]
