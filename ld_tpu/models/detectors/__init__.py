from .single_stage import SingleStageDetector, SingleStageNet
from .kd_one_stage import KnowledgeDistillationSingleStageDetector, IMDetector
from .two_stage import (TwoStageDetector, KnowledgeDistillationTwoStageDetector,
                        TridentFasterRCNN)
from .yolact import YOLACT, YOLACTNet
from .sparse_rcnn import SparseRCNN, SparseRCNNNet, DIIHeadNet

__all__ = ['SingleStageDetector', 'SingleStageNet',
           'KnowledgeDistillationSingleStageDetector', 'IMDetector',
           'TwoStageDetector', 'KnowledgeDistillationTwoStageDetector',
           'TridentFasterRCNN',
           'YOLACT', 'YOLACTNet', 'SparseRCNN', 'SparseRCNNNet',
           'DIIHeadNet']
