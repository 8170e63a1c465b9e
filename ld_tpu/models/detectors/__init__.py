from .single_stage import SingleStageDetector, SingleStageNet
from .kd_one_stage import KnowledgeDistillationSingleStageDetector, IMDetector
from .two_stage import (TwoStageDetector, KnowledgeDistillationTwoStageDetector)

__all__ = ['SingleStageDetector', 'SingleStageNet',
           'KnowledgeDistillationSingleStageDetector', 'IMDetector',
           'TwoStageDetector', 'KnowledgeDistillationTwoStageDetector']
