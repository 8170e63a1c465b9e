from .single_stage import SingleStageDetector, SingleStageNet
from .kd_one_stage import KnowledgeDistillationSingleStageDetector, IMDetector

__all__ = ['SingleStageDetector', 'SingleStageNet',
           'KnowledgeDistillationSingleStageDetector', 'IMDetector']
