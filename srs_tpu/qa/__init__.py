from .module import AssessmentLevel, QualityAssessmentModule

__all__ = ["QualityAssessmentModule", "AssessmentLevel"]
