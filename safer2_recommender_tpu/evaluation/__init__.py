from safer2_recommender_tpu.evaluation.metrics import (
    EvaluationResult,
    metric_cvar,
    topk_metrics,
)

__all__ = ["EvaluationResult", "metric_cvar", "topk_metrics"]
