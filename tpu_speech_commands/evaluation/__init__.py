from .evaluate import evaluate_accuracy, plot_confusion_matrix
from .statistics import clever_format, count_params, get_model_statistics, model_flops

__all__ = [
    "evaluate_accuracy",
    "plot_confusion_matrix",
    "clever_format",
    "count_params",
    "get_model_statistics",
    "model_flops",
]
