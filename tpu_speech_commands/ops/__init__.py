from .pallas_frontend import make_fused_frontend
from .training_frontend import fused_frontend_blockers, select_training_frontend

__all__ = [
    "make_fused_frontend",
    "select_training_frontend",
    "fused_frontend_blockers",
]
