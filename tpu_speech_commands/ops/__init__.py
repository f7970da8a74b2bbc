from .pallas_cnn import make_fused_cnn_forward, make_fused_conv_block1
from .pallas_frontend import make_fused_frontend
from .training_frontend import fused_frontend_blockers, select_training_frontend

__all__ = [
    "make_fused_frontend",
    "make_fused_conv_block1",
    "make_fused_cnn_forward",
    "select_training_frontend",
    "fused_frontend_blockers",
]
