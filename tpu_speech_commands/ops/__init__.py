from .pallas_frontend import make_fused_frontend

__all__ = ["make_fused_frontend"]
