from .common import get_classes, ensure_background_first

__all__ = ["get_classes", "ensure_background_first"]
