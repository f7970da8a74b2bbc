from .common import ensure_background_first, get_classes, path_names

__all__ = ["get_classes", "ensure_background_first", "path_names"]
