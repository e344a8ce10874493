from .server import EasyAnimateAPIServer, infer_forward

__all__ = ["EasyAnimateAPIServer", "infer_forward"]
