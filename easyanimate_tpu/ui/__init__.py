from .controller import EasyAnimateController, generate_long_video

__all__ = ["EasyAnimateController", "generate_long_video"]
