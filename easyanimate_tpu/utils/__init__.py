from .fp8 import quantize_params_fp8, dequantize_params

__all__ = ["quantize_params_fp8", "dequantize_params"]
