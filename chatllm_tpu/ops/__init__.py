"""TPU compute ops: quantized-tensor layout, matmuls, norms, RoPE, attention,
sampling.  This layer replaces the reference's ggml op set + CUDA/CPU kernels
(/root/reference/src/backend.h:13-75 wrappers over ggml) with JAX/XLA ops and
Pallas kernels designed for the MXU/VPU.
"""
from .qtensor import DenseLinear, QuantLinear, repack_quantized, linear_from_ggml
from .qmm import matmul
from .norm import rms_norm, layer_norm
from .rope import RopeConfig, apply_rope, precompute_rope_cache
from .attention import attention_with_cache

__all__ = [
    "DenseLinear", "QuantLinear", "repack_quantized", "linear_from_ggml",
    "matmul", "rms_norm", "layer_norm",
    "RopeConfig", "apply_rope", "precompute_rope_cache",
    "attention_with_cache",
]
