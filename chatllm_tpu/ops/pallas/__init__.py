"""Pallas TPU kernels for the hot paths (quantized matmul, flash attention).

These replace ggml's CPU/CUDA kernels (ggml-quants.c dot kernels,
ggml-cuda/mmq*.cu, fattn*.cu) with MXU/VPU kernels where the dequantization
never round-trips through HBM.
"""
from .qmm_kernel import qmm_pallas

__all__ = ["qmm_pallas"]
