from .quants import (
    GGMLType,
    dequantize,
    quantize,
    type_block_size,
    type_bytes_per_block,
    nbytes_for,
    type_to_str,
)
from .reader import GGMMFile, TensorEntry
from .writer import GGMMWriter
