"""Layer/block library — the "nn.Module" layer of the framework.

Reference analog: src/layers.{h,cpp} Block classes (/root/reference/src/layers.h:403).
TPU-first design: blocks are *pure functions* over parameter pytrees + a
static (hashable) config — everything jit/pjit-traceable; no graph objects,
no allocator dance (the reference's InitContext/move_to_layer machinery has
no role under XLA).
"""
from .transformer import (
    TransformerConfig, LayerSpec, KVCache, init_cache,
    decoder_layer, transformer_forward, embed_tokens, lm_logits,
)

__all__ = [
    "TransformerConfig", "LayerSpec", "KVCache", "init_cache",
    "decoder_layer", "transformer_forward", "embed_tokens", "lm_logits",
]
