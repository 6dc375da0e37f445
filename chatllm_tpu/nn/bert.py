"""BERT/XLMRoberta-style bidirectional encoder (post-LayerNorm).

Reference blocks: RobertaEmbedding (/root/reference/src/layers.h:889,
layers.cpp:2088 — learned positions offset by pad_index=2 + LayerNorm),
RobertaSelfAttention (:2657, non-causal, no rope), RobertaOutput/MLP/Block
(:2684-2777), BCEFinalNorm (:2619 — L2-normalized CLS),
RobertaClassificationHead (:2589 — CLS → dense+tanh → out_proj → sigmoid).

Used by the embedding/reranker model families (BCE, BGE-M3).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.norm import l2_norm, layer_norm
from ..ops.qmm import matmul


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    max_length: int
    norm_eps: float = 1e-12
    pos_offset: int = 2          # roberta pad_index


def roberta_embed(cfg: BertConfig, p, ids):
    """ids: [B, T] -> [B, T, H] (word + position embeddings + LN)."""
    B, T = ids.shape
    x = jnp.take(p["word"], ids, axis=0)
    pos = jnp.arange(cfg.pos_offset, cfg.pos_offset + T)
    x = x + jnp.take(p["pos"], pos, axis=0)[None]
    return layer_norm(x, p["ln"]["w"], p["ln"]["b"], eps=cfg.norm_eps)


def bert_attention(cfg: BertConfig, p, x, mask):
    B, T, H = x.shape
    nh = cfg.num_attention_heads
    d = H // nh
    q = matmul(x, p["q"]).reshape(B, T, nh, d).astype(jnp.float32)
    k = matmul(x, p["k"]).reshape(B, T, nh, d).astype(jnp.float32)
    v = matmul(x, p["v"]).reshape(B, T, nh, d).astype(jnp.float32)
    scores = jnp.einsum("bthd,bshd->bhts", q, k) * (d ** -0.5)
    if mask is not None:
        scores = scores + mask[:, None, None, :]
    pattn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", pattn, v).reshape(B, T, H)
    return matmul(out.astype(x.dtype), p["o"]).astype(x.dtype)


def bert_layer(cfg: BertConfig, p, x, mask):
    attn = bert_attention(cfg, p["attn"], x, mask)
    x = layer_norm(x + attn, p["post_attn_ln"]["w"], p["post_attn_ln"]["b"],
                   eps=cfg.norm_eps)
    h = jax.nn.gelu(matmul(x, p["mlp"]["intermediate"]).astype(jnp.float32),
                    approximate=False).astype(x.dtype)
    h = matmul(h, p["mlp"]["output"]).astype(x.dtype)
    return layer_norm(x + h, p["output_ln"]["w"], p["output_ln"]["b"],
                      eps=cfg.norm_eps)


def bert_forward(cfg: BertConfig, params, ids, attn_mask=None):
    """ids [B, T] (+ optional bool mask [B, T]) -> hidden [B, T, H]."""
    mask = None
    if attn_mask is not None:
        mask = jnp.where(attn_mask, 0.0, -1e30).astype(jnp.float32)
    x = roberta_embed(cfg, params["embed"], ids)
    for lp in params["layers"]:
        x = bert_layer(cfg, lp, x, mask)
    return x


def cls_embedding(hidden) -> jax.Array:
    """L2-normalized first-token embedding (BCEFinalNorm, layers.cpp:2328)."""
    return l2_norm(hidden[:, 0, :], eps=1e-5)


def classification_score(params, hidden) -> jax.Array:
    """CLS → dense(tanh) → out_proj → sigmoid
    (RobertaClassificationHead, layers.cpp:2307)."""
    x = hidden[:, 0, :]
    x = jnp.tanh(matmul(x, params["dense"]).astype(jnp.float32))
    x = matmul(x.astype(hidden.dtype), params["out_proj"])
    return jax.nn.sigmoid(x[..., 0].astype(jnp.float32))
