"""Decoder-only transformer core: config, KV cache, layer + model forward.

Covers the reference's composite blocks (`LMBlock1` pre-norm src/layers.h:1234,
`LMBlock2` parallel attn+mlp :2779, `LMBlock4` sandwich norms :1458,
RoPESelfAttention :2018, QKNormedAttention :3073, sliding-window attention
:1973, GatedMLP :2277) as one configurable pure function.  Per-arch model
classes (chatllm_tpu/models/*) only choose config values and weight-name
mappings.

Parameters are nested dicts (a per-layer tuple under "layers"); linears are
DenseLinear/QuantLinear pytree nodes from ops.qtensor.  Everything here is
traced under jit: static shapes, no data-dependent control flow.
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.attention import (alibi_slopes_for, attention_with_cache,
                             update_kv_cache)
from ..ops.norm import layer_norm, rms_norm
from ..ops.qmm import matmul
from ..ops.qtensor import DenseLinear, QuantLinear
from ..ops.rope import (ROPE_NORMAL as ROPE_NORMAL_LAYOUT, RopeConfig,
                        apply_rope, precompute_rope_cache)


@dataclass(frozen=True)
class LayerSpec:
    """Static per-layer attention/MLP variation (sliding-window patterns,
    no-rope layers, MoE-vs-dense — anything that changes the traced graph)."""
    sliding_window: int = 0        # 0 = full attention
    use_rope: bool = True
    local_rope: bool = False       # use cfg.rope_local table (Gemma3 SWA layers)
    is_moe: bool = False
    cross_attn: bool = False
    num_kv_heads: int = 0          # per-layer GQA override (DeciLM); 0 = cfg
    no_attn: bool = False          # attention-free layer (DeciNoAttnBlock,
    #                                models/decilm.cpp:20)
    linear_attn: bool = False      # Gated-DeltaNet linear-attention layer
    #                                (Qwen3.5/Qwen3-Next QwenGatedDeltaNet,
    #                                models/qwen3_5.cpp:198-485)
    head_dim: int = 0              # per-layer head-dim override (Gemma4
    #                                full-attn global_head_dim,
    #                                models/gemma4.cpp:2317)
    v_from_k: bool = False         # v = k-projection output, no v_proj
    #                                (Gemma4 attention_k_eq_v / use_k_as_v,
    #                                models/gemma4.cpp:1775)
    shared_kv_from: int = -1       # reuse layer i's KV cache; no own k/v
    #                                projections (Gemma4 num_kv_shared_layers,
    #                                models/gemma4.cpp shared_attn :1822-1830)


@dataclass(frozen=True)
class MLAConfig:
    """Multi-head latent attention dims (reference BaseMLAttention,
    models/deepseek.h:251-327)."""
    q_lora_rank: int = 0            # 0 = direct q projection (V2-Lite)
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128


@dataclass(frozen=True)
class GDNConfig:
    """Gated-DeltaNet dims (Qwen3.5 Config linear_* fields,
    models/qwen3_5.cpp:14-21; HF oracle Qwen3NextGatedDeltaNet)."""
    conv_kernel: int = 4
    num_k_heads: int = 16
    num_v_heads: int = 32
    k_head_dim: int = 128
    v_head_dim: int = 128

    @property
    def key_dim(self) -> int:
        return self.k_head_dim * self.num_k_heads

    @property
    def value_dim(self) -> int:
        return self.v_head_dim * self.num_v_heads

    @property
    def conv_dim(self) -> int:
        return 2 * self.key_dim + self.value_dim


@dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    intermediate_size: int
    max_length: int
    head_dim: int = -1                      # defaults to hidden/heads
    act: str = "silu"                       # silu | gelu | gelu_tanh | relu | relu2
    norm_type: str = "rmsnorm"              # rmsnorm | layernorm
    norm_eps: float = 1e-5
    rms_norm_offset: float = 0.0            # 1.0 for Gemma-style (1+w)
    rope: RopeConfig = None
    qkv_bias: bool = False
    o_bias: bool = False
    mlp_bias: bool = False
    tie_lm_head: bool = False
    qk_norm: str = "none"                   # none | rmsnorm | rmsnorm_full | rmsnorm_post
    use_alibi: bool = False                 # ALiBi position bias (no rope)
    logn_attn_seq: int = 0                  # Qwen-v1 logn attention: q scaled
    #   by log(pos)/log(seq) beyond seq (src/layers.cpp:3470)
    attn_scale_beta: float = 0.0            # llama-4-style per-position q
    #   scale 1 + beta*ln(1 + floor(pos/orig)) (Mistral3 ScaledSelfAttention,
    #   models/mistral.cpp:946; LLAMA4 models/llama4.cpp)
    attn_scale_orig: int = 0
    logit_softcap: float = 0.0              # attention score softcap (Gemma2)
    causal: bool = True                     # False: bidirectional encoder
    #   (cacheless embedding/reranker towers, e.g. MiniCPM-Embedding-Light)
    final_logit_softcap: float = 0.0
    embedding_scale: float = 1.0            # sqrt(hidden) for Gemma
    attention_scale: float = -1.0           # score scale; -1 = 1/sqrt(head_dim)
    parallel_residual: bool = False         # LMBlock2 (GPT-NeoX/Phi style)
    glm1_residual: bool = False             # GLM1: residual = norm(x)*sqrt(2L)
    post_norms: bool = False                # LMBlock4 sandwich (Gemma2)
    pre_norm: bool = True                   # False: OLMo2 (post-norms only)
    residual_scale: float = 1.0             # Granite residual_multiplier
    logit_scale: float = 1.0                # Cohere logit_scale / Granite 1/logits_scaling
    layer_specs: tuple = ()                 # per-layer LayerSpec; () = uniform
    # MoE (used when a LayerSpec has is_moe):
    moe_num_experts: int = 0
    moe_top_k: int = 0
    moe_norm_topk_prob: bool = True
    moe_shared_intermediate: int = 0
    moe_n_group: int = 1            # DeepSeek grouped top-k routing
    moe_topk_group: int = 1
    moe_routed_scale: float = 1.0
    moe_score_func: str = "softmax"  # softmax | sigmoid (V3) | softmax_topk
    #   softmax_topk: top-k on raw logits, then softmax over the k selected
    #   logits (GPT-OSS router, models/gpt.cpp OssSparseMoE::forward)
    moe_act: str = ""               # "" = cfg.act | "swiglu_oai" (GPT-OSS,
    #   ggml swiglu_oai: min(g,L)*sigmoid(a*g) * (clamp(u,-L,L)+1))
    moe_swiglu_limit: float = 7.0
    moe_swiglu_alpha: float = 1.702
    moe_jitter_eps: float = 0.01    # sparsemixer threshold (Phi-3.5-MoE)
    moe_grouped_argmax: bool = False  # one expert per group of E/K (Pangu)
    moe_pre_weighting: bool = False # routing weight multiplies the expert
    #   INPUT, not the output (Llama-4 LlamaSparseMoE pre_weighting)
    mla: Optional[MLAConfig] = None
    num_loops: int = 1              # looped/recurrent stack count (Nanbeige
    #   LoopModel, Ouro): same weights re-run num_loops times, each loop with
    #   its own KV cache slice
    skip_loop_final_norm: bool = False
    layer_fwd: tuple = ()           # Solar-Pro depth-up-scaling skip pairs
    #   ((src, dst), ...): layer src's output is saved and blended into
    #   layer dst's input as t*saved + (1-t)*x with t = layer_fwd_alpha
    #   (reference SolarModel::forward, models/solar.cpp:160-190; the HF
    #   remote-code bskcn_tv semantics — the reference's scale(fwd, 1-a) +
    #   scale(fwd, a) drops the current stream, HF is ground truth)
    layer_fwd_alpha: float = 0.0
    mla_compressed: bool = False    # latent ("memory") MLA cache: cache only
    #   [c_kv | k_pe] per token (reference forward_memory, deepseek.cpp:406)
    #   with the up-projections absorbed into q / output — MQA-shaped attention
    rope_local: Optional[RopeConfig] = None  # second rope table (Gemma3)
    gdn: Optional[GDNConfig] = None  # Gated-DeltaNet dims for linear_attn
    #   layers (Qwen3.5)
    attn_out_gate: bool = False     # sigmoid(gate_proj(x)) on the merged
    #   attention output before o_proj (QwenGatedAttention,
    #   models/qwen3_5.cpp:246-263)
    v_norm: bool = False            # weightless RMSNorm(1e-6) on the v heads
    #   (Gemma4Attention::forward, models/gemma4.cpp:1777)
    moe_group_select: str = "sum2"  # grouped top-k group-scoring mode:
    #   "sum2" — HF noaux_tc: rank GROUPS by sum of their top-2 scores,
    #   keep topk_group groups (DeepSeek-V3 class);
    #   "per_group_topk" — reference GenericGroupedSparseMoE
    #   (src/layers.cpp:3929): keep the top-`topk_group` EXPERTS inside
    #   every group, then global top-k over survivors (Megrez2)
    moe_pre_gate: bool = False      # Megrez2: each MoE layer ROUTES on the
    #   PREVIOUS layer's ffn-norm output (pre_gate_hidden_states,
    #   models/megrez.cpp MoEModel::forward:359-384); experts still consume
    #   this layer's own ffn-norm output
    cascaded_moe: bool = False      # Gemma4 CascadedMLP: dense MLP + a
    #   residual-fed MoE branch with its own sandwich norms
    #   (models/gemma4.cpp CascadedMLP::forward :1990-2001)
    ple_dim: int = 0                # per-layer-embedding dim (Gemma4
    #   hidden_size_per_layer_input; PerLayerEmbedding,
    #   models/gemma4.cpp:1598-1690)
    cache_dtype: str = "bfloat16"

    def resolved_head_dim(self) -> int:
        return self.head_dim if self.head_dim > 0 else self.hidden_size // self.num_attention_heads

    def layer_spec(self, i: int) -> LayerSpec:
        if self.layer_specs:
            return self.layer_specs[i]
        return LayerSpec()


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

# Ring-cache headroom for sliding-window layers (the reference allocates
# sliding_window_len + extra_len, default 512, src/layers.h:1973 — without it,
# writing a prefill chunk into an exactly-window-sized ring overwrites keys
# still inside the window of earlier queries in the same chunk).  Prefill
# chunks on SWA models are capped to this (see runtime/generate.py) so a
# chunk's writes can never clobber keys its own queries need.
SWA_EXTRA = 512

@struct.dataclass
class KVCache:
    """Per-layer K/V tensors, [n_layers][B, S_layer, H_kv, D].

    Sliding-window layers allocate `window + SWA_EXTRA` slots (ring-written),
    the reference's partial-cache design (src/layers.h:1973-2016).

    Quantized mode (`--cache_dtype q8_0` analog, reference src/layers.cpp:
    2933): k/v are int8 with per-(token, head) f32 scales in k_scale/v_scale
    [B, S, H]; attention folds the scales into the score / probability
    tensors so the dequantized cache is never materialized."""
    k: tuple
    v: tuple
    k_scale: Optional[tuple] = None
    v_scale: Optional[tuple] = None


def init_cache(cfg: TransformerConfig, batch: int, max_len: int | None = None,
               dtype=None) -> KVCache:
    max_len = max_len or cfg.max_length
    quantized = cfg.cache_dtype in ("int8", "q8_0", "q8")
    dtype = dtype or (jnp.int8 if quantized else jnp.dtype(cfg.cache_dtype))
    if cfg.mla is not None and cfg.mla_compressed:
        # latent cache: one shared "head" holding [c_kv | rotated k_pe];
        # v cache is a 1-wide dummy to keep the pytree uniform
        dk = cfg.mla.kv_lora_rank + cfg.mla.qk_rope_head_dim
        dv = 1
        n_kv = 1
    elif cfg.mla is not None:
        dk = cfg.mla.qk_nope_head_dim + cfg.mla.qk_rope_head_dim
        dv = cfg.mla.v_head_dim
        n_kv = cfg.num_attention_heads
    else:
        dk = dv = cfg.resolved_head_dim()
        n_kv = cfg.num_key_value_heads
    ks, vs, kss, vss = [], [], [], []
    for ci in range(cfg.num_hidden_layers * max(1, cfg.num_loops)):
        i = ci % cfg.num_hidden_layers
        spec = cfg.layer_spec(i)
        s = max_len if spec.sliding_window <= 0 else min(
            max_len, spec.sliding_window + SWA_EXTRA)
        if spec.no_attn or spec.shared_kv_from >= 0:
            # shared-kv layers read the source layer's cache and write
            # nothing of their own (Gemma4 num_kv_shared_layers)
            ks.append(jnp.zeros((batch, 1, 1, 1), dtype))
            vs.append(jnp.zeros((batch, 1, 1, 1), dtype))
            if quantized:
                kss.append(jnp.zeros((batch, 1, 1), jnp.float32))
                vss.append(jnp.zeros((batch, 1, 1), jnp.float32))
            continue
        if spec.linear_attn:
            # DeltaNet state instead of KV: the "k" slot holds the causal-
            # conv history [B, K-1, 1, conv_dim] and the "v" slot the
            # recurrent state S [B, n_v_heads, dk, dv], both f32 (reference
            # CausalConv1D::state + QwenGatedDeltaNet::state,
            # models/qwen3_5.cpp:151-485)
            g = cfg.gdn
            ks.append(jnp.zeros((batch, g.conv_kernel - 1, 1, g.conv_dim),
                                jnp.float32))
            vs.append(jnp.zeros((batch, g.num_v_heads, g.k_head_dim,
                                 g.v_head_dim), jnp.float32))
            if quantized:
                kss.append(jnp.zeros((batch, 1, 1), jnp.float32))
                vss.append(jnp.zeros((batch, 1, 1), jnp.float32))
            continue
        n_kv_l = spec.num_kv_heads or n_kv
        dk_l = spec.head_dim or dk
        dv_l = spec.head_dim or dv
        ks.append(jnp.zeros((batch, s, n_kv_l, dk_l), dtype))
        vs.append(jnp.zeros((batch, s, n_kv_l, dv_l), dtype))
        if quantized:
            # scales must track the per-layer head count (DeciLM-style
            # heterogeneous GQA), not the global n_kv
            kss.append(jnp.zeros((batch, s, n_kv_l), jnp.float32))
            vss.append(jnp.zeros((batch, s, n_kv_l), jnp.float32))
    return KVCache(k=tuple(ks), v=tuple(vs),
                   k_scale=tuple(kss) if quantized else None,
                   v_scale=tuple(vss) if quantized else None)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def _act(name: str):
    return {
        "silu": jax.nn.silu,
        "gelu": jax.nn.gelu,                       # erf-exact below
        "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
        "relu": jax.nn.relu,
        "relu2": lambda x: jnp.square(jax.nn.relu(x)),
    }[name]


def _norm(cfg: TransformerConfig, x, p):
    if cfg.norm_type == "layernorm":
        return layer_norm(x, p["w"], p.get("b"), eps=cfg.norm_eps)
    return rms_norm(x, p["w"], eps=cfg.norm_eps, offset=cfg.rms_norm_offset)


def gated_mlp(cfg: TransformerConfig, p, x):
    """GatedMLP (reference src/layers.h:2277): down(act(gate(x)) * up(x)).
    With a fused `gate_up` weight (GLM2MLP dense_h_to_4h, src/layers.h:1079),
    the projection is split in halves: act(h[:F]) * h[F:]."""
    if "gate_up" in p:
        h2 = matmul(x, p["gate_up"])
        F = h2.shape[-1] // 2
        g, u = h2[..., :F], h2[..., F:]
    else:
        g = matmul(x, p["gate"], shard="out")
        u = matmul(x, p["up"], shard="out")
    h = (_act(cfg.act)(g) * u).astype(x.dtype)
    return matmul(h, p["down"], shard="in").astype(x.dtype)


def simple_mlp(cfg: TransformerConfig, p, x):
    """TheMLP (reference src/layers.h:1018): down(act(up(x)))."""
    if "xielu" in p:
        return xielu_mlp(cfg, p, x)
    h = _act(cfg.act)(matmul(x, p["up"], shard="out")).astype(x.dtype)
    return matmul(h, p["down"], shard="in").astype(x.dtype)


def xielu_mlp(cfg: TransformerConfig, p, x):
    """Apertus XIEMLP (models/apertus.cpp:170-232): down(xielu(up(x))) with
    per-layer learned scalars; xielu (src/custom_ops.cpp:1210):
      x > 0:  a_p x^2 + b x
      x <= 0: a_n (expm1(min(x, eps)) - x) + b x
    The loader pre-applies a_p = softplus(raw), a_n = b + softplus(raw)."""
    a_n, a_p, beta, eps = (float(p["xielu"][k])
                           for k in ("alpha_n", "alpha_p", "beta", "eps"))
    h = matmul(x, p["up"], shard="out").astype(jnp.float32)
    pos = a_p * h * h + beta * h
    neg = a_n * (jnp.expm1(jnp.minimum(h, eps)) - h) + beta * h
    h = jnp.where(h > 0.0, pos, neg).astype(x.dtype)
    return matmul(h, p["down"], shard="in").astype(x.dtype)


def mlp_dispatch(cfg: TransformerConfig, spec: LayerSpec, p, x,
                 router_x=None):
    if spec.is_moe:
        return moe_mlp(cfg, p, x, router_x=router_x)
    if "gate" in p or "gate_up" in p:
        return gated_mlp(cfg, p, x)
    return simple_mlp(cfg, p, x)


def moe_mlp(cfg: TransformerConfig, p, x, router_x=None):
    """Sparse MoE FFN (reference GenericSparseMLP src/layers.h:2373):
    softmax router → top-k experts → weighted sum; optional shared expert
    (CombinedMLP :2330).  Expert compute is dense einsum over the expert dim
    (`mul_mat_id` analog) — gathered per token via one-hot matmul so shapes
    stay static for XLA.  `router_x` overrides the ROUTER input (Megrez2
    pre-gate: the previous layer's ffn-norm output routes this layer)."""
    B, T, H = x.shape
    xt = x.reshape(B * T, H)
    rt = xt if router_x is None else router_x.reshape(B * T, H)
    router_logits = matmul(rt, p["gate"]).astype(jnp.float32)         # [N, E]
    if "gate_linear_bias" in p:
        # true router bias on the logits (GPT-OSS mlp.router.bias) — distinct
        # from the selection-only score-correction bias below
        router_logits = router_logits + p["gate_linear_bias"].astype(jnp.float32)
    if cfg.moe_score_func == "softmax_topk":
        # GPT-OSS: top-k over raw logits, softmax over the selected k
        # (models/gpt.cpp OssSparseMoE::forward: top_k then soft_max)
        topl, topi = jax.lax.top_k(router_logits, cfg.moe_top_k)      # [N, K]
        topv = jax.nn.softmax(topl, axis=-1)
        return _moe_combine(cfg, p, xt, topi, topv, x)
    if cfg.moe_score_func == "sparsemixer":
        # Phi-3.5-MoE router (HF modeling_phimoe.sparsemixer inference
        # path; the reference's custom op is WIP — phi.h:270, so HF is
        # ground truth).  k=2: each expert's weight is the softmax over
        # threshold-masked logits, gathered at that expert.
        assert cfg.moe_top_k == 2, "sparsemixer is top-2 routing"
        eps2 = 2.0 * cfg.moe_jitter_eps

        def pick(sc, orig):
            m = jnp.max(sc, axis=-1, keepdims=True)
            idx = jnp.argmax(sc, axis=-1)
            factor = jnp.maximum(jnp.abs(orig), m)
            masked = jnp.where((m - orig) / factor > eps2, -jnp.inf, sc)
            g = jax.nn.softmax(masked, axis=-1)
            w = jnp.take_along_axis(g, idx[:, None], axis=-1)[:, 0]
            return idx, w

        i1, w1 = pick(router_logits, router_logits)
        masked_scores = jnp.where(
            jax.nn.one_hot(i1, router_logits.shape[-1], dtype=bool),
            -jnp.inf, router_logits)
        i2, w2 = pick(masked_scores, router_logits)
        topi = jnp.stack([i1, i2], axis=-1)
        topv = jnp.stack([w1, w2], axis=-1)
        return _moe_combine(cfg, p, xt, topi, topv, x)
    if cfg.moe_score_func == "sigmoid":
        probs = jax.nn.sigmoid(router_logits)
    else:
        probs = jax.nn.softmax(router_logits, axis=-1)
    sel = probs
    if "gate_bias" in p:
        # score-correction bias influences selection only (DeepSeek-V3
        # e_score_correction_bias; reference BaseSparseMLP score bias)
        sel = probs + p["gate_bias"].astype(jnp.float32)
    if cfg.moe_n_group > 1:
        # grouped top-k (reference GenericGroupedSparseMoE, src/layers.h:2429)
        N = sel.shape[0]
        G = cfg.moe_n_group
        gsel = sel.reshape(N, G, -1)
        if cfg.moe_group_select == "per_group_topk":
            # keep the top-`topk_group` experts INSIDE every group, zero the
            # rest, then global top-k over survivors (src/layers.cpp:3929;
            # non-survivor base is 0, matching ggml::scale(..., 0.0))
            kth = jax.lax.top_k(gsel, cfg.moe_topk_group)[0][..., -1:]
            sel = jnp.where(gsel >= kth, gsel, 0.0).reshape(N, -1)
        else:
            if cfg.moe_score_func == "sigmoid":
                gscore = jnp.sum(jax.lax.top_k(gsel, 2)[0], axis=-1)  # [N, G]
            else:
                gscore = jnp.max(gsel, axis=-1)
            gtop, _ = jax.lax.top_k(gscore, cfg.moe_topk_group)
            gmask = gscore >= gtop[..., -1:]
            sel = jnp.where(gmask[:, :, None], gsel, -jnp.inf).reshape(N, -1)
    if "router_scale" in p:
        # learned per-expert weight multiplier, applied to the combine
        # weights but NOT the selection scores (GenericSparseMLP::forward,
        # src/layers.cpp:3787-3790; Pangu-MoE)
        probs = probs * p["router_scale"].astype(jnp.float32)
    if cfg.moe_grouped_argmax:
        # one expert per group of E/K (grouped_max group_indices routing,
        # src/layers.cpp:3821-3831; Pangu-MoE)
        N, E = sel.shape
        K = cfg.moe_top_k
        epg = E // K
        gi = jnp.argmax(sel.reshape(N, K, epg), axis=-1)              # [N, K]
        topi = gi + jnp.arange(K)[None, :] * epg
    else:
        _, topi = jax.lax.top_k(sel, cfg.moe_top_k)                   # [N, K]
    topv = jnp.take_along_axis(probs, topi, axis=-1)
    if cfg.moe_norm_topk_prob:
        topv = topv / (jnp.sum(topv, axis=-1, keepdims=True) + 1e-20)
    if cfg.moe_routed_scale != 1.0:
        topv = topv * cfg.moe_routed_scale
    return _moe_combine(cfg, p, xt, topi, topv, x)


def _experts_out(cfg: TransformerConfig, ex, xt, topi, topv, n_experts):
    """Weighted sum of selected experts' outputs: dense einsum over the
    expert dim (`mul_mat_id` analog), gathered per token via one-hot matmul
    so shapes stay static for XLA."""
    onehot = jax.nn.one_hot(topi, n_experts, dtype=xt.dtype)          # [N,K,E]
    combine = jnp.einsum("nk,nke->ne", topv.astype(xt.dtype), onehot) # [N,E]
    gw, uw, dw = ex["gate"], ex["up"], ex["down"]
    g = jnp.einsum("nh,ehf->enf", xt, gw)
    u = jnp.einsum("nh,ehf->enf", xt, uw)
    if "gate_b" in ex:
        g = g + ex["gate_b"][:, None, :]
        u = u + ex["up_b"][:, None, :]
    if cfg.moe_act == "swiglu_oai":
        # ggml swiglu_oai (ggml-cpu/ops.cpp:3319-3324): clamp gate above,
        # up both sides, sigmoid-gate with alpha, (up+1) multiplier
        L, a = cfg.moe_swiglu_limit, cfg.moe_swiglu_alpha
        gf = jnp.minimum(g.astype(jnp.float32), L)
        uf = jnp.clip(u.astype(jnp.float32), -L, L)
        hidden = (gf * jax.nn.sigmoid(a * gf) * (uf + 1.0)).astype(g.dtype)
    else:
        hidden = _act(cfg.act)(g) * u
    out = jnp.einsum("enf,efh->enh", hidden, dw)                      # [E,N,H]
    if "down_b" in ex:
        out = out + ex["down_b"][:, None, :]
    return jnp.einsum("enh,ne->nh", out, combine)


def _moe_combine(cfg: TransformerConfig, p, xt, topi, topv, x):
    B, T, H = x.shape
    if cfg.moe_pre_weighting:
        # Llama-4: the routing weight scales the expert INPUT (nonlinear, so
        # it cannot be folded into the output combine)
        ones = jnp.ones_like(topv[:, :1])
        y = 0.0
        for k in range(topi.shape[-1]):
            xk = xt * topv[:, k:k + 1].astype(xt.dtype)
            y = y + _experts_out(cfg, p["experts"], xk, topi[:, k:k + 1],
                                 ones, cfg.moe_num_experts)
    else:
        y = _experts_out(cfg, p["experts"], xt, topi, topv, cfg.moe_num_experts)
    if "small_experts" in p:
        # GroveMoE big/little experts (models/grove.cpp BigLittleGrouped
        # SparseMoE): every selected expert also runs its group's small
        # "chunk" expert with the SAME routing weight; outputs are added
        n_small = p["small_experts"]["gate"].shape[0]
        group = cfg.moe_num_experts // n_small
        y = y + _experts_out(cfg, p["small_experts"], xt, topi // group,
                             topv, n_small)
    if "shared" in p:
        sh = gated_mlp(cfg, p["shared"], xt)
        if "shared_gate" in p:
            # sigmoid-gated shared expert (Qwen2MoE `shared_expert_gate`)
            gate = jax.nn.sigmoid(matmul(xt, p["shared_gate"]).astype(jnp.float32))
            sh = (sh.astype(jnp.float32) * gate).astype(sh.dtype)
        y = y + sh
    return y.reshape(B, T, H).astype(x.dtype)


from ..ops.norm import weightless_rms as _weightless_rms


def attention_block(cfg: TransformerConfig, spec: LayerSpec, p, x,
                    cos, sin, k_cache, v_cache, n_past,
                    k_scale=None, v_scale=None, q_mult=None,
                    mask_extra=None, rope_cfg=None):
    B, T, H = x.shape
    d = spec.head_dim or cfg.resolved_head_dim()
    hq = cfg.num_attention_heads
    hkv = spec.num_kv_heads or cfg.num_key_value_heads
    rc = rope_cfg or cfg.rope
    shared = spec.shared_kv_from >= 0      # read another layer's cache
    #                                        (Gemma4 KV-shared layers)

    if shared:
        q = matmul(x, p["q"], shard="out").reshape(B, T, hq, d)
        k = v = None
    elif "qkv" in p:
        # consolidated projection (BaseConsolidatedQKVAttention,
        # src/layers.h:1773): rows ordered [q | k | v]
        fused = matmul(x, p["qkv"])
        qo, kvo = hq * d, hkv * d
        q = fused[..., :qo].reshape(B, T, hq, d)
        k = fused[..., qo:qo + kvo].reshape(B, T, hkv, d)
        v = fused[..., qo + kvo:].reshape(B, T, hkv, d)
    else:
        q = matmul(x, p["q"], shard="out").reshape(B, T, hq, d)
        k = matmul(x, p["k"], shard="out").reshape(B, T, hkv, d)
        if spec.v_from_k:
            # v is the raw k-projection output (Gemma4 use_k_as_v,
            # models/gemma4.cpp:1775; k continues through k_norm+rope below)
            v = k
        else:
            v = matmul(x, p["v"], shard="out").reshape(B, T, hkv, d)
    if cfg.v_norm and v is not None:
        # weightless per-head RMS norm on v (ggml::rms_norm(v, 1e-6),
        # models/gemma4.cpp:1777)
        v = _weightless_rms(v)

    if cfg.qk_norm == "rmsnorm_full":
        # RMS norm over the whole projection (OLMo2-style)
        q = rms_norm(q.reshape(B, T, hq * d), p["q_norm"]["w"],
                     eps=cfg.norm_eps).reshape(B, T, hq, d)
        if k is not None:
            k = rms_norm(k.reshape(B, T, hkv * d), p["k_norm"]["w"],
                         eps=cfg.norm_eps).reshape(B, T, hkv, d)
    elif cfg.qk_norm == "layernorm":
        # per-head LayerNorm with bias (Persimmon qk_layernorm,
        # reference PersimmonSelfAttention src/layers.h:3184)
        q = layer_norm(q, p["q_norm"]["w"], p["q_norm"].get("b"), eps=cfg.norm_eps)
        if k is not None:
            k = layer_norm(k, p["k_norm"]["w"], p["k_norm"].get("b"), eps=cfg.norm_eps)
    elif cfg.qk_norm == "rmsnorm_halves":
        # NeoChat: separate per-head RMS norms on the t-half and hw-half of
        # head_dim (q_norm/q_norm_hw each over d/2 dims,
        # models/neochat.cpp BaseNeoAttention ctor :447-460)
        dh = d // 2
        q = jnp.concatenate(
            [rms_norm(q[..., :dh], p["q_norm"]["w"], eps=cfg.norm_eps),
             rms_norm(q[..., dh:], p["q_norm_hw"]["w"], eps=cfg.norm_eps)],
            axis=-1)
        if k is not None:
            k = jnp.concatenate(
                [rms_norm(k[..., :dh], p["k_norm"]["w"], eps=cfg.norm_eps),
                 rms_norm(k[..., dh:], p["k_norm_hw"]["w"], eps=cfg.norm_eps)],
                axis=-1)
    elif cfg.qk_norm not in ("none", "rmsnorm_post", "l2norm_post"):
        # per-head RMS norm over head_dim (reference QKNormedAttention
        # src/layers.h:3073)
        q = rms_norm(q, p["q_norm"]["w"], eps=cfg.norm_eps, offset=cfg.rms_norm_offset)
        if k is not None:
            k = rms_norm(k, p["k_norm"]["w"], eps=cfg.norm_eps, offset=cfg.rms_norm_offset)

    if spec.use_rope:
        if cfg.rope.layout == "neo3d":
            # head split [t: d/2, h: d/4, w: d/4], each NeoX-rotated with
            # its own table (models/neochat.cpp split_norm_rope)
            dh, dq = d // 2, d // 4

            def _neo(v):
                return jnp.concatenate(
                    [apply_rope(v[..., :dh], cos[0], sin[0], layout="neox"),
                     apply_rope(v[..., dh:dh + dq], cos[1], sin[1], layout="neox"),
                     apply_rope(v[..., dh + dq:], cos[2], sin[2], layout="neox")],
                    axis=-1)
            q = _neo(q)
            k = _neo(k)
        else:
            q = apply_rope(q, cos, sin, layout=rc.layout, rot_dim=rc.resolved_rot_dim())
            if k is not None:
                k = apply_rope(k, cos, sin, layout=rc.layout, rot_dim=rc.resolved_rot_dim())

    if cfg.qk_norm == "rmsnorm_post":
        # per-head norm AFTER rope (QKNormedAttention post_norm,
        # src/layers.h:3125; Hunyuan)
        q = rms_norm(q, p["q_norm"]["w"], eps=cfg.norm_eps, offset=cfg.rms_norm_offset)
        k = rms_norm(k, p["k_norm"]["w"], eps=cfg.norm_eps, offset=cfg.rms_norm_offset)
    elif cfg.qk_norm == "l2norm_post" and spec.use_rope:
        # weightless per-head norm after rope (Llama-4 Llama4TextL2Norm:
        # x * rsqrt(mean(x^2) + eps)); HF applies it ONLY on rope layers
        # (Llama4Attention: `if use_qk_norm and use_rope`)
        def _l2(v):
            vf = v.astype(jnp.float32)
            return (vf * jax.lax.rsqrt(
                jnp.mean(vf * vf, axis=-1, keepdims=True) + 1e-6)).astype(v.dtype)
        q = _l2(q)
        k = _l2(k)

    if q_mult is not None:
        # Qwen-v1 logn attention (mat_scale custom op, src/layers.cpp:3489)
        q = (q.astype(jnp.float32) * q_mult[:, :, None, None]).astype(q.dtype)

    if spec.sliding_window > 0 and k_cache.shape[1] < cfg.max_length:
        # ring cache write (partial cache, reference src/layers.h:1973);
        # n_past may be a scalar (chat path) or a per-slot [B] vector
        # (continuous-batching decode, runtime/batching.py)
        assert mask_extra is None, "mask_extra unsupported with ring cache"
        from ..ops.attention import quantize_kv

        if not shared:
            S = k_cache.shape[1]
            if jnp.ndim(n_past) == 1:
                b_idx = jnp.arange(B)[:, None]                  # [B,1]
                pos = jnp.mod(n_past[:, None] + jnp.arange(T)[None, :], S)
                idx = (b_idx, pos)
            else:
                pos = jnp.mod(n_past + jnp.arange(T), S)
                idx = (slice(None), pos)
            if k_scale is not None:
                kq, ks = quantize_kv(k)
                vq, vs = quantize_kv(v)
                k_cache = k_cache.at[idx].set(kq)
                v_cache = v_cache.at[idx].set(vq)
                k_scale = k_scale.at[idx].set(ks)
                v_scale = v_scale.at[idx].set(vs)
            else:
                k_cache = k_cache.at[idx].set(k.astype(k_cache.dtype))
                v_cache = v_cache.at[idx].set(v.astype(v_cache.dtype))
        out = _ring_attention(cfg, spec, q, k_cache, v_cache, n_past, T,
                              k_scale, v_scale, sinks=p.get("sinks"))
    else:
        if not shared:
            k_cache, v_cache, k_scale, v_scale = update_kv_cache(
                k_cache, v_cache, k, v, n_past, k_scale, v_scale)
        scale = cfg.attention_scale if cfg.attention_scale > 0 else d ** -0.5
        out = attention_with_cache(
            q, k_cache, v_cache, n_past, T,
            scale=scale, causal=cfg.causal,
            logit_softcap=cfg.logit_softcap,
            sliding_window=spec.sliding_window,
            sinks=p.get("sinks"),
            alibi_slopes=(alibi_slopes_for(hq) if cfg.use_alibi else None),
            mask_extra=mask_extra,
            k_scale=k_scale, v_scale=v_scale,
        )
    out = out.reshape(B, T, hq * d)
    if cfg.attn_out_gate and "gate" in p:
        # sigmoid output gate on the merged attention output before o_proj
        # (QwenGatedAttention::forward, models/qwen3_5.cpp:246-263)
        gate = jax.nn.sigmoid(matmul(x, p["gate"]).astype(jnp.float32))
        out = (out.astype(jnp.float32) * gate).astype(out.dtype)
    return matmul(out, p["o"], shard="in").astype(x.dtype), k_cache, v_cache, k_scale, v_scale


def _ring_attention(cfg, spec, q, k_cache, v_cache, n_past, T,
                    k_scale=None, v_scale=None, sinks=None):
    """Attention over a ring-buffer cache of S = window slots: key absolute
    position reconstructed from ring index for masking + RoPE'd keys stored
    rotated (keys carry absolute-position rope, as in the reference).
    n_past: scalar, or per-slot [B] vector (continuous batching) — the mask
    is computed per batch row either way."""
    B, _, hq, d = q.shape
    S = k_cache.shape[1]
    hkv = k_cache.shape[2]
    scale = cfg.attention_scale if cfg.attention_scale > 0 else d ** -0.5
    # absolute position of each ring slot: the latest write to slot j
    np_vec = jnp.broadcast_to(jnp.asarray(n_past).reshape(-1), (B,))
    total = np_vec[:, None] + T                                # [B,1]
    slot = jnp.arange(S)[None, :]                              # [1,S]
    # pos ≡ slot (mod S), pos < total, pos > total - S - 1 → unique solve:
    k_pos = slot + ((total - 1 - slot) // S) * S               # [B,S]
    k_pos = jnp.where(k_pos < 0, -1, k_pos)                    # unwritten
    q_pos = np_vec[:, None] + jnp.arange(T)[None, :]           # [B,T]
    valid = (k_pos[:, None, :] >= 0) & (k_pos[:, None, :] <= q_pos[..., None])
    if spec.sliding_window > 0:
        valid &= k_pos[:, None, :] > (q_pos[..., None] - spec.sliding_window)
    mask = jnp.where(valid, 0.0, -1e30)                        # [B,T,S]
    qg = q.reshape(B, T, hkv, hq // hkv, d).astype(jnp.float32)
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, k_cache.astype(jnp.float32)) * scale
    if k_scale is not None:
        scores = scores * k_scale.transpose(0, 2, 1)[:, :, None, None, :]
    if cfg.logit_softcap > 0:
        scores = jnp.tanh(scores / cfg.logit_softcap) * cfg.logit_softcap
    scores = scores + mask[:, None, None]                      # [B,1,1,T,S]
    if sinks is not None:
        # per-head sink logit joins the softmax denominator, no value
        # (GPT-OSS SWA layers; see ops/attention.py for the dense path)
        G = hq // hkv
        sk = sinks.reshape(hkv, G).astype(jnp.float32)
        sk = jnp.broadcast_to(sk[None, :, :, None, None],
                              scores.shape[:-1] + (1,))
        all_scores = jnp.concatenate([scores, sk], axis=-1)
        m = jnp.max(all_scores, axis=-1, keepdims=True)
        e = jnp.exp(all_scores - m)
        p = e[..., :-1] / jnp.sum(e, axis=-1, keepdims=True)
    else:
        p = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        p = p * v_scale.transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum("bhgts,bshd->bthgd", p, v_cache.astype(jnp.float32))
    return out.reshape(B, T, hq, d).astype(q.dtype)


def mla_attention_block(cfg: TransformerConfig, spec: LayerSpec, p, x,
                        cos, sin, k_cache, v_cache, n_past,
                        k_scale=None, v_scale=None):
    """Multi-head latent attention, expanded ("speed") mode: the compressed
    kv-lora is up-projected to full per-head K/V which are cached
    (reference BaseMLAttention::forward_speed, models/deepseek.cpp; weights
    pre-split by the converter, convert.py:7975-8007).  RoPE applies to the
    TAIL qk_rope dims; the converter's permute_pair re-lays the native
    interleaved pairs into half-split order, and the reference runs
    RoPEMode::Original (models/deepseek.h:421) — i.e. NEOX lanes here."""
    if cfg.mla_compressed:
        return _mla_compressed_block(cfg, spec, p, x, cos, sin, k_cache,
                                     v_cache, n_past, k_scale, v_scale)
    B, T, H = x.shape
    m = cfg.mla
    h = cfg.num_attention_heads
    dn, dr, dv = m.qk_nope_head_dim, m.qk_rope_head_dim, m.v_head_dim
    dk = dn + dr

    if m.q_lora_rank > 0:
        cq = matmul(x, p["d_q"])
        cq = rms_norm(cq, p["q_norm"]["w"], eps=cfg.norm_eps)
        q = matmul(cq, p["u_q"]).reshape(B, T, h, dk)
    else:
        q = matmul(x, p["q"]).reshape(B, T, h, dk)
    q_nope, q_pe = q[..., :dn], q[..., dn:]
    q_pe = apply_rope(q_pe, cos, sin, layout=cfg.rope.layout)

    kv_lora = matmul(x, p["d_kv"])                                 # [B,T,rank]
    k_pe = matmul(x, p["k_pe"]).reshape(B, T, 1, dr)
    k_pe = apply_rope(k_pe, cos, sin, layout=cfg.rope.layout)
    c = rms_norm(kv_lora, p["kv_norm"]["w"], eps=cfg.norm_eps)
    k_nope = matmul(c, p["u_k_nope"]).reshape(B, T, h, dn)
    v = matmul(c, p["u_v"]).reshape(B, T, h, dv)

    q = jnp.concatenate([q_nope, q_pe], axis=-1).astype(x.dtype)
    k = jnp.concatenate([k_nope, jnp.broadcast_to(k_pe, (B, T, h, dr))],
                        axis=-1).astype(x.dtype)

    k_cache, v_cache, k_scale, v_scale = update_kv_cache(
        k_cache, v_cache, k, v, n_past, k_scale, v_scale)
    scale = cfg.attention_scale if cfg.attention_scale > 0 else dk ** -0.5
    out = attention_with_cache(q, k_cache, v_cache, n_past, T,
                               scale=scale, causal=True,
                               k_scale=k_scale, v_scale=v_scale)
    out = out.reshape(B, T, h * dv)
    return matmul(out, p["o"]).astype(x.dtype), k_cache, v_cache, k_scale, v_scale


def _mla_compressed_block(cfg, spec, p, x, cos, sin, k_cache, v_cache,
                          n_past, k_scale, v_scale):
    """Latent-cache MLA (reference "memory" mode, BaseMLAttention::
    forward_memory, models/deepseek.cpp:406) with the TPU-native absorption
    trick: instead of re-expanding K/V from the latent every step, the
    u_k_nope / u_v up-projections are folded into the query and the output
    (p["wk_abs"]/p["wv_abs"], prepared at load).  Attention then runs in the
    latent space as MQA with head_dim = kv_rank + rope_dim:

        q_lat  = q_nope · Wk            [B,T,h,rank]
        scores = [q_lat | q_pe] · cache  (cache row = [c | k_pe])
        ctx    = probs · c              [B,T,h,rank]
        out    = ctx · Wv               [B,T,h,dv]

    Cache memory drops h× vs the expanded mode (e.g. 16× for V2-Lite).
    Quantized-cache mode is not supported here (use expanded)."""
    assert k_scale is None, "compressed MLA cache incompatible with q8 cache"
    assert jnp.ndim(n_past) == 0, (
        "per-slot n_past not supported with the compressed MLA cache; "
        "use --mla_cache speed for serving")
    B, T, H = x.shape
    m = cfg.mla
    h = cfg.num_attention_heads
    dn, dr = m.qk_nope_head_dim, m.qk_rope_head_dim
    rank = m.kv_lora_rank

    if m.q_lora_rank > 0:
        cq = matmul(x, p["d_q"])
        cq = rms_norm(cq, p["q_norm"]["w"], eps=cfg.norm_eps)
        q = matmul(cq, p["u_q"]).reshape(B, T, h, dn + dr)
    else:
        q = matmul(x, p["q"]).reshape(B, T, h, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]
    q_pe = apply_rope(q_pe, cos, sin, layout=cfg.rope.layout)

    kv_lora = matmul(x, p["d_kv"])
    c = rms_norm(kv_lora, p["kv_norm"]["w"], eps=cfg.norm_eps)
    k_pe = matmul(x, p["k_pe"]).reshape(B, T, 1, dr)
    k_pe = apply_rope(k_pe, cos, sin, layout=cfg.rope.layout)

    row = jnp.concatenate([c[:, :, None, :], k_pe], axis=-1)   # [B,T,1,rank+dr]
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, row.astype(k_cache.dtype), (0, n_past, 0, 0))

    q_lat = jnp.einsum("bthd,rhd->bthr", q_nope.astype(jnp.float32),
                       p["wk_abs"].astype(jnp.float32))
    q_full = jnp.concatenate([q_lat, q_pe.astype(jnp.float32)], axis=-1)

    S = k_cache.shape[1]
    cache = k_cache[:, :, 0, :].astype(jnp.float32)            # [B,S,rank+dr]
    scale = cfg.attention_scale if cfg.attention_scale > 0 else (dn + dr) ** -0.5
    scores = jnp.einsum("bthr,bsr->bhts", q_full, cache) * scale
    q_pos = n_past + jnp.arange(T)[:, None]
    k_pos = jnp.arange(S)[None, :]
    valid = (k_pos < n_past + T) & (k_pos <= q_pos)
    scores = scores + jnp.where(valid, 0.0, -1e30)[None, None]
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhts,bsr->bthr", probs, cache[..., :rank])
    out = jnp.einsum("bthr,rhd->bthd", ctx, p["wv_abs"].astype(jnp.float32))
    out = out.reshape(B, T, h * m.v_head_dim).astype(x.dtype)
    return matmul(out, p["o"]).astype(x.dtype), k_cache, v_cache, None, None


def gated_deltanet_block(cfg: TransformerConfig, p, x, conv_state, S0,
                         valid=None):
    """Qwen3.5 / Qwen3-Next Gated DeltaNet linear attention (reference
    QwenGatedDeltaNet, models/qwen3_5.cpp:198-485; numeric oracle HF
    torch_recurrent_gated_delta_rule + torch_causal_conv1d_update).

    conv_state: [B, K-1, 1, conv_dim] f32 causal-conv history.
    S0: [B, n_v_heads, dk, dv] f32 recurrent state.
    Returns (out [B, T, hidden], new_conv_state, new_S).
    """
    g = cfg.gdn
    B, T, _ = x.shape
    nk, nv, dk, dv = g.num_k_heads, g.num_v_heads, g.k_head_dim, g.v_head_dim

    mixed = matmul(x, p["qkv"]).astype(jnp.float32)       # [B,T,conv_dim]
    if valid is not None:
        # zero padded positions so they can't pollute the conv window or
        # the recurrent state (HF apply_mask_to_padding_states; prefill
        # buckets pad T beyond the real token count)
        mixed = mixed * valid[..., None]
    seq = jnp.concatenate([conv_state[:, :, 0, :], mixed], axis=1)
    if valid is not None:
        # keep the conv history pinned to the last VALID tokens: roll the
        # padded tail out of the window
        n_pad = x.shape[1] - jnp.sum(valid[0]).astype(jnp.int32)
        rolled = jnp.roll(seq, n_pad, axis=1)
        new_conv_state = jax.lax.dynamic_slice_in_dim(
            rolled, seq.shape[1] - (g.conv_kernel - 1), g.conv_kernel - 1,
            axis=1)[:, :, None, :]
    else:
        new_conv_state = seq[:, -(g.conv_kernel - 1):, :][:, :, None, :]
    # depthwise causal conv along T + SiLU (CausalConv1D::forward)
    w = jnp.transpose(p["conv_w"].astype(jnp.float32), (2, 1, 0))  # [K,1,C]
    conv = jax.lax.conv_general_dilated(
        seq, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=g.conv_dim)
    mixed = jax.nn.silu(conv)                              # [B,T,conv_dim]

    kd = g.key_dim
    q = mixed[..., :kd].reshape(B, T, nk, dk)
    k = mixed[..., kd:2 * kd].reshape(B, T, nk, dk)
    v = mixed[..., 2 * kd:].reshape(B, T, nv, dv)
    # fla l2norm (eps inside the sqrt), GQA repeat, 1/sqrt(dk) scale
    q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-6)
    k = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-6)
    rep = nv // nk
    q = jnp.repeat(q, rep, axis=2) * (dk ** -0.5)
    k = jnp.repeat(k, rep, axis=2)

    beta = jax.nn.sigmoid(matmul(x, p["b"]).astype(jnp.float32))   # [B,T,nv]
    glog = -jnp.exp(p["A_log"].astype(jnp.float32)) * jax.nn.softplus(
        matmul(x, p["a"]).astype(jnp.float32) + p["dt_bias"].astype(jnp.float32))
    if valid is not None:
        # padded steps become identity updates: beta=0 → delta=0,
        # g=0 → exp(0)=1 → S unchanged
        beta = beta * valid[..., None]
        glog = glog * valid[..., None]

    def step(S, inp):
        q_t, k_t, v_t, g_t, b_t = inp
        S = S * jnp.exp(g_t)[..., None, None]
        kv = jnp.einsum("bhk,bhkv->bhv", k_t, S)
        delta = (v_t - kv) * b_t[..., None]
        S = S + k_t[..., :, None] * delta[..., None, :]
        return S, jnp.einsum("bhk,bhkv->bhv", q_t, S)

    xs = (jnp.moveaxis(q, 1, 0), jnp.moveaxis(k, 1, 0),
          jnp.moveaxis(v.astype(jnp.float32), 1, 0),
          jnp.moveaxis(glog, 1, 0), jnp.moveaxis(beta, 1, 0))
    S, outs = jax.lax.scan(step, S0, xs)
    out = jnp.moveaxis(outs, 0, 1)                         # [B,T,nv,dv]

    # gated RMS norm over dv then out_proj (RMSNormGated,
    # models/qwen3_5.cpp:236-244; HF Qwen3NextRMSNormGated: norm before gate)
    z = matmul(x, p["z"]).astype(jnp.float32).reshape(B, T, nv, dv)
    out = rms_norm(out, p["norm_w"], eps=cfg.norm_eps)
    out = out * jax.nn.silu(z)
    out = out.reshape(B, T, nv * dv).astype(x.dtype)
    return matmul(out, p["o"], shard="in").astype(x.dtype), new_conv_state, S


def gemma4_cascade_moe(cfg: TransformerConfig, m, x):
    """Gemma4 residual-fed MoE branch (Gemma4MoE::forward +
    Gemma4TextRouter::forward2, models/gemma4.cpp:1834-1960): router =
    softmax(proj(rmsnorm(x))) with the norm weight pre-scaled by
    1/sqrt(hidden) at load, top-k renormalized and multiplied by a learned
    per-expert scale; experts consume pre_ffn_norm_2(x); output gets
    post_ffn_norm_2."""
    B, T, H = x.shape
    xt = x.reshape(B * T, H)
    rn = rms_norm(xt, m["router_norm"]["w"], eps=cfg.norm_eps)
    logits = matmul(rn, m["router_proj"]).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, cfg.moe_top_k)
    topv = topv / (jnp.sum(topv, axis=-1, keepdims=True) + 1e-20)
    topv = topv * m["per_expert_scale"].astype(jnp.float32)[topi]
    h2 = rms_norm(xt, m["pre2"]["w"], eps=cfg.norm_eps)
    y = _experts_out(cfg, m["experts"], h2.astype(x.dtype), topi, topv,
                     cfg.moe_num_experts)
    y = rms_norm(y, m["post2"]["w"], eps=cfg.norm_eps)
    return y.reshape(B, T, H).astype(x.dtype)


def decoder_layer(cfg: TransformerConfig, spec: LayerSpec, p, x,
                  cos, sin, k_cache, v_cache, n_past,
                  k_scale=None, v_scale=None, q_mult=None,
                  mask_extra=None, valid=None, rope_cfg=None,
                  layer_emb=None, pre_gate=None):
    """One decoder layer.  Pre-norm (LMBlock1), optional post-norms
    (LMBlock4/Gemma2), optional parallel residual (LMBlock2)."""
    if spec.no_attn:
        # attention-free layer (DeciLM): just the gated MLP block
        h = _norm(cfg, x, p["ffn_norm"]) if cfg.pre_norm else x
        x = x + mlp_dispatch(cfg, spec, p["mlp"], h)
        return x, k_cache, v_cache, k_scale, v_scale
    h = _norm(cfg, x, p["attn_norm"]) if cfg.pre_norm else x
    if spec.linear_attn:
        attn_out, k_cache, v_cache = gated_deltanet_block(
            cfg, p["attn"], h, k_cache, v_cache, valid)
    elif cfg.mla is not None:
        attn_out, k_cache, v_cache, k_scale, v_scale = mla_attention_block(
            cfg, spec, p["attn"], h, cos, sin, k_cache, v_cache, n_past,
            k_scale, v_scale)
    else:
        attn_out, k_cache, v_cache, k_scale, v_scale = attention_block(
            cfg, spec, p["attn"], h, cos, sin, k_cache, v_cache, n_past,
            k_scale, v_scale, q_mult, mask_extra, rope_cfg)
    if cfg.post_norms:
        attn_out = _norm(cfg, attn_out, p["post_attn_norm"])
    rs = cfg.residual_scale

    if cfg.glm1_residual:
        # GLM1 block (GLMBlock::forward, src/layers.cpp:2385-2401): the
        # residual is the NORMED input scaled by sqrt(2*num_layers)
        alpha = (2.0 * cfg.num_hidden_layers) ** 0.5
        x = h * alpha + attn_out
        h2 = _norm(cfg, x, p["ffn_norm"])
        mlp_out = mlp_dispatch(cfg, spec, p["mlp"], h2)
        x = h2 * alpha + mlp_out
    elif cfg.parallel_residual:
        mlp_out = mlp_dispatch(cfg, spec, p["mlp"], h)
        x = x + rs * (attn_out + mlp_out) if rs != 1.0 else x + attn_out + mlp_out
    else:
        x = x + rs * attn_out if rs != 1.0 else x + attn_out
        h = _norm(cfg, x, p["ffn_norm"]) if cfg.pre_norm else x
        if pre_gate is not None:
            # pre-gate routing: route with the PREVIOUS layer's ffn-norm
            # output, then record this layer's for the next (megrez.cpp:359)
            router_x = pre_gate[0] if (spec.is_moe
                                       and pre_gate[0] is not None) else None
            pre_gate[0] = h
        else:
            router_x = None
        if cfg.cascaded_moe and "moe" in p:
            # CascadedMLP (models/gemma4.cpp:1990-2001): dense MLP output
            # normed by post_ffn_norm_1 PLUS the MoE branch fed the
            # pre-MLP residual x; the outer post_ffn_norm wraps the sum
            dense = gated_mlp(cfg, p["mlp"], h)
            mlp_out = (rms_norm(dense, p["moe"]["post1"]["w"], eps=cfg.norm_eps)
                       + gemma4_cascade_moe(cfg, p["moe"], x))
        else:
            mlp_out = mlp_dispatch(cfg, spec, p["mlp"], h,
                                   router_x=router_x)
        if cfg.post_norms:
            mlp_out = _norm(cfg, mlp_out, p["post_ffn_norm"])
        x = x + rs * mlp_out if rs != 1.0 else x + mlp_out
    if layer_emb is not None and "ple_gate" in p:
        # PerLayerEmbeddingBlock (models/gemma4.cpp:1703-1727): gated mix of
        # the layer's per-layer embedding back into the stream
        resid = x
        g = _act(cfg.act)(matmul(x, p["ple_gate"]))
        hp = matmul((g * layer_emb.astype(g.dtype)), p["ple_proj"])
        hp = rms_norm(hp, p["ple_norm"]["w"], eps=cfg.norm_eps)
        x = resid + hp.astype(x.dtype)
    if "layer_scalar" in p:
        # learned whole-block output scale (Gemma4 BlockForward,
        # models/gemma4.cpp:2104)
        x = (x.astype(jnp.float32) * p["layer_scalar"]).astype(x.dtype)
    return x, k_cache, v_cache, k_scale, v_scale


# ---------------------------------------------------------------------------
# full model forward
# ---------------------------------------------------------------------------

def embed_tokens(cfg: TransformerConfig, params, ids):
    x = jnp.take(params["embed"], ids, axis=0)
    if cfg.embedding_scale != 1.0:
        x = (x.astype(jnp.float32) * cfg.embedding_scale).astype(x.dtype)
    return x


def lm_logits(cfg: TransformerConfig, params, x):
    if cfg.tie_lm_head:
        w = params["embed"]
        logits = jnp.dot(x.astype(w.dtype), w.T, preferred_element_type=jnp.float32)
    else:
        logits = matmul(x, params["lm_head"], shard="out")
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    if cfg.final_logit_softcap > 0:
        logits = jnp.tanh(logits / cfg.final_logit_softcap) * cfg.final_logit_softcap
    return logits


def transformer_forward(cfg: TransformerConfig, params, ids, cache: KVCache,
                        n_past, *, last_only: bool = False, last_index=None,
                        positions=None, input_embeds=None,
                        return_hidden: bool = False, mask_extra=None,
                        extra_residuals=None, n_valid=None, ple_ids=None):
    """ids: [B, T] int32 → (logits [B, T|1, V] f32, new cache).

    `input_embeds` [B, T, H] overrides token embedding lookup (multimodal
    prompts splice projected media embeddings between text embeddings —
    replaces the reference's extended-embedding-table trick,
    models/internvl.cpp ExtendEmbedding/before_generate).

    The reference analog is HeterogeneousModel::forward
    (/root/reference/src/models.cpp:1399-1449); here the per-layer device
    moves are replaced by sharding annotations on the param tree.
    """
    if input_embeds is not None:
        x = input_embeds
        B, T = x.shape[:2]
    else:
        B, T = ids.shape
        x = embed_tokens(cfg, params, ids)
    if positions is None:
        if jnp.ndim(n_past) == 1:          # per-slot offsets [B] (batching)
            positions = n_past[:, None] + jnp.arange(T)[None, :]
        else:
            positions = n_past + jnp.arange(T)[None, :]        # [1,T]
            positions = jnp.broadcast_to(positions, (B, T))
    if cfg.rope is not None and cfg.rope.layout == "neo3d":
        # NeoChat 3-D rope: 1-D positions mean text-only (h = w = 0)
        from ..ops.rope import neo3d_rope_cos_sin
        if positions.ndim == 3:
            pos3 = positions
        else:
            z = jnp.zeros_like(positions)
            pos3 = jnp.stack([positions, z, z])
        cos, sin = neo3d_rope_cos_sin(pos3, cfg.resolved_head_dim(),
                                      cfg.rope.freq_base, cfg.rope.freq_base_2)
    elif positions.ndim == 3 and cfg.rope is not None and cfg.rope.layout == "glm1":
        # ChatGLM1 2D rope: stream 0 = clamped position, stream 1 = block
        # position; frequency tables restart per half (vision-rope shape)
        from ..ops.rope import vision_rope_cos_sin
        cos, sin = vision_rope_cos_sin(positions[0], positions[1],
                                       cfg.rope.resolved_rot_dim(),
                                       cfg.rope.freq_base)
    elif positions.ndim == 3:
        # M-RoPE: [A, B, T] position streams (t, h, w[, e]) — Qwen2-VL
        # family multimodal prefill (models/qwen.cpp TensorPosHelper3D)
        from ..ops.rope import precompute_mrope_cache
        cos, sin = precompute_mrope_cache(positions, cfg.rope)
    else:
        # (for an mrope model with 1-D positions all axes share the position,
        # which reduces exactly to standard rope — no special casing)
        cos, sin = precompute_rope_cache(positions, cfg.rope)
    cos_l = sin_l = None
    if cfg.rope_local is not None:
        cos_l, sin_l = precompute_rope_cache(positions, cfg.rope_local)

    q_mult = None
    if cfg.logn_attn_seq > 0:
        pos1 = positions[-1] if positions.ndim == 3 else positions  # [B,T]
        pf = jnp.maximum(pos1.astype(jnp.float32), 1.0)
        q_mult = jnp.where(pos1 > cfg.logn_attn_seq,
                           jnp.log(pf) / jnp.log(float(cfg.logn_attn_seq)),
                           1.0)
    elif cfg.attn_scale_beta > 0.0 and cfg.attn_scale_orig > 0:
        pos1 = positions[-1] if positions.ndim == 3 else positions  # [B,T]
        q_mult = 1.0 + cfg.attn_scale_beta * jnp.log(
            1.0 + jnp.floor(pos1.astype(jnp.float32) / cfg.attn_scale_orig))

    valid = None
    if n_valid is not None:
        valid = (jnp.arange(T)[None, :] < n_valid).astype(jnp.float32)

    ple_embs = None
    if cfg.ple_dim > 0 and "ple" in params:
        # Gemma4 per-layer embeddings (PerLayerEmbedding::forward,
        # models/gemma4.cpp:1656-1676): table lookup (pre-scaled sqrt(dpl)
        # on disk) + projected-and-normed input embeddings, × sqrt(0.5).
        # ple_ids default to the token ids; multimodal callers pass media
        # ids clamped to pad (reference run_model ids_for_layer).
        pl = params["ple"]
        pids = ids if ple_ids is None else ple_ids
        assert pids is not None, (
            "per-layer embeddings need token ids: pass ple_ids alongside "
            "input_embeds")
        Lp, dpl = cfg.num_hidden_layers, cfg.ple_dim
        pe = jnp.take(pl["embed"], pids, axis=0).reshape(B, T, Lp, dpl)
        proj = matmul(x, pl["proj"]).astype(jnp.float32)
        proj = proj.reshape(B, T, Lp, dpl) * (cfg.hidden_size ** -0.5)
        proj = rms_norm(proj, pl["norm"]["w"], eps=cfg.norm_eps)
        ple_embs = ((pe.astype(jnp.float32) + proj) * (0.5 ** 0.5)).astype(x.dtype)

    ks, vs = list(cache.k), list(cache.v)
    quant = cache.k_scale is not None
    kss = list(cache.k_scale) if quant else [None] * len(cache.k)
    vss = list(cache.v_scale) if quant else [None] * len(cache.k)
    L = cfg.num_hidden_layers
    fwd_to = dict(cfg.layer_fwd)           # src layer -> dst layer (static)
    for loop in range(max(1, cfg.num_loops)):
        # looped/recurrent stacks (Nanbeige LoopModel, models/nanbeige.cpp:
        # 250-330; Ouro): weights are shared across loops, each loop has its
        # own KV cache slice, final norm applied between loops unless skipped
        if loop > 0 and not cfg.skip_loop_final_norm:
            x = _norm(cfg, x, params["final_norm"])
        fwd_saved = {}
        # Megrez2 pre-gate: 1-element carrier threading each layer's
        # ffn-norm output to the NEXT layer's MoE router (megrez.cpp:359)
        pre_gate = [None] if cfg.moe_pre_gate else None
        for i in range(L):
            spec = cfg.layer_spec(i)
            ci = loop * L + i
            if i in fwd_saved:
                # Solar-Pro bskcn blend at the skip target
                t = cfg.layer_fwd_alpha
                x = (t * fwd_saved.pop(i).astype(jnp.float32)
                     + (1.0 - t) * x.astype(jnp.float32)).astype(x.dtype)
            use_local = spec.local_rope and cos_l is not None
            c, s_ = (cos_l, sin_l) if use_local else (cos, sin)
            rcfg = cfg.rope_local if use_local else cfg.rope
            lemb = ple_embs[:, :, i, :] if ple_embs is not None else None
            if spec.shared_kv_from >= 0:
                # read the source layer's cache (already updated this step —
                # shared layers come after their source); discard writes
                cj = loop * L + spec.shared_kv_from
                x, _, _, _, _ = decoder_layer(
                    cfg, spec, params["layers"][i], x, c, s_, ks[cj], vs[cj],
                    n_past, kss[cj], vss[cj], q_mult, mask_extra, valid,
                    rcfg, lemb, pre_gate)
            else:
                x, ks[ci], vs[ci], kss[ci], vss[ci] = decoder_layer(
                    cfg, spec, params["layers"][i], x, c, s_, ks[ci], vs[ci],
                    n_past, kss[ci], vss[ci], q_mult, mask_extra, valid,
                    rcfg, lemb, pre_gate)
            if extra_residuals is not None and i < extra_residuals.shape[0]:
                # DeepStack visual features added to the first few layers'
                # hidden states (HF Qwen3VLTextModel._deepstack_process;
                # reference models/qwen.cpp:2558 DeepStackPreprocess)
                x = x + extra_residuals[i].astype(x.dtype)
            if i in fwd_to:
                fwd_saved[fwd_to[i]] = x

    x = _norm(cfg, x, params["final_norm"])
    if last_only:
        x = x[:, -1:, :]
    elif last_index is not None:
        # bucketed prefill: the last REAL token sits at n_valid-1 inside the
        # right-padded T — slice the hidden state BEFORE lm_head so the
        # vocab projection runs on 1 position, not T (at T=2048/V=128k the
        # full-T lm_head is a 2.15 TFLOP no-op that costs ~15 ms of TTFT)
        x = jax.lax.dynamic_slice_in_dim(
            x, jnp.asarray(last_index, jnp.int32), 1, axis=1)
    # return_hidden: skip lm_head (reference transformer->skip_lm_head,
    # janus.cpp generate_next_token — the gen head replaces it)
    logits = x if return_hidden else lm_logits(cfg, params, x)
    return logits, KVCache(
        k=tuple(ks), v=tuple(vs),
        k_scale=tuple(kss) if quant else None,
        v_scale=tuple(vss) if quant else None)
