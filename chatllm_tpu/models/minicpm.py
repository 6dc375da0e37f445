"""MiniCPM family (reference /root/reference/models/minicpm.cpp, 920 LoC):

  v1 (MINICPM)       llama arch + scale_depth residual scaling, tied head,
                     "<用户>/<AI>" template                 (minicpm.cpp:9-165)
  v2 (MINICPM2)      v1 config, untied, ChatML-ids template (:167-277)
  MoE (MINICPM_MoE)  v1 + sparse FFN (per-expert w1/w2/w3)  (:278-378)
  v3 (MINICPM3)      MLA attention (deepseek-v2-light) with LongRoPE
                     factors over the rope dims             (:380-506)
  v4 (MINICPM4)      Phi3-SU-style LongRoPE llama blocks    (:766-822)
  v5 (MINICPM5)      plain llama blocks + head_dim override (:823-919)
  Embedding-Light    bidirectional v1 blocks + position-weighted mean
                     pooling (MiniCPMMeanPooling, src/layers.h:2639)
  ReRanker-Light     first-token RMSNorm + score head + sigmoid (:666-764)

The converter pre-scales embeddings by scale_emb and pre-divides
scale_depth by sqrt(num_layers) (reference convert.py MiniCPMConverter),
so loaders consume those as-is.  Constant logit scaling (mup/
dim_model_base) is dropped exactly as the reference drops it — greedy
ranking is scale-invariant.
"""
from __future__ import annotations

import math
from dataclasses import replace

import numpy as np

from ..nn.transformer import LayerSpec, MLAConfig, TransformerConfig
from ..ops.rope import ROPE_NORMAL, RopeConfig
from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor1, BPEProcessor2
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, load_moe_experts, register_model)
from .llama import build_dense_config
from .model_types import ModelType


class MiniCPMV1Encoder(HistoryEncoder):
    """bos + " " system; "<用户>{user}"; "<AI>" (minicpm.cpp:130-165)."""

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        ids.extend(tok.encode(" "))

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode(f"<用户>{user}"))

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        ids.extend(self.tokenizer.encode(ai))

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("<AI>"))


class MiniCPMV2Encoder(HistoryEncoder):
    """ChatML-by-id template (minicpm.cpp v2 ChatHistoryEncoder:243-276):
    sys = bos; user/ai wrapped in im_start .. im_end [+ \\n for v3]."""

    append_nl = False

    def _encode(self, text, ids, add_start, add_end):
        tok = self.tokenizer
        if add_start:
            ids.append(tok.im_start_token_id)
        ids.extend(tok.encode(text))
        if add_end:
            ids.append(tok.im_end_token_id)
            if self.append_nl:
                ids.append(tok.nl_token_id)

    def append_sys_prompt(self, ids):
        ids.append(self.tokenizer.bos_token_id)

    def append_user(self, round_idx, user, ids):
        self._encode(f"user\n{user}", ids, True, True)

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        self._encode(ai, ids, False, True)

    def append_ai_opening(self, round_idx, ids):
        self._encode("assistant\n", ids, True, False)


def _v1_tokenizer(gf, base: BaseConfig, encoder=None, processor=None):
    tp = processor or BPEProcessor1()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, encoder or MiniCPMV1Encoder(), sys_prompt="")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.pad_token_id = base.pad_token_id
    return tok


def _v2_tokenizer(gf, base: BaseConfig, *, append_nl=False, bpe2=False):
    enc = MiniCPMV2Encoder()
    enc.append_nl = append_nl
    tok = _v1_tokenizer(gf, base, enc,
                        processor=BPEProcessor2() if bpe2 else None)
    tp = tok.tp
    tok.im_end_token_id = tp.piece_to_id("<|im_end|>")
    tok.im_start_token_id = tp.piece_to_id("<|im_start|>")
    tok.nl_token_id = (tp.encode("\n") or [-1])[0]
    if tok.im_end_token_id < 0 and base.vocab_size == 73448:
        # old MiniCPM-2 vocab hardcodes (minicpm.cpp:204-210)
        tok.im_end_token_id, tok.im_start_token_id = 73440, 73441
    if tok.im_end_token_id >= 0:
        tok.terminate_ids.add(tok.im_end_token_id)
    return tok


@register_model(ModelType.MINICPM)
class MiniCPM(BaseLLM):
    # BaseConfig + n_kv + f{rope_scaling, rope_theta, scale_depth/sqrt(L)}
    # (minicpm.cpp:11-17)
    EXTRA_FMT = "i3f"
    TIE = True

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, scaling, theta, scale_depth) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=theta, tie_lm_head=cls.TIE,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, residual_scale=scale_depth,
                      rope=replace(cfg.rope, freq_scale=1.0 / max(scaling, 1e-6)))
        tok = cls.make_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers,
                                          tie_lm_head=cls.TIE)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)

    @classmethod
    def make_tokenizer(cls, gf, base):
        return _v1_tokenizer(gf, base)


@register_model(ModelType.MINICPM2)
class MiniCPM2(MiniCPM):
    TIE = False

    @classmethod
    def make_tokenizer(cls, gf, base):
        return _v2_tokenizer(gf, base)


@register_model(ModelType.MINICPM_MoE)
class MiniCPMMoE(BaseLLM):
    # BaseConfig + {n_kv, num_experts, num_experts_per_tok} +
    # f{scaling, theta, scale_depth} (minicpm.cpp:280-288)
    EXTRA_FMT = "3i3f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        n_kv, n_experts, n_active, scaling, theta, scale_depth = extra
        n_layers = base.num_hidden_layers
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=theta, tie_lm_head=True,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, residual_scale=scale_depth,
                      rope=replace(cfg.rope, freq_scale=1.0 / max(scaling, 1e-6)),
                      layer_specs=tuple(LayerSpec(is_moe=True)
                                        for _ in range(n_layers)),
                      moe_num_experts=n_experts, moe_top_k=n_active,
                      # reference default norm_topk_prob=true
                      # (src/layers.cpp:3727; MiniCPMSparseMoE never
                      # overrides, minicpm.cpp:298-304)
                      moe_norm_topk_prob=True)
        tok = _v1_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "layers": [],
        }
        for i in range(n_layers):
            pfx = f"model.layers.{i}"
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                },
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate"),
                    # w1=gate, w3=up, w2=down (llama.cpp expert naming)
                    "experts": load_moe_experts(pb, f"{pfx}.mlp", n_experts,
                                                names=("w1", "w3", "w2")),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


def _longrope(max_len: int, orig_max: int, theta: float, factors_short,
              factors_long, half: int) -> RopeConfig:
    """LongRoPE factor selection + mscale (minicpm.cpp v3/v4/emb pattern:
    long factors + sqrt(1 + ln(s)/ln(orig)) when extended past orig)."""
    scale = max_len / max(orig_max, 1)
    if scale > 1.0:
        ff = tuple(float(f) for f in factors_long[:half])
        mscale = math.sqrt(1.0 + math.log(scale) / math.log(max(orig_max, 2)))
    else:
        ff = tuple(float(f) for f in factors_short[:half])
        mscale = 1.0
    return ff, mscale


@register_model(ModelType.MINICPM3)
class MiniCPM3(BaseLLM):
    """MLA + LongRoPE (minicpm.cpp:380-506; MLA weights pre-split by the
    converter exactly like deepseek — convert.py MiniCPM3Converter)."""
    # ints {n_kv, kv_lora_rank, q_lora_rank, qk_nope, qk_rope, orig_max,
    # v_head_dim, dim_model_base} + f scale_depth + 16f short + 16f long
    EXTRA_FMT = "8if16f16f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, kv_lora, q_lora, qk_nope, qk_rope, orig_max, v_head_dim,
         _dim_model_base) = extra[:8]
        scale_depth = float(extra[8])
        short_f = extra[9:9 + 16]
        long_f = extra[9 + 16:9 + 32]
        max_len = rt.max_length if rt.max_length > 0 else base.max_length
        ff, mscale = _longrope(max_len, orig_max, 10000.0, short_f, long_f,
                               qk_rope // 2)
        dk = qk_nope + qk_rope
        rope = RopeConfig(head_dim=qk_rope, rot_dim=qk_rope,
                          freq_base=10000.0, layout=ROPE_NORMAL,
                          freq_factors=ff, mscale_all=mscale,
                          orig_ctx=orig_max)
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=base.num_attention_heads,
            intermediate_size=base.intermediate_size,
            max_length=max_len, norm_eps=1e-5, rope=rope,
            attention_scale=dk ** -0.5, residual_scale=scale_depth,
            tie_lm_head=True,
            mla=MLAConfig(q_lora_rank=q_lora, kv_lora_rank=kv_lora,
                          qk_nope_head_dim=qk_nope, qk_rope_head_dim=qk_rope,
                          v_head_dim=v_head_dim),
            mla_compressed=(rt.mla_cache == "memory"),
            cache_dtype=rt.cache_dtype)
        tok = _v2_tokenizer(gf, base, append_nl=True)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "layers": [],
        }
        for i in range(base.num_hidden_layers):
            pfx = f"model.layers.{i}"
            attn = {
                "d_kv": pb.linear(f"{pfx}.self_attn.d_kv_proj"),
                "k_pe": pb.linear(f"{pfx}.self_attn.k_pe_proj"),
                "kv_norm": pb.norm(f"{pfx}.self_attn.kv_norm"),
                "u_k_nope": pb.linear(f"{pfx}.self_attn.u_k_nope_proj"),
                "u_v": pb.linear(f"{pfx}.self_attn.u_v_proj"),
                "o": pb.linear(f"{pfx}.self_attn.o_proj"),
            }
            if q_lora > 0:
                attn["d_q"] = pb.linear(f"{pfx}.self_attn.d_q_proj")
                attn["q_norm"] = pb.norm(f"{pfx}.self_attn.q_norm")
                attn["u_q"] = pb.linear(f"{pfx}.self_attn.u_q_proj")
            else:
                attn["q"] = pb.linear(f"{pfx}.self_attn.q_proj")
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": attn,
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.MINICPM4)
class MiniCPM4(BaseLLM):
    """Phi3-SU-style LongRoPE llama (minicpm.cpp:766-822)."""
    # ints {n_kv, max_pos, orig_max, tie, factor_len} + f{mup_denominator,
    # lm_head_pre_scale, rope_theta, scale_depth} + 128f short + 128f long
    MAX_FACTOR_LEN = 128
    EXTRA_FMT = "5i4f128f128f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        n_kv, max_pos, orig_max, tie_flag, factor_len = extra[:5]
        _mup, _pre_scale, theta, scale_depth = extra[5:9]
        F = cls.MAX_FACTOR_LEN
        short_f = extra[9:9 + F]
        long_f = extra[9 + F:9 + 2 * F]
        max_len = rt.max_length if rt.max_length > 0 else base.max_length
        half = base.hidden_size // base.num_attention_heads // 2
        ff = mscale = None
        if factor_len > 0:
            ff, mscale = _longrope(max_len, orig_max, theta, short_f, long_f,
                                   half)
        tie = bool(tie_flag)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=theta, tie_lm_head=tie,
                                 freq_factors=ff, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, residual_scale=scale_depth,
                      rope=replace(cfg.rope, mscale_all=mscale or 1.0))
        tok = _v2_tokenizer(gf, base, append_nl=True)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers,
                                          tie_lm_head=tie)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.MINICPM5)
class MiniCPM5(BaseLLM):
    """Plain llama blocks + head_dim override + ChatML BPE2 tokenizer with
    thought/tool special pieces (minicpm.cpp:823-919)."""
    EXTRA_FMT = "3i2f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        n_kv, head_dim, tie_flag, scaling, theta = extra
        tie = bool(tie_flag)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=theta, head_dim=head_dim,
                                 tie_lm_head=tie, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, rope=replace(cfg.rope,
                                        freq_scale=1.0 / max(scaling, 1e-6)))
        tok = _v2_tokenizer(gf, base, append_nl=True, bpe2=True)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers,
                                          tie_lm_head=tie)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


def _emb_light_cfg_params(gf, rt):
    """Shared loader for the Embedding/ReRanker-Light towers
    (minicpm.cpp:508-764): bidirectional v1 blocks + LongRoPE factors."""
    fmt = "2i2f32f32f"
    base, extra = BaseConfig.parse(gf, fmt)
    n_kv, orig_max = extra[:2]
    theta, scale_depth = extra[2:4]
    short_f = extra[4:36]
    long_f = extra[36:68]
    max_len = rt.max_length if rt.max_length > 0 else base.max_length
    half = base.hidden_size // base.num_attention_heads // 2
    ff, mscale = _longrope(max_len, orig_max, theta, short_f, long_f, half)
    cfg = build_dense_config(base, num_key_value_heads=n_kv, rope_theta=theta,
                             freq_factors=ff, tie_lm_head=True,
                             max_length=rt.max_length, cache_dtype="float32")
    cfg = replace(cfg, residual_scale=scale_depth, causal=False,
                  rope=replace(cfg.rope, mscale_all=mscale))
    pb = ParamBuilder(gf, rt)
    params = load_llama_family_params(pb, base.num_hidden_layers,
                                      tie_lm_head=True)
    return base, cfg, params, pb


class _MiniCPMEncoderBase(BaseLLM):
    @property
    def engine(self):
        raise TypeError("encoder model: use embed()/qa_rank()")

    def _hidden(self, ids: list[int]):
        """Bidirectional forward, final norm NOT applied (the pooling heads
        own the final RMSNorm)."""
        import jax.numpy as jnp

        from ..nn.transformer import init_cache, transformer_forward

        cfg = self.cfg
        arr = jnp.asarray(np.asarray([ids], np.int32))
        cache = init_cache(cfg, 1, max(len(ids), 8))
        # reuse transformer_forward but strip final norm/logits: run layers
        # manually for clarity
        from ..nn.transformer import decoder_layer, embed_tokens
        from ..ops.rope import precompute_rope_cache

        x = embed_tokens(cfg, self.params, arr)
        pos = jnp.arange(arr.shape[1])[None, :]
        cos, sin = precompute_rope_cache(pos, cfg.rope)
        for i in range(cfg.num_hidden_layers):
            x, *_ = decoder_layer(cfg, cfg.layer_spec(i),
                                  self.params["layers"][i], x, cos, sin,
                                  cache.k[i], cache.v[i], 0)
        return x[0]                                     # [T, H]


@register_model(ModelType.MiniCPM_Embedding_Light)
class MiniCPMEmbeddingLight(_MiniCPMEncoderBase):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, cfg, params, pb = _emb_light_cfg_params(gf, rt)
        tok = _v2_tokenizer(gf, base)
        m = cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)
        return m

    def embed(self, text: str) -> np.ndarray:
        """Position-weighted mean pooling + L2 norm (MiniCPMMeanPooling,
        src/layers.h:2639 / layers.cpp forward)."""
        import jax.numpy as jnp

        from ..ops.norm import rms_norm

        tok = self.tokenizer
        ids = [tok.bos_token_id] + tok.encode(text)[: self.cfg.max_length - 2]
        if getattr(tok, "im_end_token_id", -1) >= 0:
            ids.append(tok.im_end_token_id)
        h = self._hidden(ids)
        h = rms_norm(h, self.params["final_norm"]["w"], eps=self.cfg.norm_eps)
        w = jnp.arange(1, h.shape[0] + 1, dtype=jnp.float32)[:, None]
        pooled = jnp.mean(h.astype(jnp.float32) * w, axis=0)
        pooled = pooled / jnp.maximum(jnp.linalg.norm(pooled), 1e-12)
        return np.asarray(pooled)

    @property
    def embedding_dim(self) -> int:
        return self.cfg.hidden_size


@register_model(ModelType.MiniCPM_ReRanker_Light)
class MiniCPMReRankerLight(_MiniCPMEncoderBase):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, cfg, params, pb = _emb_light_cfg_params(gf, rt)
        params["score"] = pb.linear("score", bias=False)
        tok = _v2_tokenizer(gf, base)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)

    def qa_rank(self, question: str, answer: str) -> float:
        """First-token RMSNorm + score + sigmoid (MiniCPMClassificationHead,
        minicpm.cpp:718-755); ids = bos q eos a (encode_qa :690-714)."""
        import jax.numpy as jnp

        from ..ops.norm import rms_norm
        from ..ops.qmm import matmul

        tok = self.tokenizer
        q_ids = tok.encode(question)
        a_ids = tok.encode(answer)
        budget = self.cfg.max_length - 2
        if len(q_ids) + len(a_ids) > budget:
            remain = budget - len(q_ids)
            assert remain > 0, "query too long"
            a_ids = a_ids[:remain]
        ids = [tok.bos_token_id] + q_ids + [tok.eos_token_id] + a_ids
        h = self._hidden(ids)
        first = rms_norm(h[:1], self.params["final_norm"]["w"],
                         eps=self.cfg.norm_eps)
        score = float(matmul(first, self.params["score"])[0, 0])
        return float(1.0 / (1.0 + np.exp(-score)))
