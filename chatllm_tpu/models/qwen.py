"""Qwen family (reference: /root/reference/models/qwen.{h,cpp}).

Qwen uses the NeoX (half-split) rope lane layout — the converter does not
permute q/k (no `pp` override in QWen2Converter, /root/reference/convert.py:4788).
"""
from __future__ import annotations

import numpy as np
import jax

from ..nn.transformer import TransformerConfig
from ..ops.rope import ROPE_NEOX, RopeConfig
from ..runtime.chat import ChatMLEncoder, ChatTokenizer
from ..tokenizer.processor import BPEProcessor2
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .llama import build_dense_config
from .model_types import ModelType

# models/qwen.cpp v1 do_load regex
QWEN_REGEX = [
    r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+",
]


def make_qwen_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    """models/qwen.cpp v1 Tokenizer::load."""
    tp = BPEProcessor2(QWEN_REGEX)
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tp.enable_return_special_token(True)
    tok = ChatTokenizer(tp, ChatMLEncoder(), sys_prompt="You are a helpful assistant.")
    eot = tp.piece_to_id("<|endoftext|>")
    tok.pad_token_id = tok.eos_token_id = tok.bos_token_id = eot
    tok.im_start_token_id = tp.piece_to_id("<|im_start|>")
    tok.im_end_token_id = tp.piece_to_id("<|im_end|>")
    tok.nl_token_id = tp.encode("\n")[0]
    if tok.im_end_token_id >= 0:
        tok.terminate_ids.add(tok.im_end_token_id)
    tok.is_special_id = lambda i: i in (tok.pad_token_id, tok.im_start_token_id, tok.im_end_token_id)
    return tok


# qwen.cpp ds_r1_distill::Tokenizer::load regex (qwen.cpp:840); the llama
# distill variant (llama.cpp:630) groups digits {1,3}
DS_R1_REGEX = [
    r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+",
]
DS_R1_LLAMA_REGEX = [
    r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+",
]


from ..runtime.chat import HistoryEncoder  # noqa: E402


class DeepSeekR1Encoder(HistoryEncoder):
    """[bos]{sys}  <｜User｜>{user}  <｜Assistant｜>{ai}[eos]
    (reference qwen.cpp ds_r1_distill ChatHistoryEncoder:866-896,
    llama.cpp ds_r1_distill:657-690)."""

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        if tok.sys_prompt:
            ids.extend(tok.encode(tok.sys_prompt))

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        ids.append(tok.user_token_id)
        ids.extend(tok.encode(user))

    def append_ai(self, round_idx, ai, ids):
        tok = self.tokenizer
        ids.append(tok.assistant_token_id)
        ids.extend(tok.encode(ai))
        ids.append(tok.eos_token_id)

    def append_ai_opening(self, round_idx, ids):
        ids.append(self.tokenizer.assistant_token_id)


def make_ds_r1_tokenizer(gf, base: BaseConfig, *, llama=False) -> ChatTokenizer:
    tp = BPEProcessor2(DS_R1_LLAMA_REGEX if llama else DS_R1_REGEX)
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tp.enable_return_special_token(True)
    tok = ChatTokenizer(tp, DeepSeekR1Encoder(), sys_prompt="")
    tok.user_token_id = tp.piece_to_id("<｜User｜>")
    tok.assistant_token_id = tp.piece_to_id("<｜Assistant｜>")
    tok.bos_token_id = tp.piece_to_id("<｜begin▁of▁sentence｜>")
    tok.eos_token_id = tp.piece_to_id("<｜end▁of▁sentence｜>")
    nl = tp.encode("\n")
    tok.nl_token_id = nl[0] if len(nl) == 1 else -1
    tok.is_special_id = lambda i: i in (tok.user_token_id,
                                        tok.assistant_token_id,
                                        tok.bos_token_id, tok.eos_token_id)
    return tok


@register_model(ModelType.QWEN2, ModelType.QWEN2TIE, ModelType.MARCO_O1,
                ModelType.QWQ, ModelType.READERLM2)
class Qwen2(BaseLLM):
    # Config: BaseConfig + {num_key_value_heads, sliding_window} + rope_theta
    # (models/qwen.h:76-81)
    EXTRA_FMT = "2if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, sliding_window, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        tie = not gf.has_tensor("lm_head.weight")
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            rope_layout=ROPE_NEOX, tie_lm_head=tie, norm_eps=1e-6,
            qkv_bias=True, max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        tok = make_qwen_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers, tie_lm_head=tie)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.DEEPSEEK_R1_DISTILL_QWEN)
class Qwen2DSR1Distill(BaseLLM):
    """DeepSeek-R1-Distill-Qwen: qwen v2 arch + explicit tie flag + the
    DeepSeek chat template (qwen.h:330-335 Config{v2 + int tie},
    qwen.cpp ds_r1_distill:821-901)."""
    EXTRA_FMT = "2ifi"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, _sw, rope_theta, tie_flag) = BaseConfig.parse(
            gf, cls.EXTRA_FMT)
        tie = bool(tie_flag)
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            rope_layout=ROPE_NEOX, tie_lm_head=tie, norm_eps=1e-6,
            qkv_bias=True, max_length=rt.max_length,
            cache_dtype=rt.cache_dtype)
        tok = make_ds_r1_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers,
                                          tie_lm_head=tie)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


from .base import load_moe_experts


@register_model(ModelType.QWEN2MoE)
class Qwen2MoE(BaseLLM):
    # BaseConfig + {n_kv, moe_intermediate, shared_expert_intermediate,
    # sliding_window, n_active, n_experts, norm_topk} + rope_theta
    # (models/qwen.h:121-131)
    EXTRA_FMT = "7if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from dataclasses import replace as _replace

        from ..nn.transformer import LayerSpec

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, moe_inter, shared_inter, sliding_window, n_active, n_experts,
         norm_topk, rope_theta) = extra
        n_layers = base.num_hidden_layers
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            rope_layout=ROPE_NEOX, norm_eps=1e-6, qkv_bias=True,
            max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        specs = tuple(LayerSpec(is_moe=True) for _ in range(n_layers))
        cfg = _replace(cfg, layer_specs=specs, moe_num_experts=n_experts,
                       moe_top_k=n_active, moe_norm_topk_prob=bool(norm_topk))
        tok = make_qwen_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "lm_head": pb.linear("lm_head"),
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
                    "experts": load_moe_experts(pb, f"{pfx}.mlp", n_experts),
                    "shared": {
                        "gate": pb.linear(f"{pfx}.mlp.shared_expert.gate_proj"),
                        "up": pb.linear(f"{pfx}.mlp.shared_expert.up_proj"),
                        "down": pb.linear(f"{pfx}.mlp.shared_expert.down_proj"),
                    },
                    "shared_gate": pb.linear(f"{pfx}.mlp.shared_expert_gate"),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.QWEN3, ModelType.DEEPSEEK_R1_DISTILL_QWEN3)
class Qwen3(BaseLLM):
    # models/qwen.h:746-760 v3 Config: BaseConfig + {num_key_value_heads,
    # head_dim, rope_theta:f, yarn_factor:f, yarn_orig, decoder_sparse_step,
    # moe_intermediate_size, num_experts_per_tok, num_experts,
    # norm_topk_prob, tie_word_embeddings, layer_is_sparse[128]}
    EXTRA_FMT = "2iff" + "i" * 6 + "i" + "128i"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, head_dim, rope_theta, yarn_factor, yarn_orig,
         sparse_step, moe_inter, n_active, n_experts, norm_topk, tie_flag) = extra[:11]
        layer_is_sparse = extra[11:]
        tie = bool(tie_flag)
        from ..nn.transformer import LayerSpec
        from dataclasses import replace as _replace

        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, head_dim=head_dim,
            rope_theta=rope_theta, rope_layout=ROPE_NEOX, tie_lm_head=tie,
            norm_eps=1e-6, qk_norm="rmsnorm", max_length=rt.max_length,
            cache_dtype=rt.cache_dtype)
        any_sparse = n_experts > 0 and any(layer_is_sparse[: base.num_hidden_layers])
        if any_sparse:
            specs = tuple(LayerSpec(is_moe=bool(layer_is_sparse[i]))
                          for i in range(base.num_hidden_layers))
            cfg = _replace(cfg, layer_specs=specs, moe_num_experts=n_experts,
                           moe_top_k=n_active, moe_norm_topk_prob=bool(norm_topk))
        if yarn_factor > 0 and yarn_orig > 0:
            cfg = _replace(cfg, rope=_replace(
                cfg.rope, freq_scale=1.0 / yarn_factor, ext_factor=1.0,
                orig_ctx=yarn_orig))

        if gf.model_type == int(ModelType.DEEPSEEK_R1_DISTILL_QWEN3):
            # ds_r1_distill_v3 reuses the v3 Config but swaps in the
            # DeepSeek tokenizer/template (qwen.h:797-808)
            tok = make_ds_r1_tokenizer(gf, base)
        else:
            tok = make_qwen_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "layers": [],
        }
        for i in range(base.num_hidden_layers):
            pfx = f"model.layers.{i}"
            attn = {
                "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                "q_norm": pb.norm(f"{pfx}.self_attn.q_norm"),
                "k_norm": pb.norm(f"{pfx}.self_attn.k_norm"),
            }
            if any_sparse and layer_is_sparse[i]:
                mlp = {
                    "gate": pb.linear(f"{pfx}.mlp.gate"),
                    "experts": load_moe_experts(pb, f"{pfx}.mlp", n_experts),
                }
            else:
                mlp = {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                }
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": attn,
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": mlp,
            })
        params["layers"] = tuple(params["layers"])
        if not tie:
            params["lm_head"] = pb.linear("lm_head")
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.QWEN)
class Qwen1(BaseLLM):
    """Qwen v1 (models/qwen.cpp namespace qwen::v1): GPT-style weight names,
    dynamic-NTK rope + optional logn attention (flags bits 0/1)."""
    EXTRA_FMT = "3if"   # seq_length, rope_dim, flags, rotary_emb_base
    #                     (QWenConverter.dump_config, convert.py:4742)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from dataclasses import replace as _replace

        from ..ops.rope import RopeConfig

        base, (seq_length, rope_dim, flags, rope_base) = BaseConfig.parse(
            gf, cls.EXTRA_FMT)
        from .llama import build_dense_config

        cfg = build_dense_config(base, rope_theta=rope_base,
                                 rope_layout=ROPE_NEOX, qkv_bias=True,
                                 norm_eps=1e-6, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = _replace(
            cfg,
            rope=_replace(cfg.rope, rot_dim=rope_dim,
                          ntk_dynamic=bool(flags & 1), orig_ctx=seq_length),
            logn_attn_seq=seq_length if (flags & 2) else 0)
        tok = make_qwen_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("transformer.wte.weight"),
            "final_norm": pb.norm("transformer.ln_f"),
            "lm_head": pb.linear("lm_head"),
            "layers": [],
        }
        for i in range(base.num_hidden_layers):
            pfx = f"transformer.h.{i}"
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.ln_1"),
                "attn": {
                    "q": pb.linear(f"{pfx}.attn.q_proj"),
                    "k": pb.linear(f"{pfx}.attn.k_proj"),
                    "v": pb.linear(f"{pfx}.attn.v_proj"),
                    "o": pb.linear(f"{pfx}.attn.c_proj"),
                },
                "ffn_norm": pb.norm(f"{pfx}.ln_2"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.w2"),
                    "up": pb.linear(f"{pfx}.mlp.w1"),
                    "down": pb.linear(f"{pfx}.mlp.c_proj"),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


class _Qwen3EncoderMixin:
    """Causal qwen3 tower driven as an encoder: cache-disabled single
    forward (reference PreludeCacheDisable + EmbeddingLastTokenFinalSteps /
    v3_ranker::FinalSteps, models/qwen.cpp:2014-2110)."""

    task = "Given a web search query, retrieve relevant passages that answer the query"

    def set_additional_args(self, args: dict):
        self.task = args.get("task", self.task)

    def _last_hidden(self, ids):
        import jax.numpy as jnp

        from ..nn.transformer import (decoder_layer, embed_tokens, init_cache)
        from ..ops.rope import precompute_rope_cache

        cfg = self.cfg
        arr = jnp.asarray(np.asarray([ids], np.int32))
        cache = init_cache(cfg, 1, max(len(ids), 8))
        x = embed_tokens(cfg, self.params, arr)
        pos = jnp.arange(arr.shape[1])[None, :]
        cos, sin = precompute_rope_cache(pos, cfg.rope)
        for i in range(cfg.num_hidden_layers):
            x, *_ = decoder_layer(cfg, cfg.layer_spec(i),
                                  self.params["layers"][i], x, cos, sin,
                                  cache.k[i], cache.v[i], 0)
        return x[0, -1:]                                # [1, H]


@register_model(ModelType.QWEN3_Embedding)
class Qwen3Embedding(_Qwen3EncoderMixin, Qwen3):
    """Last-token embedding + L2 norm (EmbeddingLastTokenFinalSteps,
    src/models.cpp:1807-1815); query prompt 'Instruct: {task}\\nQuery:{text}'
    (models/qwen.cpp v3_emb::Tokenizer::encode_embedding)."""

    @property
    def engine(self):
        raise TypeError("encoder model: use embed()/qa_rank()")

    @property
    def embedding_dim(self) -> int:
        return self.cfg.hidden_size

    def embed(self, text: str, purpose: str = "doc") -> np.ndarray:
        import jax.numpy as jnp

        from ..ops.norm import rms_norm

        tok = self.tokenizer
        if purpose == "query":
            text = f"Instruct: {self.task}\nQuery:{text}"
        ids = tok.encode(text)[: self.cfg.max_length - 1]
        ids.append(tok.eos_token_id)
        h = self._last_hidden(ids)
        h = rms_norm(h, self.params["final_norm"]["w"], eps=self.cfg.norm_eps)
        v = h[0].astype(jnp.float32)
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        return np.asarray(v)


@register_model(ModelType.QWEN3_ReRanker)
class Qwen3ReRanker(_Qwen3EncoderMixin, Qwen3):
    """score = P('yes' | yes/no logits of the last token)
    (models/qwen.cpp v3_ranker::FinalSteps::forward)."""

    @property
    def engine(self):
        raise TypeError("encoder model: use embed()/qa_rank()")

    def qa_rank(self, question: str, answer: str) -> float:
        import jax.numpy as jnp

        from ..nn.transformer import lm_logits
        from ..ops.norm import rms_norm

        tok = self.tokenizer
        yes_id = tok.tp.piece_to_id("yes")
        no_id = tok.tp.piece_to_id("no")
        text = (
            '<|im_start|>system\nJudge whether the Document meets the '
            'requirements based on the Query and the Instruct provided. '
            'Note that the answer can only be "yes" or "no".<|im_end|>\n'
            "<|im_start|>user\n"
            f"<Instruct>: {self.task}\n<Query>: {question}\n"
            f"<Document>: {answer}"
            "<|im_end|>\n<|im_start|>assistant\n<think>\n\n</think>\n\n")
        ids = tok.encode(text)[-self.cfg.max_length:]
        h = self._last_hidden(ids)
        h = rms_norm(h, self.params["final_norm"]["w"], eps=self.cfg.norm_eps)
        logits = lm_logits(self.cfg, self.params, h[None])
        two = jnp.stack([logits[0, 0, yes_id], logits[0, 0, no_id]])
        p = jax.nn.softmax(two.astype(jnp.float32))
        return float(p[0])
