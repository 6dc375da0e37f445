"""Gemma-4 family (reference: /root/reference/models/gemma4.cpp).

The largest reference model file (3191 LoC): a Gemma-3n-style LLM — per-layer
embeddings (PLE), KV-shared tail layers, mixed SWA/full layers with separate
rope bases, proportional (partial) rotary on full layers, weightless v-norm,
optional k-as-v full attention, per-layer learned output scalars, sandwich
norms, and an optional "cascaded" MoE branch riding next to every dense MLP
(CascadedMLP, gemma4.cpp:1990).  Two arch ids:

 - GEMMA4 (gemma::v4, :1486): the full model with ViT + conformer audio towers.
 - GEMMA4_Unified (gemma::v4_unified, :2825): same LLM, lightweight raw-patch
   vision embedder + raw-PCM audio embedder (the reference's vision projection
   is a stub — project_image returns false, :3095).

Weight-layout facts baked by the reference converter (convert.py:6785-7131):
token embeddings pre-scaled by sqrt(hidden) (tied head compensated by a
1/sqrt(hidden) logit scale inside the final tanh softcap, TanhScaling
:2452), per-layer embedding table pre-scaled by sqrt(dpl), plain RMSNorm
(no 1+w offset, unlike Gemma 1-3), router norm weight `router.scale`
multiplied by 1/sqrt(hidden) at load (Gemma4TextRouter::load :1964).
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from ..nn.transformer import LayerSpec, TransformerConfig
from ..ops.rope import ROPE_NEOX, RopeConfig
from ..runtime.chat import ChatTokenizer
from ..tokenizer.processor import BPEProcessor2
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_moe_experts, register_model)
from .gemma import GemmaEncoder
from .model_types import ModelType

MAX_LAYERS = 128


def make_gemma4_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    """gemma::v4::Tokenizer::load (gemma4.cpp:1556-1584): byte-level BPE with
    a Sequence decoder, new-style turn tokens <|turn> / <turn|>."""
    tp = BPEProcessor2()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tp.set_decoder_type(BPEProcessor2.DECODER_SEQUENCE)
    tp.enable_return_special_token(True)
    tok = ChatTokenizer(tp, GemmaEncoder(), sys_prompt="")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    pad = tp.piece_to_id("<pad>")
    tok.pad_token_id = pad if pad >= 0 else base.pad_token_id
    tok.start_of_turn_token_id = tp.piece_to_id("<|turn>")
    tok.end_of_turn_token_id = tp.piece_to_id("<turn|>")
    for name in ("boa", "eoa", "boi", "eoi", "boc", "eoc",
                 "btc", "etc", "btr", "etr"):
        piece = {"boa": "<|audio>", "eoa": "<audio|>",
                 "boi": "<|image>", "eoi": "<image|>",
                 "boc": "<|channel>", "eoc": "<channel|>",
                 "btc": "<|tool_call>", "etc": "<tool_call|>",
                 "btr": "<|tool_response>", "etr": "<tool_response|>"}[name]
        setattr(tok, name + "_token_id", tp.piece_to_id(piece))
    if tok.end_of_turn_token_id >= 0:
        tok.terminate_ids.add(tok.end_of_turn_token_id)
    tok.is_special_id = lambda i: i in (tok.pad_token_id,
                                        tok.start_of_turn_token_id,
                                        tok.end_of_turn_token_id)
    return tok


@register_model(ModelType.GEMMA4)
class Gemma4(BaseLLM):
    """gemma::v4::LLMConditionalGeneration (gemma4.cpp:2433-2500)."""

    # BaseConfig + 12 ints + layer_is_swa[128] + 4 floats
    # (Gemma4Converter.dump_config, convert.py:6871-6920)
    EXTRA_FMT = f"{12 + MAX_LAYERS}i4f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (k_eq_v, global_head_dim, head_dim, ple_dim, moe_inter, n_experts,
         n_global_kv, n_kv, n_kv_shared, sliding_window, top_k,
         double_wide) = extra[:12]
        layer_is_swa = extra[12:12 + MAX_LAYERS]
        (final_cap, partial_rotary, full_theta, swa_theta) = extra[12 + MAX_LAYERS:]

        L = base.num_hidden_layers
        H = base.hidden_size
        moe_on = n_experts > 0
        hd_full = global_head_dim if global_head_dim > 0 else head_dim
        nkv_full = n_global_kv if (k_eq_v and n_global_kv > 0) else n_kv

        # shared tail layers chain to the LAST non-shared layer of their own
        # attention kind (create_swa_layer / create_layer static
        # last_non_shared, gemma4.cpp:2268-2340)
        first_shared = L - n_kv_shared if n_kv_shared > 0 else L
        last_swa = last_full = -1
        specs = []
        for i in range(L):
            shared = i >= first_shared
            if layer_is_swa[i]:
                specs.append(LayerSpec(
                    sliding_window=sliding_window, local_rope=True,
                    is_moe=moe_on,
                    shared_kv_from=last_swa if shared else -1))
                if not shared:
                    last_swa = i
            else:
                specs.append(LayerSpec(
                    head_dim=hd_full, num_kv_heads=nkv_full,
                    v_from_k=bool(k_eq_v), is_moe=moe_on,
                    shared_kv_from=last_full if shared else -1))
                if not shared:
                    last_full = i

        # proportional rope on full-attn layers: freq factor INF beyond
        # head_dim*partial_rotary_factor → those pairs stay unrotated
        # (fix_proportional_rope, gemma4.cpp:2246-2259)
        half = hd_full // 2
        rot_half = int(hd_full * partial_rotary) // 2
        ffac = tuple(1.0 if j < rot_half else float("inf") for j in range(half))

        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=H,
            num_hidden_layers=L,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv,
            intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            head_dim=head_dim, act="gelu_tanh", norm_eps=1e-6,
            rope=RopeConfig(head_dim=hd_full, freq_base=full_theta,
                            layout=ROPE_NEOX,
                            freq_factors=ffac if rot_half < half else None),
            rope_local=RopeConfig(head_dim=head_dim, freq_base=swa_theta,
                                  layout=ROPE_NEOX),
            attention_scale=1.0,           # attn_scaling_factor = 1.0 (:2326)
            qk_norm="rmsnorm", v_norm=True, post_norms=True,
            layer_specs=tuple(specs), tie_lm_head=True,
            logit_scale=H ** -0.5, final_logit_softcap=final_cap,
            cascaded_moe=moe_on, ple_dim=max(ple_dim, 0),
            moe_num_experts=max(n_experts, 0), moe_top_k=max(top_k, 0),
            cache_dtype=rt.cache_dtype)

        tok = make_gemma4_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = cls._load_llm_params(pb, cfg, specs, moe_on, ple_dim)
        self = cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)
        self.extra_cfg = dict(
            k_eq_v=k_eq_v, n_kv_shared=n_kv_shared,
            double_wide=double_wide, sliding_window=sliding_window)
        self._load_towers(gf, rt)
        return self

    def _load_towers(self, gf, rt):
        from ..nn.gemma4_mm import load_gemma4_vision, load_gemma4_audio
        self.vision = load_gemma4_vision(gf, rt, self.cfg.hidden_size,
                                         (gf.meta or {}))
        self.audio = load_gemma4_audio(gf, rt, self.cfg.hidden_size,
                                       (gf.meta or {}))

    @staticmethod
    def _load_llm_params(pb: ParamBuilder, cfg, specs, moe_on, ple_dim):
        L = cfg.num_hidden_layers
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "layers": [],
        }
        if ple_dim > 0:
            params["ple"] = {
                "embed": pb.embedding("model.embed_tokens_per_layer.weight"),
                "proj": pb.linear("model.per_layer_model_projection"),
                "norm": pb.norm("model.per_layer_projection_norm"),
            }
        for i in range(L):
            pfx = f"model.layers.{i}"
            spec = specs[i]
            attn = {
                "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                "q_norm": pb.norm(f"{pfx}.self_attn.q_norm"),
            }
            if spec.shared_kv_from < 0:
                attn["k"] = pb.linear(f"{pfx}.self_attn.k_proj")
                attn["k_norm"] = pb.norm(f"{pfx}.self_attn.k_norm")
                if not spec.v_from_k:
                    attn["v"] = pb.linear(f"{pfx}.self_attn.v_proj")
            lay = {
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": attn,
                "post_attn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "ffn_norm": pb.norm(f"{pfx}.pre_feedforward_layernorm"),
                "post_ffn_norm": pb.norm(f"{pfx}.post_feedforward_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
                "layer_scalar": jnp.asarray(
                    float(pb.raw_f32(f"{pfx}.layer_scalar").reshape(-1)[0]),
                    jnp.float32),
            }
            if moe_on:
                # router norm weight ("router.scale") is pre-multiplied by
                # 1/sqrt(hidden) at load (Gemma4TextRouter::load,
                # gemma4.cpp:1958-1968)
                rw = pb.raw_f32(f"{pfx}.router.scale") * (cfg.hidden_size ** -0.5)
                lay["moe"] = {
                    "router_norm": {"w": jnp.asarray(rw, jnp.float32)},
                    "router_proj": pb.linear(f"{pfx}.router.proj"),
                    "per_expert_scale": pb.array(f"{pfx}.router.per_expert_scale"),
                    "post1": pb.norm(f"{pfx}.post_feedforward_layernorm_1"),
                    "post2": pb.norm(f"{pfx}.post_feedforward_layernorm_2"),
                    "pre2": pb.norm(f"{pfx}.pre_feedforward_layernorm_2"),
                    "experts": load_moe_experts(pb, f"{pfx}.mlp",
                                                cfg.moe_num_experts),
                }
            if ple_dim > 0:
                lay["ple_gate"] = pb.linear(f"{pfx}.per_layer_input_gate")
                lay["ple_proj"] = pb.linear(f"{pfx}.per_layer_projection")
                lay["ple_norm"] = pb.norm(f"{pfx}.post_per_layer_input_norm")
            params["layers"].append(lay)
        params["layers"] = tuple(params["layers"])
        return params

    # ------------------------------------------------------------------
    def chat_image(self, image, question: str, gen_config=None,
                   streamer=None) -> str:
        """v4 image chat: user turn with \\n\\n<|image>[soft tokens]<image|>\\n\\n
        spliced media embeddings (ChatHistoryEncoder::append_user,
        gemma4.cpp:2777-2822)."""
        assert self.vision is not None, "vision tower not loaded"
        media = self.vision.encode_image(image)
        return self._chat_media(media, "image", question, gen_config, streamer)

    def chat_audio(self, audio_path, question: str = "", gen_config=None,
                   streamer=None) -> str:
        assert self.audio is not None, "audio tower not loaded"
        media = self.audio.encode_audio(audio_path)
        return self._chat_media(media, "audio", question, gen_config, streamer)

    def _chat_media(self, media, kind: str, question: str, gen_config,
                    streamer) -> str:
        from ..nn.transformer import embed_tokens
        from ..runtime.generate import GenerationConfig

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=256)
        tok = self.tokenizer
        b = tok.boi_token_id if kind == "image" else tok.boa_token_id
        e = tok.eoi_token_id if kind == "image" else tok.eoa_token_id
        pre: list[int] = []
        if tok.bos_token_id >= 0:
            pre.append(tok.bos_token_id)
        pre.append(tok.start_of_turn_token_id)
        pre.extend(tok.encode("user\n\n\n"))
        pre.append(b)
        mid: list[int] = [e]
        mid.extend(tok.encode("\n\n" + question))
        mid.append(tok.end_of_turn_token_id)
        mid.extend(tok.encode("\n"))
        mid.append(tok.start_of_turn_token_id)
        mid.extend(tok.encode("model\n"))

        emb_pre = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([pre], np.int32)))[0]
        emb_mid = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([mid], np.int32)))[0]
        embeds = jnp.concatenate(
            [emb_pre, media.astype(emb_pre.dtype), emb_mid], axis=0)[None]
        # per-layer-input ids for media positions are the pad token
        # (run_model ids_for_layer clamp, gemma4.cpp:2623-2629)
        pad = tok.pad_token_id if tok.pad_token_id >= 0 else 0
        ple_ids = np.asarray(
            [pre + [pad] * media.shape[0] + mid], np.int32)

        eng = self.engine
        cache = eng.new_cache(1, eng.max_length)
        logits, cache, n_past = eng.prefill_embeds(
            embeds, cache, 0, ple_ids=jnp.asarray(ple_ids))
        out, cache, n_past = eng.generate_from_logits(
            logits, cache, n_past, gen_config,
            is_terminator=tok.is_terminate_token,
            on_token=(lambda t: streamer.put([t])) if streamer else None)
        if streamer:
            streamer.end()
        return tok.decode(out)


@register_model(ModelType.GEMMA4_Unified)
class Gemma4Unified(Gemma4):
    """gemma::v4_unified (gemma4.cpp:2825-3187): same LLM; audio enters as
    raw PCM chunks through a MultimodalEmbedder (weightless RMSNorm +
    projection); the vision path exists structurally but the reference's
    project_image is a stub (:3095) — matched here (loads, unused)."""

    def _load_towers(self, gf, rt):
        from ..nn.gemma4_mm import load_gemma4_unified_mm
        self.vision, self.audio = load_gemma4_unified_mm(
            gf, rt, self.cfg.hidden_size, (gf.meta or {}))
