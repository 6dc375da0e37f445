"""Mistral family (reference: /root/reference/models/mistral.{h,cpp}).

q/k permuted to interleaved rope at conversion (MistralConverter.pp,
/root/reference/convert.py:2866).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor1
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .llama import build_dense_config
from .model_types import ModelType


class MistralEncoder(HistoryEncoder):
    """[INST] ... [/INST] (models/mistral.cpp ChatHistoryEncoder; simplified
    v3/v7 tool tags handled as plain text)."""

    def append_sys_prompt(self, ids):
        if self.tokenizer.bos_token_id >= 0:
            ids.append(self.tokenizer.bos_token_id)

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        sys = tok.sys_prompt
        if sys and round_idx == 0:
            ids.extend(tok.encode(f"[INST] {sys}\n{user} [/INST]"))
        else:
            ids.extend(tok.encode(f"[INST] {user} [/INST]"))

    def append_ai(self, round_idx, ai, ids):
        tok = self.tokenizer
        ids.extend(tok.encode(ai))
        ids.append(tok.eos_token_id)

    def append_ai_opening(self, round_idx, ids):
        pass


def make_mistral_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    tp = BPEProcessor1()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, MistralEncoder(), sys_prompt="")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.pad_token_id = base.pad_token_id
    return tok


@register_model(ModelType.MISTRAL)
class Mistral(BaseLLM):
    # BaseConfig + {num_key_value_heads, sliding_window} + rope_theta
    # (models/mistral.h:5-10)
    EXTRA_FMT = "2if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, sliding_window, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            sliding_window=max(0, sliding_window), norm_eps=1e-6,
            max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        tok = make_mistral_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.MIXTRAL, ModelType.WIZARDLM2_MOE)
class Mixtral(BaseLLM):
    # mistral config + {num_experts_per_tok, num_local_experts}
    # (models/mistral.h:45-49); experts named block_sparse_moe.experts.{j}.w1/w2/w3
    EXTRA_FMT = "2if2i"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from dataclasses import replace

        from ..nn.transformer import LayerSpec
        from .base import load_moe_experts

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        n_kv, sliding_window, rope_theta, n_active, n_experts = extra
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            sliding_window=max(0, sliding_window),
            max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        sw = max(0, sliding_window)
        specs = tuple(LayerSpec(sliding_window=sw, is_moe=True)
                      for _ in range(base.num_hidden_layers))
        cfg = replace(cfg, layer_specs=specs, moe_num_experts=n_experts,
                      moe_top_k=n_active, moe_norm_topk_prob=True)
        tok = make_mistral_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "lm_head": pb.linear("lm_head"),
            "layers": [],
        }
        for i in range(base.num_hidden_layers):
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
                    "gate": pb.linear(f"{pfx}.block_sparse_moe.gate"),
                    "experts": load_moe_experts(
                        pb, f"{pfx}.block_sparse_moe", n_experts,
                        names=("w1", "w3", "w2")),  # w1=gate, w3=up, w2=down
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


def make_mistral2_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    """Tekken (BPE2) vocab + [INST] template (mistral2::Tokenizer,
    models/mistral.cpp:259-283)."""
    from ..tokenizer.processor import BPEProcessor2

    tp = BPEProcessor2()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tp.enable_return_special_token(True)
    tok = ChatTokenizer(tp, MistralEncoder(), sys_prompt="")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.pad_token_id = base.pad_token_id
    return tok


@register_model(ModelType.MISTRAL2)
class Mistral2(BaseLLM):
    """Mistral-v3-tokenizer models (tekken BPE2, custom head_dim)
    (models/mistral.h:151-176)."""
    EXTRA_FMT = "3if"   # n_kv, head_dim, sliding_window, rope_theta

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, head_dim, sliding_window, rope_theta) = BaseConfig.parse(
            gf, cls.EXTRA_FMT)
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, head_dim=head_dim,
            rope_theta=rope_theta, sliding_window=max(0, sliding_window),
            norm_eps=1e-6, max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        tok = make_mistral2_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


def _yarn_mscale(scale: float, mscale: float = 1.0) -> float:
    import math

    if scale <= 1.0:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


@register_model(ModelType.MISTRAL3)
class Mistral3(BaseLLM):
    """Ministral-3 / Mistral-Small-3.1: YaRN + llama-4-style per-position
    attention scaling (models/mistral.cpp mistral3:722-1010) + the pixtral
    vision tower (nn/pixtral_vit.py, HF-golden); [THINK] decodes as <think>.

    Disk names are mistral-style: .attn. / .attention_norm. / .ffn_norm.
    (the reference loads via add_tensor_name_translations)."""
    # {n_kv, sliding_window, tie, head_dim} 4i + {beta_fast, beta_slow,
    # factor, llama_4_scaling_beta, mscale, mscale_all_dim} 6f + orig_max i
    # + rope_theta f
    EXTRA_FMT = "4i6fif"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from dataclasses import replace

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        n_kv, sliding_window, tie_flag, head_dim = extra[:4]
        (beta_fast, beta_slow, factor, l4_beta, mscale,
         mscale_all) = extra[4:10]
        orig_max = extra[10]
        rope_theta = extra[11]
        tie = bool(tie_flag)
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, head_dim=head_dim,
            rope_theta=rope_theta, sliding_window=max(0, sliding_window),
            norm_eps=1e-6, tie_lm_head=tie, max_length=rt.max_length,
            cache_dtype=rt.cache_dtype)
        if orig_max > 0:
            # reference mistral3 ctor:901-926 — YaRN with corrected mscale
            # (the net cos/sin scale after ggml's internal (1+0.1 ln f)
            # multiplier equals yarn_get_mscale(f, mscale) /
            # yarn_get_mscale(f, mscale_all)), and the score scale gets
            # mscale_all^2
            m = (_yarn_mscale(factor, mscale) / _yarn_mscale(factor, mscale_all)
                 / (1.0 + 0.1 * __import__("math").log(max(factor, 1.0))))
            attn_scale = (head_dim ** -0.5) * _yarn_mscale(factor, mscale_all) ** 2
            cfg = replace(
                cfg, attention_scale=attn_scale,
                rope=replace(cfg.rope, freq_scale=1.0 / factor,
                             ext_factor=1.0, attn_factor=m,
                             beta_fast=beta_fast, beta_slow=beta_slow,
                             orig_ctx=orig_max))
        if l4_beta > 0 and orig_max > 0:
            cfg = replace(cfg, attn_scale_beta=l4_beta,
                          attn_scale_orig=orig_max)
        tok = make_mistral2_tokenizer(gf, base)
        ts = tok.tp.piece_to_id("[THINK]")
        te = tok.tp.piece_to_id("[/THINK]")
        if ts >= 0:
            tok.tp.override_token_decoding(ts, "<think>")
            tok.tp.override_token_decoding(te, "</think>")
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "layers": [],
        }
        for i in range(base.num_hidden_layers):
            pfx = f"model.layers.{i}"
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.attention_norm"),
                "attn": {
                    "q": pb.linear(f"{pfx}.attn.q_proj"),
                    "k": pb.linear(f"{pfx}.attn.k_proj"),
                    "v": pb.linear(f"{pfx}.attn.v_proj"),
                    "o": pb.linear(f"{pfx}.attn.o_proj"),
                },
                "ffn_norm": pb.norm(f"{pfx}.ffn_norm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
            })
        params["layers"] = tuple(params["layers"])
        if not tie:
            params["lm_head"] = pb.linear("lm_head")
        self = cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)

        # pixtral tower (reference mistral.cpp pixtral:306-640)
        cfg_json = (gf.meta or {}).get("config.json", {})
        vis = cfg_json.get("vision_config", {})
        self.vis_cfg = None
        self.vis_params = None
        if vis and gf.has_tensor("vision_model.patch_conv.weight"):
            from ..nn.pixtral_vit import (PixtralViTConfig,
                                          load_pixtral_vit_params)

            self.vis_cfg = PixtralViTConfig(
                hidden_size=int(vis["hidden_size"]),
                num_hidden_layers=int(vis["num_hidden_layers"]),
                num_attention_heads=int(vis["num_attention_heads"]),
                intermediate_size=int(vis["intermediate_size"]),
                patch_size=int(vis.get("patch_size", 16)),
                head_dim=int(vis.get("head_dim") or
                             vis["hidden_size"] // vis["num_attention_heads"]),
                rope_theta=float(vis.get("rope_theta", 10000.0)),
                spatial_merge_size=int(cfg_json.get("spatial_merge_size", 2)),
                norm_eps=1e-5)
            self.vis_params = load_pixtral_vit_params(pb, self.vis_cfg)
            self.vis_params["projector"]["norm_eps"] = float(
                cfg_json.get("text_config", {}).get("rms_norm_eps", 1e-5))
            pp = (gf.meta or {}).get("processor_config.json", {})
            self.image_mean = pp.get("image_mean",
                                     [0.48145466, 0.4578275, 0.40821073])
            self.image_std = pp.get("image_std",
                                    [0.26862954, 0.26130258, 0.27577711])
        return self

    # ------------------------------------------------------------------
    def encode_image(self, img) -> tuple:
        """PIL image → (projected embeddings [n, lm_hidden],
        merged grid (gh/m, gw/m)) — single-tile pixtral path."""
        from ..nn.pixtral_vit import pixtral_vit_forward
        from ..runtime.vision import load_image

        assert self.vis_cfg is not None, "pixtral tower not loaded"
        vc = self.vis_cfg
        img = load_image(img)
        unit = vc.patch_size * vc.spatial_merge_size
        w, h = img.size
        scale = min(1.0, 1540.0 / max(w, h))
        nw = max(unit, int(round(w * scale / unit)) * unit)
        nh = max(unit, int(round(h * scale / unit)) * unit)
        img = img.resize((nw, nh))
        arr = (np.asarray(img.convert("RGB"), np.float32) / 255.0
               - np.asarray(self.image_mean, np.float32)) \
            / np.asarray(self.image_std, np.float32)
        emb = pixtral_vit_forward(vc, self.vis_params, jnp.asarray(arr))
        m = vc.spatial_merge_size
        return emb, (nh // vc.patch_size // m, nw // vc.patch_size // m)

    def chat_image(self, image, question: str, gen_config=None,
                   streamer=None) -> str:
        """[INST][IMG]…[IMG_BREAK]…[IMG_END]{q}[/INST] one-shot VQA
        (reference mistral.cpp pixtral ChatHistoryEncoder)."""
        from ..nn.transformer import embed_tokens
        from ..runtime.generate import GenerationConfig

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=256)
        media, (gh, gw) = self.encode_image(image)
        tok = self.tokenizer
        img_id = tok.tp.piece_to_id("[IMG]")
        brk_id = tok.tp.piece_to_id("[IMG_BREAK]")
        end_id = tok.tp.piece_to_id("[IMG_END]")

        pre = [tok.bos_token_id]
        pre.extend(tok.encode("[INST]"))
        # the media embeddings REPLACE the [IMG] slots row by row; breaks
        # and the end marker stay as real tokens
        order = []
        for r in range(gh):
            order.extend(range(r * gw, (r + 1) * gw))
        mid: list[int] = []
        mid.extend(tok.encode(question))
        mid.extend(tok.encode("[/INST]"))

        emb_pre = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([pre], np.int32)))[0]
        emb_mid = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([mid], np.int32)))[0]
        rows = []
        brk = embed_tokens(self.cfg, self.params,
                           jnp.asarray([[brk_id]], np.int32))[0]
        endv = embed_tokens(self.cfg, self.params,
                            jnp.asarray([[end_id]], np.int32))[0]
        for r in range(gh):
            rows.append(media[r * gw:(r + 1) * gw])
            rows.append(brk if r + 1 < gh else endv)
        embeds = jnp.concatenate([emb_pre] + rows + [emb_mid],
                                 axis=0)[None].astype(emb_pre.dtype)

        eng = self.engine
        cache = eng.new_cache(1, eng.max_length)
        logits, cache, n_past = eng.prefill_embeds(embeds, cache, 0)
        out, cache, n_past = eng.generate_from_logits(
            logits, cache, n_past, gen_config,
            is_terminator=tok.is_terminate_token,
            on_token=(lambda t: streamer.put([t])) if streamer else None)
        if streamer:
            streamer.end()
        return tok.decode(out)
