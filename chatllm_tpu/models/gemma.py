"""Gemma family (reference: /root/reference/models/gemma.{h,cpp}).

The converter pre-bakes Gemma quirks (GemmaConverter.pp,
/root/reference/convert.py:6501): embeddings ×sqrt(hidden), norm weights
stored as 1+w, q/k permuted to interleaved rope — so loading is llama-like
with gated-GELU MLPs.
"""
from __future__ import annotations

from dataclasses import replace

from ..nn.transformer import LayerSpec, TransformerConfig
from ..ops.rope import ROPE_NORMAL, RopeConfig
from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor1
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .model_types import ModelType


class GemmaEncoder(HistoryEncoder):
    """<start_of_turn>user\\n...<end_of_turn>\\n (models/gemma.cpp v1)."""

    def _turn(self, role, text, ids, close=True):
        tok = self.tokenizer
        ids.append(tok.start_of_turn_token_id)
        ids.extend(tok.encode(f"{role}\n{text}" if text else f"{role}\n"))
        if close:
            ids.append(tok.end_of_turn_token_id)
            ids.extend(tok.encode("\n"))

    def append_sys_prompt(self, ids):
        if self.tokenizer.bos_token_id >= 0:
            ids.append(self.tokenizer.bos_token_id)

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        sys = tok.sys_prompt
        text = f"{sys}\n\n{user}" if sys and round_idx == 0 else user
        self._turn("user", text, ids)

    def append_ai(self, round_idx, ai, ids):
        self._turn("model", ai, ids)

    def append_ai_opening(self, round_idx, ids):
        self._turn("model", "", ids, close=False)


def make_gemma_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    tp = BPEProcessor1()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, GemmaEncoder(), sys_prompt="")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    pad = tp.piece_to_id("<pad>")
    tok.pad_token_id = pad if pad >= 0 else base.pad_token_id
    tok.start_of_turn_token_id = tp.piece_to_id("<start_of_turn>")
    tok.end_of_turn_token_id = tp.piece_to_id("<end_of_turn>")
    tok.terminate_ids.add(tok.end_of_turn_token_id)
    tok.is_special_id = lambda i: i in (tok.pad_token_id, tok.start_of_turn_token_id,
                                        tok.end_of_turn_token_id)
    return tok


@register_model(ModelType.GEMMA)
class Gemma(BaseLLM):
    # BaseConfig + {num_key_value_heads, head_dim} + rope_theta
    # (models/gemma.h:9-14)
    EXTRA_FMT = "2if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, head_dim, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv, intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            head_dim=head_dim, act="gelu_tanh", norm_eps=1e-6,
            rope=RopeConfig(head_dim=head_dim, freq_base=rope_theta,
                            layout=ROPE_NORMAL),
            tie_lm_head=True,
            # the converter bakes ×sqrt(H) into the embedding (input path);
            # the tied unembedding must not carry it
            logit_scale=base.hidden_size ** -0.5,
            cache_dtype=rt.cache_dtype)
        tok = make_gemma_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers, tie_lm_head=True)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.GEMMA3)
class Gemma3(BaseLLM):
    """Gemma3 text (models/gemma.h:255-266): qk-norm (weights 1+w folded by
    the converter), 5:1 local/global SWA pattern with separate rope bases,
    sandwich norms; no softcaps.  No q/k permutation → NeoX rope."""

    # BaseConfig + {n_kv, head_dim, query_pre_attn_scalar, sliding_window,
    # sliding_window_pattern} + {rope_local_base, rope_theta, rope_factor}
    EXTRA_FMT = "5i3f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..ops.rope import ROPE_NEOX

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, head_dim, query_pre_attn_scalar, sliding_window, swa_pattern,
         rope_local_base, rope_theta, rope_factor) = extra
        n_layers = base.num_hidden_layers
        # ((layer+1) % pattern) != 0 → sliding (models/gemma.cpp:833)
        specs = tuple(
            LayerSpec(sliding_window=sliding_window, local_rope=True)
            if ((i + 1) % max(swa_pattern, 1)) != 0 else LayerSpec()
            for i in range(n_layers))
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=n_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv, intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            head_dim=head_dim, act="gelu_tanh", norm_eps=1e-6,
            rope=RopeConfig(head_dim=head_dim, freq_base=rope_theta,
                            freq_scale=1.0 / rope_factor if rope_factor > 0 else 1.0,
                            layout=ROPE_NEOX),
            rope_local=RopeConfig(head_dim=head_dim, freq_base=rope_local_base,
                                  layout=ROPE_NEOX),
            attention_scale=float(query_pre_attn_scalar) ** -0.5,
            qk_norm="rmsnorm", post_norms=True, layer_specs=specs,
            tie_lm_head=True, logit_scale=base.hidden_size ** -0.5,
            cache_dtype=rt.cache_dtype)
        tok = make_gemma_tokenizer(gf, base)
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
                    "q_norm": pb.norm(f"{pfx}.self_attn.q_norm"),
                    "k_norm": pb.norm(f"{pfx}.self_attn.k_norm"),
                },
                "post_attn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "ffn_norm": pb.norm(f"{pfx}.pre_feedforward_layernorm"),
                "post_ffn_norm": pb.norm(f"{pfx}.post_feedforward_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.GEMMA2)
class Gemma2(BaseLLM):
    # BaseConfig + {n_kv, head_dim, query_pre_attn_scalar, sliding_window}
    # + {rope_theta, final_softcap, attn_softcap} (models/gemma.h:59-69)
    EXTRA_FMT = "4i3f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, head_dim, query_pre_attn_scalar, sliding_window,
         rope_theta, final_softcap, attn_softcap) = extra
        n_layers = base.num_hidden_layers
        # EVEN layers use SWA (HF Gemma2Config.layer_types: sliding at
        # layer_idx % 2 == 0 — the reference's is_sliding `layer_id % 2`,
        # models/gemma.h:123, has the parity inverted; HF is ground truth)
        specs = tuple(LayerSpec(sliding_window=sliding_window if (i % 2 == 0) else 0)
                      for i in range(n_layers))
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=n_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv, intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            head_dim=head_dim, act="gelu_tanh", norm_eps=1e-6,
            rope=RopeConfig(head_dim=head_dim, freq_base=rope_theta,
                            layout=ROPE_NORMAL),
            attention_scale=float(query_pre_attn_scalar) ** -0.5,
            logit_softcap=attn_softcap, final_logit_softcap=final_softcap,
            post_norms=True, layer_specs=specs, tie_lm_head=True,
            logit_scale=base.hidden_size ** -0.5,
            cache_dtype=rt.cache_dtype)
        tok = make_gemma_tokenizer(gf, base)
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
                "post_attn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "ffn_norm": pb.norm(f"{pfx}.pre_feedforward_layernorm"),
                "post_ffn_norm": pb.norm(f"{pfx}.post_feedforward_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.GEMMA3Vis)
class Gemma3Vis(Gemma3):
    """Gemma-3 multimodal (reference models/gemma.cpp siglip namespace:246 +
    v3 ChatHistoryEncoder::append_image:846).

    SigLIP tower ("vision_model.encoder.layers.*" with converter-renamed
    input/post_attention layernorms) → avg-pool the patch grid down to
    mm_tokens_per_image → Gemma RMSNorm (`mm_soft_emb_norm`, weight stored
    1+w by the converter) → no-bias `mm_input_projection` (stored transposed
    = [vision_hidden, lm_hidden]).  Images enter the prompt as
    \\n\\n<start_of_image>[soft tokens]<end_of_image>\\n\\n."""

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        self = super().load(gf, rt)
        from ..nn.vit import ViTConfig

        tok = self.tokenizer
        tok.boi_token_id = tok.tp.piece_to_id("<start_of_image>")
        tok.eoi_token_id = tok.tp.piece_to_id("<end_of_image>")

        cfg_json = (gf.meta or {}).get("config.json", {})
        vis = cfg_json.get("vision_config", {})
        self.vis_cfg = None
        self.vis_params = None
        if vis and gf.has_tensor("vision_model.embeddings.patch_embedding.weight"):
            self.mm_tokens_per_image = int(cfg_json.get("mm_tokens_per_image", 256))
            self.vis_cfg = ViTConfig(
                hidden_size=int(vis["hidden_size"]),
                num_hidden_layers=int(vis["num_hidden_layers"]),
                num_attention_heads=int(vis.get("num_attention_heads", 16)),
                intermediate_size=int(vis["intermediate_size"]),
                patch_size=int(vis["patch_size"]),
                image_size=int(vis.get("image_size", 896)),
                act="gelu_tanh", cls_token=False, layer_scale=False,
                norm_eps=float(vis.get("layer_norm_eps", 1e-6)))
            pp = (gf.meta or {}).get("preprocessor_config.json", {})
            self.image_mean = pp.get("image_mean", [0.5, 0.5, 0.5])
            self.image_std = pp.get("image_std", [0.5, 0.5, 0.5])
            pb = ParamBuilder(gf, rt)
            self.vis_params = _load_gemma3_vit_params(pb, self.vis_cfg)
        return self

    # ------------------------------------------------------------------
    def encode_images(self, images) -> "jnp.ndarray":
        """images [N, S, S, 3] normalized → [N * mm_tokens, lm_hidden]
        (gemma.cpp MultiModalProjector::forward:289: pool → norm → proj)."""
        import jax.numpy as jnp
        import numpy as np

        from ..nn.vit import vit_forward
        from ..ops.norm import rms_norm

        cfg = self.vis_cfg
        x = vit_forward(cfg, self.vis_params, jnp.asarray(images))
        N, P, H = x.shape
        g = cfg.grid
        ts = int(round(self.mm_tokens_per_image ** 0.5))
        k = g // ts
        x = x.reshape(N, ts, k, ts, k, H).mean(axis=(2, 4))    # avg_pool_2d
        x = x.reshape(N, ts * ts, H)
        # converter stores 1+w, so no offset here
        x = rms_norm(x, self.vis_params["soft_emb_norm"]["w"],
                     eps=cfg.norm_eps, offset=0.0)
        x = jnp.dot(x.astype(jnp.float32),
                    self.vis_params["mm_input_projection"],
                    preferred_element_type=jnp.float32)
        return x.reshape(N * ts * ts, -1)

    def image_token_count(self) -> int:
        return self.mm_tokens_per_image

    def chat_image(self, image, question: str, gen_config=None,
                   streamer=None) -> str:
        import numpy as np
        import jax.numpy as jnp

        from ..nn.transformer import embed_tokens
        from ..runtime.generate import GenerationConfig
        from ..runtime.vision import load_image, to_array

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=256)
        px = to_array(load_image(image), self.vis_cfg.image_size,
                      self.image_mean, self.image_std)
        media = self.encode_images(px[None])

        tok = self.tokenizer
        enc = tok.chat_encoder
        pre: list[int] = []
        enc.append_sys_prompt(pre)
        # user turn opening (gemma template) then the image block
        enc.append_user_opening(0, pre)
        nl = tok.encode("\n")
        pre.extend(nl); pre.extend(nl)
        pre.append(tok.boi_token_id)
        mid: list[int] = [tok.eoi_token_id]
        mid.extend(nl); mid.extend(nl)
        mid.extend(tok.encode(question))
        enc_ids: list[int] = []
        enc.append_ai_opening(0, enc_ids)
        mid.extend(enc_ids)

        emb_pre = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([pre], np.int32)))[0]
        emb_mid = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([mid], np.int32)))[0]
        # gemma scales token embeddings by sqrt(hidden); image embeddings
        # enter unscaled (reference writes them raw into the extended table,
        # then forward scales — HF Gemma3 get_image_features is unscaled and
        # scaling applies to token ids only, so splice after scaling)
        embeds = jnp.concatenate(
            [emb_pre, media.astype(emb_pre.dtype), emb_mid], axis=0)[None]

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


def _load_gemma3_vit_params(pb: ParamBuilder, vcfg) -> dict:
    """On-disk names per Gemma3Converter (/root/reference/convert.py:6630-6660:
    layer_norm1/2 → input/post_attention_layernorm, fc1/fc2 → fc0/fc1,
    out_proj → o_proj; mm_input_projection stored already-transposed)."""
    import numpy as np
    import jax.numpy as jnp

    params = {
        "embed": {
            "proj_w": jnp.asarray(np.transpose(
                pb.raw_f32("vision_model.embeddings.patch_embedding.weight"),
                (2, 3, 1, 0))),
            "proj_b": pb.array("vision_model.embeddings.patch_embedding.bias"),
            "pos": pb.array("vision_model.embeddings.position_embedding.weight"),
        },
        "post_norm": {"w": pb.array("vision_model.post_layernorm.weight"),
                      "b": pb.array("vision_model.post_layernorm.bias")},
        "soft_emb_norm": {
            "w": pb.array("multi_modal_projector.mm_soft_emb_norm.weight")},
        "mm_input_projection": pb.array(
            "multi_modal_projector.mm_input_projection.weight"),
        "layers": [],
    }
    for i in range(vcfg.num_hidden_layers):
        pfx = f"vision_model.encoder.layers.{i}"
        params["layers"].append({
            "norm1": pb.norm(f"{pfx}.input_layernorm", bias=True),
            "attn": {
                "q": pb.linear(f"{pfx}.self_attn.q_proj", bias=True),
                "k": pb.linear(f"{pfx}.self_attn.k_proj", bias=True),
                "v": pb.linear(f"{pfx}.self_attn.v_proj", bias=True),
                "o": pb.linear(f"{pfx}.self_attn.o_proj", bias=True),
            },
            "norm2": pb.norm(f"{pfx}.post_attention_layernorm", bias=True),
            "mlp": {"fc0": pb.linear(f"{pfx}.mlp.fc0", bias=True),
                    "fc1": pb.linear(f"{pfx}.mlp.fc1", bias=True)},
        })
    return params
