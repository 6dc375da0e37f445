"""Adept Persimmon-8B and Fuyu-8B (reference /root/reference/models/adept.cpp).

Persimmon (adept::persimmon): LayerNorm(+bias) pre-norm blocks, biased
q/k/v/o, per-head qk LayerNorm with bias (PersimmonSelfAttention,
src/layers.h:3184), partial rotary (`rope_dim`), relu² MLP with bias
(PersimmonMLP src/layers.h:3194), Unigram tokenizer, " human:" / "adept:"
template (adept.cpp:98-110).

Fuyu (adept::fuyu): the same LM; images enter as raw patch rows through ONE
linear (`vision_embed_tokens`, adept.cpp:200-215) — no conv tower — with a
|NEWLINE| token after each patch row (adept.cpp append_user(Content)).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn.transformer import TransformerConfig
from ..ops.rope import ROPE_NEOX, RopeConfig
from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import UnigramProcessor
from .base import BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig, register_model
from .model_types import ModelType


class AdeptEncoder(HistoryEncoder):
    """adept.cpp persimmon::ChatHistoryEncoder: bos + " human: ..\n\n",
    bos + "adept: " + ai + "\n\n" + eos."""

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        ids.extend(tok.encode(f" human: {user}\n\n"))

    def append_ai(self, round_idx, ai, ids):
        tok = self.tokenizer
        self.append_ai_opening(round_idx, ids)
        ids.extend(tok.encode(ai + "\n\n"))
        ids.append(tok.eos_token_id)

    def append_ai_opening(self, round_idx, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        ids.extend(tok.encode("adept: "))


def _persimmon_config(base, n_kv, rope_dim, rope_theta, rt):
    return TransformerConfig(
        vocab_size=base.vocab_size, hidden_size=base.hidden_size,
        num_hidden_layers=base.num_hidden_layers,
        num_attention_heads=base.num_attention_heads,
        num_key_value_heads=n_kv,
        intermediate_size=base.intermediate_size,
        max_length=min(base.max_length, rt.max_length) if rt.max_length > 0
        else base.max_length,
        act="relu2", norm_type="layernorm", qk_norm="layernorm",
        rope=RopeConfig(head_dim=base.hidden_size // base.num_attention_heads,
                        freq_base=rope_theta, layout=ROPE_NEOX,
                        rot_dim=rope_dim),
        norm_eps=1e-5, cache_dtype=rt.cache_dtype)


def _persimmon_tokenizer(gf, base):
    tp = UnigramProcessor(0)
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, AdeptEncoder(), sys_prompt="")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.pad_token_id = base.pad_token_id
    if tok.bos_token_id == tok.eos_token_id:
        tok.bos_token_id = 1   # adept.cpp Tokenizer::load:66
    return tok


def load_persimmon_params(pb: ParamBuilder, n_layers: int) -> dict:
    """On-disk names per PersimmonConverter (/root/reference/convert.py:6257;
    fused query_key_value split at convert time, name translations
    adept.cpp:141-152 reversed)."""
    params = {
        "embed": pb.embedding("model.embed_tokens.weight"),
        "final_norm": pb.norm("model.final_layernorm", bias=True),
        "lm_head": pb.linear("lm_head"),
        "layers": [],
    }
    for i in range(n_layers):
        pfx = f"model.layers.{i}"
        params["layers"].append({
            "attn_norm": pb.norm(f"{pfx}.input_layernorm", bias=True),
            "attn": {
                "q": pb.linear(f"{pfx}.self_attn.q_proj", bias=True),
                "k": pb.linear(f"{pfx}.self_attn.k_proj", bias=True),
                "v": pb.linear(f"{pfx}.self_attn.v_proj", bias=True),
                "o": pb.linear(f"{pfx}.self_attn.dense", bias=True),
                "q_norm": pb.norm(f"{pfx}.self_attn.q_layernorm", bias=True),
                "k_norm": pb.norm(f"{pfx}.self_attn.k_layernorm", bias=True),
            },
            "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm", bias=True),
            "mlp": {
                "up": pb.linear(f"{pfx}.mlp.dense_h_to_4h", bias=True),
                "down": pb.linear(f"{pfx}.mlp.dense_4h_to_h", bias=True),
            },
        })
    params["layers"] = tuple(params["layers"])
    return params


@register_model(ModelType.PERSIMMON)
class Persimmon(BaseLLM):
    EXTRA_FMT = "2if"    # n_kv, rope_dim, rope_theta

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_dim, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = _persimmon_config(base, n_kv, rope_dim, rope_theta, rt)
        tok = _persimmon_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_persimmon_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)


@register_model(ModelType.FUYU)
class Fuyu(BaseLLM):
    EXTRA_FMT = "2ifi"   # n_kv, rope_dim, rope_theta, patch_size

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_dim, rope_theta, patch) = BaseConfig.parse(
            gf, cls.EXTRA_FMT)
        cfg = _persimmon_config(base, n_kv, rope_dim, rope_theta, rt)
        tok = _persimmon_tokenizer(gf, base)
        tok.image_newline_id = tok.tp.piece_to_id("|NEWLINE|")
        pb = ParamBuilder(gf, rt)
        params = load_persimmon_params(pb, base.num_hidden_layers)
        self = cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)
        self.patch_size = patch
        self.vision_embed = (pb.linear("vision_embed_tokens", bias=True)
                             if gf.has_tensor("vision_embed_tokens.weight")
                             else None)
        pp = (gf.meta or {}).get("preprocessor_config.json", {})
        self.target_width = int(pp.get("target_width", 1920))
        self.target_height = int(pp.get("target_height", 1080))
        return self

    # ------------------------------------------------------------------
    def encode_image(self, img_array: np.ndarray):
        """[H, W, 3] normalized pixels → patch embeddings [rows, cols, H_lm].
        Patch rows are raster order; each patch flattens as (y, x, c) —
        HF FuyuImageProcessor.patchify_image is ground truth (unfold +
        permute(0,2,3,4,1)); reference analog adept.cpp:288."""
        assert self.vision_embed is not None, "vision embedding not loaded"
        p = self.patch_size
        H, W, _ = img_array.shape
        gh, gw = H // p, W // p
        x = img_array[: gh * p, : gw * p]
        x = x.reshape(gh, p, gw, p, 3)
        x = np.transpose(x, (0, 2, 1, 3, 4)).reshape(gh * gw, p * p * 3)
        from ..ops.qmm import matmul

        emb = matmul(jnp.asarray(x, jnp.float32), self.vision_embed)
        return emb.reshape(gh, gw, -1)

    def chat_image(self, image, question: str, gen_config=None,
                   streamer=None) -> str:
        """Fuyu prompt: [patch rows, |NEWLINE| after each row] then
        bos + question + \\n + bos + beginning-of-answer (adept.cpp
        fuyu::ChatHistoryEncoder::append_user(Content))."""
        from ..nn.transformer import embed_tokens
        from ..runtime.generate import GenerationConfig
        from ..runtime.vision import load_image

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=256)
        img = load_image(image)
        # scale down to fit the target box, never up (HF FuyuImageProcessor)
        scale = min(1.0, self.target_width / img.width,
                    self.target_height / img.height)
        if scale < 1.0:
            img = img.resize((int(img.width * scale), int(img.height * scale)))
        arr = (np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5
        grid = self.encode_image(arr)                     # [gh, gw, H]
        gh, gw, Hd = grid.shape

        tok = self.tokenizer
        nl = embed_tokens(self.cfg, self.params,
                          jnp.asarray([[tok.image_newline_id]], np.int32))[0]
        rows = []
        for r in range(gh):
            rows.append(grid[r])
            if tok.image_newline_id >= 0:
                rows.append(nl.astype(grid.dtype))
        media = jnp.concatenate(rows, axis=0)

        mid: list[int] = [tok.bos_token_id]
        mid.extend(tok.encode(f" human: {question}\n\n"))
        mid.append(tok.bos_token_id)
        mid.extend(tok.encode("adept: "))
        emb_mid = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([mid], np.int32)))[0]
        embeds = jnp.concatenate([media.astype(emb_mid.dtype), emb_mid],
                                 axis=0)[None]

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
