"""NeoChat (NEO unified understanding/generation chat model; reference
/root/reference/models/neochat.cpp).

LLM: qwen-v3 config layout (the reference typedefs qwen::v3::Config) with
the Neo attention variant: per-head q/k RMS norms split over the t-half and
hw-half of head_dim ("rmsnorm_halves"), and a 3-D rope — head split
[t: d/2, h: d/4, w: d/4], t rotated with rope_theta, h/w with base 10000
(BaseNeoAttention::split_norm_rope, neochat.cpp:635-679).  Optional
128-expert top-8 MoE layers (layer_is_sparse).  Text tokens take
(t, 0, 0) positions; an image block pins t and uses h = t + row,
w = t + col (before_generate_next_token, neochat.cpp:1165-1218), with
bidirectional attention inside each image span (before_run_model mask,
neochat.cpp:1508-1547).

Vision embedder (understanding path): conv patch embed → GELU → 2-D rope
applied to the embedding vector itself (halves: w then h, ggml::rope_2d
Interleaved mode) → merge_size×merge_size conv downsample to LLM width
(NEOVisionEmbeddings::forward, neochat.cpp:163-195).

The reference's image-GENERATION machinery (mot_gen projections, flow-
matching head) is loaded but never exercised: t2i_gen is a copy of the
token loop, forward() is always called with null image-gen positions, and
the mixed path is `CHATLLM_CHECK(false) << "TODO: mix"` (neochat.cpp:742).
Parity therefore means the understanding path + "/gen"-prefixed prompt
modes producing token output, which is what the reference actually does.
"""
from __future__ import annotations

from dataclasses import replace as _replace
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..nn.transformer import LayerSpec, transformer_forward
from ..ops.norm import rms_norm
from ..ops.qmm import matmul
from ..ops.rope import ROPE_NORMAL, apply_rope
from ..runtime.chat import ChatMLEncoder
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_moe_experts, register_model)
from .llama import build_dense_config
from .model_types import ModelType
from .qwen import make_qwen_tokenizer

IMAGENET_MEAN = [0.485, 0.456, 0.406]
IMAGENET_STD = [0.229, 0.224, 0.225]

SYS_PROMPT_GEN = (
    "You are an image generation and editing assistant that accurately "
    "understands and executes user intent.\n\nYou support two modes:\n\n"
    "1. Think Mode:\nIf the task requires reasoning, you MUST start with a "
    "<think></think> block. Put all reasoning inside the block using plain "
    "text. DO NOT include any image tags. Keep it reasonable and directly "
    "useful for producing the final image.\n\n2. Non-Think Mode:\nIf no "
    "reasoning is needed, directly produce the final image.\n\nTask Types:"
    "\n\nA. Text-to-Image Generation:\n- Generate a high-quality image "
    "based on the user's description.\n- Ensure visual clarity, semantic "
    "consistency, and completeness.\n- DO NOT introduce elements that "
    "contradict or override the user's intent.\n\nB. Image Editing:\n- Use "
    "the provided image(s) as input or reference for modification or "
    "transformation.\n- The result can be an edited image or a new image "
    "based on the reference(s).\n- Preserve all unspecified attributes "
    "unless explicitly changed.\n\nGeneral Rules:\n- For any visible text "
    "in the image, follow the language specified for the rendered text in "
    "the user's description, not the language of the prompt. If no "
    "language is specified, use the user's input language.")


class NeoChatEncoder(ChatMLEncoder):
    """ChatML with the NeoChat think-block opening and "/gen" mode prefix
    (neochat.cpp ChatHistoryEncoder:1637-1703)."""

    think_mode = False
    gen_mode = False

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        s = tok.sys_prompt
        if not s and self.gen_mode:
            s = SYS_PROMPT_GEN
        if s:
            self._tagged("system", s, ids)

    def append_user(self, round_idx, user, ids):
        if user.startswith("/gen "):
            self.gen_mode = True
            user = user[5:]
        else:
            self.gen_mode = False
        if round_idx == 0:
            self.append_sys_prompt(ids)
        self._tagged("user", user, ids)

    def append_ai_opening(self, round_idx, ids):
        tok = self.tokenizer
        ids.append(tok.im_start_token_id)
        ids.extend(tok.encode("assistant\n"))
        if self.think_mode:
            ids.extend(tok.encode("<think>\n"))
        else:
            ids.extend(tok.encode("<think>\n\n</think>\n\n"))
            if self.gen_mode and tok.img_start_token_id >= 0:
                ids.append(tok.img_start_token_id)


# ---------------------------------------------------------------------------
# vision embedder (NEOVisionEmbeddings, neochat.cpp:107-205)
# ---------------------------------------------------------------------------

def neochat_vision_embed(p, pixels, gh: int, gw: int, *, patch: int,
                         merge: int, rope_theta: float, lm_dim: int):
    """pixels [gh*patch, gw*patch, 3] normalized → [gh*gw/m², lm_dim].

    conv → GELU → 2-D rope on the embedding vector (first half rotated by
    the column index, second half by the row index, adjacent-pair layout —
    ggml::rope_2d with mode Interleaved, layers.cpp:1023) → merge-kernel
    conv downsample."""
    k = jnp.transpose(jnp.asarray(p["patch_w"]), (2, 3, 1, 0))     # HWIO
    x = jax.lax.conv_general_dilated(
        pixels[None].astype(jnp.float32), k.astype(jnp.float32),
        window_strides=(patch, patch), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    H = x.shape[-1]
    x = x.reshape(gh * gw, H) + p["patch_b"][None, :]
    x = jax.nn.gelu(x, approximate=True)                  # ggml ActFunc::GELU

    half = H // 2
    pw = jnp.tile(jnp.arange(gw, dtype=jnp.int32), gh)
    ph = jnp.repeat(jnp.arange(gh, dtype=jnp.int32), gw)

    def tab(pos):
        inv = jnp.power(jnp.float32(rope_theta),
                        -2.0 * jnp.arange(half // 2, dtype=jnp.float32) / half)
        th = pos.astype(jnp.float32)[:, None] * inv
        return jnp.cos(th), jnp.sin(th)

    cw, sw = tab(pw)
    ch, sh = tab(ph)
    xa = apply_rope(x[None, :, None, :half], cw[None], sw[None],
                    layout=ROPE_NORMAL)[0, :, 0]
    xb = apply_rope(x[None, :, None, half:], ch[None], sh[None],
                    layout=ROPE_NORMAL)[0, :, 0]
    x = jnp.concatenate([xa, xb], axis=-1)

    grid = x.reshape(1, gh, gw, H)
    dk = jnp.transpose(jnp.asarray(p["dense_w"]), (2, 3, 1, 0))
    y = jax.lax.conv_general_dilated(
        grid.astype(jnp.float32), dk.astype(jnp.float32),
        window_strides=(merge, merge), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    y = y + p["dense_b"]
    return y.reshape(-1, lm_dim)


@register_model(ModelType.NEOCHAT)
class NeoChat(BaseLLM):
    # Config layout = qwen v3 (neochat.cpp `typedef qwen::v3::Config Config`)
    EXTRA_FMT = "2iff" + "i" * 6 + "i" + "128i"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, head_dim, rope_theta, yarn_factor, yarn_orig,
         sparse_step, moe_inter, n_active, n_experts, norm_topk,
         tie_flag) = extra[:11]
        layer_is_sparse = extra[11:]
        tie = bool(tie_flag)

        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, head_dim=head_dim,
            rope_theta=rope_theta, rope_layout="neo3d", tie_lm_head=tie,
            norm_eps=1e-6, qk_norm="rmsnorm_halves",
            max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        any_sparse = n_experts > 0 and any(
            layer_is_sparse[: base.num_hidden_layers])
        if any_sparse:
            cfg = _replace(
                cfg,
                layer_specs=tuple(LayerSpec(is_moe=bool(layer_is_sparse[i]))
                                  for i in range(base.num_hidden_layers)),
                moe_num_experts=n_experts, moe_top_k=n_active,
                moe_norm_topk_prob=bool(norm_topk))

        tok = make_qwen_tokenizer(gf, base)
        tok.chat_encoder = NeoChatEncoder()
        tok.chat_encoder.tokenizer = tok
        tok.sys_prompt = ""
        tok.img_context_token_id = tok.tp.piece_to_id("<IMG_CONTEXT>")
        tok.img_start_token_id = tok.tp.piece_to_id("<img>")
        tok.img_end_token_id = tok.tp.piece_to_id("</img>")

        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "layers": [],
        }
        if not tie:
            params["lm_head"] = pb.linear("lm_head")
        for i in range(base.num_hidden_layers):
            pfx = f"model.layers.{i}"
            attn = {
                "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                "q_norm": pb.norm(f"{pfx}.self_attn.q_norm"),
                "q_norm_hw": pb.norm(f"{pfx}.self_attn.q_norm_hw"),
                "k_norm": pb.norm(f"{pfx}.self_attn.k_norm"),
                "k_norm_hw": pb.norm(f"{pfx}.self_attn.k_norm_hw"),
            }
            if any_sparse and layer_is_sparse[i]:
                mlp = {"gate": pb.linear(f"{pfx}.mlp.gate"),
                       "experts": load_moe_experts(pb, f"{pfx}.mlp",
                                                   n_experts)}
            else:
                mlp = {"gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                       "up": pb.linear(f"{pfx}.mlp.up_proj"),
                       "down": pb.linear(f"{pfx}.mlp.down_proj")}
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": attn,
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": mlp,
            })
        params["layers"] = tuple(params["layers"])
        self = cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)

        cfg_json = (gf.meta or {}).get("config.json", {})
        vis = cfg_json.get("vision_config", {})
        self.vis_params = None
        self.vis_cfg = None
        if vis and gf.has_tensor("vision.embeddings.patch_embedding.weight"):
            # Real checkpoints carry hidden_size / downsample_ratio /
            # rope_theta_vision (reference models/neochat.cpp:305-314 reads
            # them without defaults); derive/default missing keys so minimal
            # configs still load: hidden_size and patch_size come from the
            # patch-embedding conv weight [H, 3, p, p].
            pw_shape = gf.tensor_shape(
                "vision.embeddings.patch_embedding.weight")
            self.vis_cfg = {
                "hidden_size": int(vis.get("hidden_size", pw_shape[0])),
                "patch_size": int(vis.get("patch_size", pw_shape[-1])),
                "merge_size": int(round(
                    1 / float(vis.get("downsample_ratio", 0.5)))),
                "rope_theta": float(vis.get("rope_theta_vision", 10000.0)),
            }
            self.vis_params = {
                "patch_w": pb.raw_f32("vision.embeddings.patch_embedding.weight"),
                "patch_b": pb.array("vision.embeddings.patch_embedding.bias"),
                "dense_w": pb.raw_f32("vision.embeddings.dense_embedding.weight"),
                "dense_b": pb.array("vision.embeddings.dense_embedding.bias"),
            }
        self.image_mean = IMAGENET_MEAN
        self.image_std = IMAGENET_STD
        self._mm_prefill = None
        return self

    # ------------------------------------------------------------------
    def encode_image(self, img):
        """PIL image → (embeddings [n_merged, lm_hidden], merged grid)."""
        assert self.vis_params is not None, "vision embedder not loaded"
        vc = self.vis_cfg
        unit = vc["patch_size"] * vc["merge_size"]
        w, h = img.size
        pw = max(unit, (w + unit - 1) // unit * unit)
        ph = max(unit, (h + unit - 1) // unit * unit)
        canvas = np.zeros((ph, pw, 3), np.float32)
        canvas[:h, :w] = np.asarray(img.convert("RGB"), np.float32) / 255.0
        canvas = (canvas - np.asarray(self.image_mean, np.float32)) \
            / np.asarray(self.image_std, np.float32)
        gh, gw = ph // vc["patch_size"], pw // vc["patch_size"]
        emb = neochat_vision_embed(
            self.vis_params, jnp.asarray(canvas), gh, gw,
            patch=vc["patch_size"], merge=vc["merge_size"],
            rope_theta=vc["rope_theta"], lm_dim=self.cfg.hidden_size)
        m = vc["merge_size"]
        return emb, (gh // m, gw // m)

    def _mm_prefill_fn(self, T: int):
        """Jitted multimodal prefill: full explicit mask (causal + the
        bidirectional image span) replaces the causal mask — the reference
        builds exactly this f16 mask in before_run_model."""
        if self._mm_prefill is not None and self._mm_prefill[0] == T:
            return self._mm_prefill[1]
        cfg = _replace(self.cfg, causal=False)

        @jax.jit
        def fwd(params, cache, embeds, positions, mask_extra):
            logits, cache = transformer_forward(
                cfg, params, None, cache, 0, input_embeds=embeds,
                positions=positions, mask_extra=mask_extra, last_only=True)
            return logits[:, 0, :], cache

        self._mm_prefill = (T, fwd)
        return fwd

    def chat_image(self, image, question: str = "", gen_config=None,
                   streamer=None) -> str:
        """One-shot VQA: ChatML user turn with <img>[embeds]</img>,
        3-D (t, t+h, t+w) positions pinned over the image span and
        bidirectional attention inside it."""
        from ..nn.transformer import embed_tokens
        from ..runtime.generate import GenerationConfig
        from ..runtime.vision import load_image

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=256)
        media, (gh, gw) = self.encode_image(load_image(image))
        n_img = gh * gw

        tok = self.tokenizer
        pre: list[int] = []
        pre.append(tok.im_start_token_id)
        pre.extend(tok.encode("user\n"))
        pre.append(tok.img_start_token_id)
        mid: list[int] = [tok.img_end_token_id]
        mid.extend(tok.encode(question))
        mid.append(tok.im_end_token_id)
        mid.extend(tok.encode("\n"))
        tok.chat_encoder.gen_mode = False
        tok.chat_encoder.append_ai_opening(0, mid)

        emb_pre = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([pre], np.int32)))[0]
        emb_mid = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([mid], np.int32)))[0]
        embeds = jnp.concatenate(
            [emb_pre, media.astype(emb_pre.dtype), emb_mid], axis=0)[None]
        T = embeds.shape[1]

        # 3-D positions (before_generate_next_token, neochat.cpp:1165-1218)
        a, b = len(pre), len(pre) + n_img
        p_t = np.zeros(T, np.int32)
        p_h = np.zeros(T, np.int32)
        p_w = np.zeros(T, np.int32)
        p_t[:a] = np.arange(a)
        t0 = a
        p_t[a:b] = t0
        p_h[a:b] = t0 + np.repeat(np.arange(gh), gw)
        p_w[a:b] = t0 + np.tile(np.arange(gw), gh)
        p_t[b:] = np.arange(t0 + 1, t0 + 1 + (T - b))
        t_next = t0 + 1 + (T - b)
        positions = jnp.asarray(np.stack([p_t, p_h, p_w])[:, None, :])

        # causal + bidirectional image span (before_run_model mask)
        eng = self.engine
        cache = eng.new_cache(1, eng.max_length)
        q = np.arange(T)
        mask = np.where(q[None, :] <= q[:, None], 0.0, -1e30).astype(np.float32)
        mask[a:b, a:b] = 0.0
        # pad to the cache length; unwritten slots are already masked by the
        # engine's validity check
        S = cache.k[0].shape[1]
        mask = np.pad(mask, ((0, 0), (0, S - T)))
        mask_extra = jnp.asarray(mask)[None]
        fn = self._mm_prefill_fn(T)
        logits, cache = fn(self.params, cache, embeds, positions, mask_extra)
        n_past = T
        eng.pos_delta = t_next - n_past
        try:
            out, cache, n_past = eng.generate_from_logits(
                logits, cache, n_past, gen_config,
                is_terminator=tok.is_terminate_token,
                on_token=(lambda t: streamer.put([t])) if streamer else None)
        finally:
            eng.pos_delta = 0
        if streamer:
            streamer.end()
        return tok.decode(out)
