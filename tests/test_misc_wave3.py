"""Zoo wave 3: Solar-Pro (SWA + bskcn layer forwarding), Llama-2-Plus
(ChatML auto-switch), GLM-MoE-Lite, Hunyuan-V3, Youtu (dense MLA golden)."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model
from test_model_golden import _bpe_pieces, _permute

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")

V = 260


def _sp_pieces(extra=()):
    toks = [(chr(b).encode(), -float(b)) for b in range(V - len(extra))]
    toks += [(s.encode(), -900.0 - i) for i, s in enumerate(extra)]
    return toks


def _bpe_with_specials(specials):
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    pieces = [byte_level_encode(bytes([b])) for b in range(256)]
    pieces += [s.encode() for s in specials]
    pieces += [f"<fill{i}>".encode() for i in range(V - len(pieces))]
    return [(p, 1) for p in pieces]


def _write_solar(path, sd, *, layers, window, pairs, alpha, heads=4, n_kv=2):
    MAXP = 20
    fwd = [0] * (2 * MAXP)
    for i, (a, b) in enumerate(pairs):
        fwd[2 * i], fwd[2 * i + 1] = a, b
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.SOLARPRO), 1, meta={})
        vals = [int(GGMLType.F32), V, 64, heads, layers, 96, 128,
                1, 2, -1, -1, n_kv, window - 1, len(pairs)] + fwd
        w.write_config(vals, fmt=f"{len(vals)}i")
        f.write(struct.pack("<2f", 10000.0, alpha))
        w._patch_offset(12)
        w.write_vocab_sp(_sp_pieces(["<|im_start|>", "<|im_end|>"]))
        w.write_tensor("model.embed_tokens.weight",
                       sd["model.embed_tokens.weight"], GGMLType.F32)
        for i in range(layers):
            pfx = f"model.layers.{i}"
            w.write_tensor(f"{pfx}.input_layernorm.weight",
                           sd[f"{pfx}.input_layernorm.weight"], GGMLType.F32)
            for pj, nh in (("q_proj", heads), ("k_proj", n_kv),
                           ("v_proj", 0), ("o_proj", 0)):
                arr = sd[f"{pfx}.self_attn.{pj}.weight"]
                if nh:
                    arr = _permute(arr, nh)
                w.write_tensor(f"{pfx}.self_attn.{pj}.weight", arr, GGMLType.F32)
            w.write_tensor(f"{pfx}.post_attention_layernorm.weight",
                           sd[f"{pfx}.post_attention_layernorm.weight"], GGMLType.F32)
            for mj in ("gate_proj", "up_proj", "down_proj"):
                w.write_tensor(f"{pfx}.mlp.{mj}.weight",
                               sd[f"{pfx}.mlp.{mj}.weight"], GGMLType.F32)
        w.write_tensor("model.norm.weight", sd["model.norm.weight"], GGMLType.F32)
        w.write_tensor("lm_head.weight", sd["lm_head.weight"], GGMLType.F32)


def _solar_hf(layers=3, window=8):
    torch.manual_seed(21)
    cfg = transformers.MistralConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=layers, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        sliding_window=window, tie_word_embeddings=False)
    return transformers.MistralForCausalLM(cfg).eval()


def test_solarpro_golden_swa_no_pairs(tmp_path):
    """Solar-Pro with pairs_num=0 is llama+SWA — golden vs HF Mistral
    (same SWA semantics), window smaller than the prompt."""
    hf = _solar_hf(layers=3, window=8)
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "solar.bin")
    _write_solar(path, sd, layers=3, window=8, pairs=(), alpha=0.3)
    model = load_model(path, RuntimeConfig(**RT32))
    ids = np.arange(1, 17, dtype=np.int32)[None, :]   # T=16 > window
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits[0].numpy()
    # 1e-2: HF Mistral-sdpa accumulation noise on random tiny models reaches
    # ~7e-3; the window-masking check below is the semantic assertion
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=1e-2, rtol=1e-2)

    tok = model.tokenizer
    out = []
    tok.sys_prompt = "s"
    tok.chat_encoder.append_sys_prompt(out)
    tok.chat_encoder.append_user(0, "hi", out)
    tok.chat_encoder.append_ai_opening(0, out)
    text = tok.tp.decode(out)
    assert "<|im_start|>user\nhi<|im_end|>" in text
    assert text.endswith("assistant\n")


def test_solarpro_layer_forwarding(tmp_path):
    """bskcn blend: alpha=1 routes layer src's output directly into layer
    dst (equivalent to dropping the layers in between); alpha=0 is a
    no-op (solar.cpp init_layer_fowarding; HF bskcn_tv semantics)."""
    hf = _solar_hf(layers=3, window=64)
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    p_none = str(tmp_path / "s0.bin")
    p_a0 = str(tmp_path / "sa0.bin")
    p_a1 = str(tmp_path / "sa1.bin")
    _write_solar(p_none, sd, layers=3, window=64, pairs=(), alpha=0.0)
    _write_solar(p_a0, sd, layers=3, window=64, pairs=((0, 2),), alpha=0.0)
    _write_solar(p_a1, sd, layers=3, window=64, pairs=((0, 2),), alpha=1.0)
    ids = np.array([[5, 9, 23, 7, 100]], dtype=np.int32)

    base = load_model(p_none, RuntimeConfig(**RT32))
    l_none, _ = base.forward_logits(ids)
    l_a0, _ = load_model(p_a0, RuntimeConfig(**RT32)).forward_logits(ids)
    np.testing.assert_allclose(np.asarray(l_a0), np.asarray(l_none),
                               atol=1e-5, rtol=1e-5)

    l_a1, _ = load_model(p_a1, RuntimeConfig(**RT32)).forward_logits(ids)
    # alpha=1: layer 1's contribution to the residual stream is dropped —
    # same logits as running only layers 0 and 2 (layer_spec "0,2")
    skip = load_model(p_none, RuntimeConfig(layer_spec="0,2", **RT32))
    l_skip, _ = skip.forward_logits(ids)
    np.testing.assert_allclose(np.asarray(l_a1), np.asarray(l_skip),
                               atol=1e-5, rtol=1e-5)
    assert not np.allclose(np.asarray(l_a1), np.asarray(l_none), atol=1e-3)


def _write_llama2plus(path, sd, layers, meta):
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.LLAMA2PLUS), 1, meta=meta)
        vals = [int(GGMLType.F32), V, 64, 4, layers, 96, 128, 1, 2, -1, -1, 2]
        w.write_config(vals, fmt=f"{len(vals)}i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        w.write_vocab_sp(_sp_pieces(["<|im_start|>", "<|im_end|>"]))
        w.write_tensor("model.embed_tokens.weight",
                       sd["model.embed_tokens.weight"], GGMLType.F32)
        for i in range(layers):
            pfx = f"model.layers.{i}"
            w.write_tensor(f"{pfx}.input_layernorm.weight",
                           sd[f"{pfx}.input_layernorm.weight"], GGMLType.F32)
            for pj, nh in (("q_proj", 4), ("k_proj", 2), ("v_proj", 0), ("o_proj", 0)):
                arr = sd[f"{pfx}.self_attn.{pj}.weight"]
                if nh:
                    arr = _permute(arr, nh)
                w.write_tensor(f"{pfx}.self_attn.{pj}.weight", arr, GGMLType.F32)
            w.write_tensor(f"{pfx}.post_attention_layernorm.weight",
                           sd[f"{pfx}.post_attention_layernorm.weight"], GGMLType.F32)
            for mj in ("gate_proj", "up_proj", "down_proj"):
                w.write_tensor(f"{pfx}.mlp.{mj}.weight",
                               sd[f"{pfx}.mlp.{mj}.weight"], GGMLType.F32)
        w.write_tensor("model.norm.weight", sd["model.norm.weight"], GGMLType.F32)
        w.write_tensor("lm_head.weight", sd["lm_head.weight"], GGMLType.F32)


def test_llama2plus_chatml_switch(tmp_path):
    torch.manual_seed(22)
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    # ChatML template in the HF tokenizer config -> ChatML encoder
    p1 = str(tmp_path / "l2p_im.bin")
    _write_llama2plus(p1, sd, 2, meta={
        "model_name": "Nanbeige-Plus",
        "tokenizer_config.json": {
            "chat_template": "{{'<|im_start|>' + role}}"}})
    model = load_model(p1, RuntimeConfig(**RT32))
    ids = np.array([[3, 50, 99, 7]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=5e-3, rtol=5e-3)
    tok = model.tokenizer
    assert tok.sys_prompt.startswith("你是南北阁")
    out = []
    tok.chat_encoder.append_user(0, "hi", out)
    assert out[0] == tok.im_start_token_id

    # no ChatML markers -> llama-2 [INST] template
    p2 = str(tmp_path / "l2p.bin")
    _write_llama2plus(p2, sd, 2, meta={"model_name": "x"})
    tok2 = load_model(p2, RuntimeConfig(**RT32)).tokenizer
    out2 = []
    tok2.chat_encoder.append_user(0, "hi", out2)
    assert "[INST]" in tok2.tp.decode(out2)


def test_glm_moe_lite_forward_and_template(tmp_path):
    """MLA+sigmoid-MoE arch reused from DeepSeek (parity-tested there);
    checks config parse, gate-bias load, GLM template with </think> ai
    prefix (chatglm.cpp glm::moe_lite)."""
    rng = np.random.default_rng(23)
    hidden, heads, layers, inter = 64, 4, 2, 96
    kv_rank, nope, rope_d, v_dim = 32, 16, 8, 16
    n_routed, top_k = 4, 2
    path = str(tmp_path / "gml.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.GLM_MOE_LITE), 1, meta={})
        vals = [int(GGMLType.F32), V, hidden, heads, layers, inter, 128,
                -1, 0, -1, -1,
                heads, 1, kv_rank, 32, 1, 1, n_routed, 1, 1, top_k,
                nope, rope_d, 128, v_dim]
        w.write_config(vals, fmt=f"{len(vals)}i")
        f.write(struct.pack("<7f", 32.0, 1.0, 1.0, 1.0, 1.0, 10000.0, 2.5))
        f.write(struct.pack("<2i", 0, 1))   # q_lora_rank, topk_group
        w._patch_offset(12)
        w.write_vocab_bpe(_bpe_with_specials(
            ["<|endoftext|>", "[MASK]", "[gMASK]", "[sMASK]", "<sop>",
             "<eop>", "<|system|>", "<|user|>", "<|assistant|>",
             "<|observation|>"]), [])

        def t(name, arr):
            w.write_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

        t("model.embed_tokens.weight", rng.standard_normal((V, hidden)) * 0.05)
        t("model.norm.weight", np.ones(hidden))
        t("lm_head.weight", rng.standard_normal((V, hidden)) * 0.05)
        for i in range(layers):
            pfx = f"model.layers.{i}"
            t(f"{pfx}.input_layernorm.weight", np.ones(hidden))
            t(f"{pfx}.post_attention_layernorm.weight", np.ones(hidden))
            t(f"{pfx}.self_attn.q_proj.weight",
              rng.standard_normal((heads * (nope + rope_d), hidden)) * 0.05)
            t(f"{pfx}.self_attn.d_kv_proj.weight",
              rng.standard_normal((kv_rank, hidden)) * 0.05)
            t(f"{pfx}.self_attn.k_pe_proj.weight",
              rng.standard_normal((rope_d, hidden)) * 0.05)
            t(f"{pfx}.self_attn.kv_norm.weight", np.ones(kv_rank))
            t(f"{pfx}.self_attn.u_k_nope_proj.weight",
              rng.standard_normal((heads * nope, kv_rank)) * 0.05)
            t(f"{pfx}.self_attn.u_v_proj.weight",
              rng.standard_normal((heads * v_dim, kv_rank)) * 0.05)
            t(f"{pfx}.self_attn.o_proj.weight",
              rng.standard_normal((hidden, heads * v_dim)) * 0.05)
            if i >= 1:
                t(f"{pfx}.mlp.gate.weight",
                  rng.standard_normal((n_routed, hidden)) * 0.05)
                t(f"{pfx}.mlp.gate.e_score_correction_bias",
                  rng.standard_normal(n_routed) * 0.1)
                for j in range(n_routed):
                    for n in ("gate_proj", "up_proj", "down_proj"):
                        shp = ((hidden, 32) if n == "down_proj" else (32, hidden))
                        t(f"{pfx}.mlp.experts.{j}.{n}.weight",
                          rng.standard_normal(shp) * 0.05)
                for n in ("gate_proj", "up_proj", "down_proj"):
                    shp = ((hidden, 32) if n == "down_proj" else (32, hidden))
                    t(f"{pfx}.mlp.shared_experts.{n}.weight",
                      rng.standard_normal(shp) * 0.05)
            else:
                for n in ("gate_proj", "up_proj", "down_proj"):
                    shp = ((hidden, inter) if n == "down_proj" else (inter, hidden))
                    t(f"{pfx}.mlp.{n}.weight", rng.standard_normal(shp) * 0.05)

    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.moe_score_func == "sigmoid"
    assert model.cfg.moe_routed_scale == pytest.approx(2.5)
    assert "gate_bias" in model.params["layers"][1]["mlp"]
    logits, _ = model.forward_logits(np.array([[3, 9, 50]], dtype=np.int32))
    assert np.isfinite(np.asarray(logits)).all()

    tok = model.tokenizer
    out = []
    tok.chat_encoder.append_user(0, "hi", out)
    tok.chat_encoder.append_ai_opening(0, out)
    text = tok.tp.decode(out)
    assert text.endswith("</think>")
    assert "\n" not in text.split("<|assistant|>")[-1].replace("</think>", "")


def test_hunyuan_v3_forward_and_eos(tmp_path):
    rng = np.random.default_rng(24)
    hidden, heads, n_kv, head_dim, layers = 64, 4, 2, 16, 2
    n_exp, moe_inter, top_k, n_shared = 4, 32, 2, 1
    path = str(tmp_path / "hy3.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.HUNYUAN_V3), 1, meta={})
        vals = [int(GGMLType.F32), V, hidden, heads, layers, 96, 128,
                1, 2, -1, -1,
                n_kv, head_dim, 1, n_exp, n_shared, moe_inter, moe_inter,
                top_k, 1]
        w.write_config(vals, fmt=f"{len(vals)}i")
        f.write(struct.pack("<2f", 10000.0, 2.0))
        w._patch_offset(12)
        w.write_vocab_bpe(_bpe_with_specials(
            ["<｜hy_User｜>", "<｜hy_Assistant｜>", "<eos:6124c78e>"]), [])

        def t(name, arr):
            w.write_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

        t("model.embed_tokens.weight", rng.standard_normal((V, hidden)) * 0.05)
        t("model.norm.weight", np.ones(hidden))
        for i in range(layers):
            pfx = f"model.layers.{i}"
            t(f"{pfx}.input_layernorm.weight", np.ones(hidden))
            t(f"{pfx}.post_attention_layernorm.weight", np.ones(hidden))
            t(f"{pfx}.self_attn.q_proj.weight",
              rng.standard_normal((heads * head_dim, hidden)) * 0.05)
            t(f"{pfx}.self_attn.k_proj.weight",
              rng.standard_normal((n_kv * head_dim, hidden)) * 0.05)
            t(f"{pfx}.self_attn.v_proj.weight",
              rng.standard_normal((n_kv * head_dim, hidden)) * 0.05)
            t(f"{pfx}.self_attn.o_proj.weight",
              rng.standard_normal((hidden, heads * head_dim)) * 0.05)
            t(f"{pfx}.self_attn.q_norm.weight", np.ones(head_dim))
            t(f"{pfx}.self_attn.k_norm.weight", np.ones(head_dim))
            if i == 0:
                for n in ("gate_proj", "up_proj", "down_proj"):
                    shp = ((hidden, 96) if n == "down_proj" else (96, hidden))
                    t(f"{pfx}.mlp.{n}.weight", rng.standard_normal(shp) * 0.05)
            else:
                t(f"{pfx}.mlp.gate.weight",
                  rng.standard_normal((n_exp, hidden)) * 0.05)
                t(f"{pfx}.mlp.expert_bias", rng.standard_normal(n_exp) * 0.1)
                for j in range(n_exp):
                    for n in ("gate_proj", "up_proj", "down_proj"):
                        shp = ((hidden, moe_inter) if n == "down_proj"
                               else (moe_inter, hidden))
                        t(f"{pfx}.mlp.experts.{j}.{n}.weight",
                          rng.standard_normal(shp) * 0.05)
                for n in ("gate_proj", "up_proj", "down_proj"):
                    shp = ((hidden, moe_inter) if n == "down_proj"
                           else (moe_inter, hidden))
                    t(f"{pfx}.mlp.shared_expert.{n}.weight",
                      rng.standard_normal(shp) * 0.05)

    model = load_model(path, RuntimeConfig(**RT32))
    tok = model.tokenizer
    assert tok.eos_token_id == tok.tp.piece_to_id("<eos:6124c78e>")
    assert model.cfg.tie_lm_head
    assert model.cfg.qk_norm == "rmsnorm_post"
    logits, _ = model.forward_logits(np.array([[3, 9, 50, 7]], dtype=np.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_youtu_golden_dense_mla(tmp_path):
    """Youtu = dense MLA — golden vs HF DeepseekV2 with MoE disabled
    (hunyuan.cpp youtu::llm uses DeepSeek2Block)."""
    from test_mla import _permute_pair, _permute_pair_3

    torch.manual_seed(25)
    hidden, heads, layers, inter = 64, 4, 2, 96
    kv_rank, nope, rope_d, v_dim = 32, 16, 8, 16
    cfg = transformers.DeepseekV2Config(
        vocab_size=V, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=heads, num_hidden_layers=layers,
        intermediate_size=inter, moe_intermediate_size=32,
        kv_lora_rank=kv_rank, q_lora_rank=None,
        qk_nope_head_dim=nope, qk_rope_head_dim=rope_d, v_head_dim=v_dim,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        first_k_dense_replace=layers, moe_layer_freq=1, n_group=1,
        topk_group=1, routed_scaling_factor=1.0, norm_topk_prob=False,
        scoring_func="softmax", topk_method="greedy",
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attention_bias=False, rope_scaling=None,
        aux_loss_alpha=0.0, seq_aux=False, attention_dropout=0.0)
    hf = transformers.DeepseekV2ForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "youtu.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.YOUTU), 1, meta={})
        vals = [int(GGMLType.F32), V, hidden, heads, layers, inter, 128,
                1, 2, -1, -1,
                heads, kv_rank, 0, nope, rope_d, v_dim, 0]
        w.write_config(vals, fmt=f"{len(vals)}i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        w.write_vocab_bpe(_bpe_with_specials(["<|User|>", "<|Assistant|>"]), [])

        def t(name, arr):
            w.write_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

        t("model.embed_tokens.weight", sd["model.embed_tokens.weight"])
        t("model.norm.weight", sd["model.norm.weight"])
        t("lm_head.weight", sd["lm_head.weight"])
        for i in range(layers):
            pfx = f"model.layers.{i}"
            kv_a = sd[f"{pfx}.self_attn.kv_a_proj_with_mqa.weight"]
            t(f"{pfx}.self_attn.d_kv_proj.weight", kv_a[:kv_rank])
            t(f"{pfx}.self_attn.k_pe_proj.weight",
              _permute_pair(kv_a[kv_rank:], 1))
            t(f"{pfx}.self_attn.kv_norm.weight",
              sd[f"{pfx}.self_attn.kv_a_layernorm.weight"])
            kv_b = sd[f"{pfx}.self_attn.kv_b_proj.weight"]
            v3 = kv_b.reshape(heads, nope + v_dim, kv_rank)
            t(f"{pfx}.self_attn.u_k_nope_proj.weight",
              v3[:, :nope].reshape(heads * nope, kv_rank))
            t(f"{pfx}.self_attn.u_v_proj.weight",
              v3[:, nope:].reshape(heads * v_dim, kv_rank))
            t(f"{pfx}.self_attn.q_proj.weight",
              _permute_pair_3(sd[f"{pfx}.self_attn.q_proj.weight"], heads, nope))
            t(f"{pfx}.self_attn.o_proj.weight", sd[f"{pfx}.self_attn.o_proj.weight"])
            t(f"{pfx}.input_layernorm.weight", sd[f"{pfx}.input_layernorm.weight"])
            t(f"{pfx}.post_attention_layernorm.weight",
              sd[f"{pfx}.post_attention_layernorm.weight"])
            for n in ("gate_proj", "up_proj", "down_proj"):
                t(f"{pfx}.mlp.{n}.weight", sd[f"{pfx}.mlp.{n}.weight"])

    model = load_model(path, RuntimeConfig(**RT32))
    ids = np.array([[3, 9, 50, 7, 120]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=5e-3, rtol=5e-3)

    tok = model.tokenizer
    out = []
    tok.chat_encoder.append_user(0, "hi", out)
    tok.chat_encoder.append_ai_opening(0, out)
    assert out[0] == tok.user_token_id
    assert out[-1] == tok.assistant_token_id


def test_llama_multi_mtp(tmp_path):
    """LLAMA_MULTI (models/llama.h:245): head 0 = trunk + last layer +
    final norm + lm_head == a plain llama forward; generation emits
    n_future tokens per forward step."""
    torch.manual_seed(26)
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    rng = np.random.default_rng(26)
    path = str(tmp_path / "lm.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.LLAMA_MULTI), 1, meta={})
        vals = [int(GGMLType.F32), V, 64, 4, 2, 96, 128, 1, 2, -1, -1, 2]
        w.write_config(vals, fmt=f"{len(vals)}i")
        f.write(struct.pack("<fi", 10000.0, 2))   # rope_theta, n_future
        w._patch_offset(12)
        w.write_vocab_sp(_sp_pieces())
        w.write_tensor("model.embed_tokens.weight",
                       sd["model.embed_tokens.weight"], GGMLType.F32)
        for i in range(2):
            pfx = f"model.layers.{i}"
            w.write_tensor(f"{pfx}.input_layernorm.weight",
                           sd[f"{pfx}.input_layernorm.weight"], GGMLType.F32)
            for pj, nh in (("q_proj", 4), ("k_proj", 2), ("v_proj", 0), ("o_proj", 0)):
                arr = sd[f"{pfx}.self_attn.{pj}.weight"]
                if nh:
                    arr = _permute(arr, nh)
                w.write_tensor(f"{pfx}.self_attn.{pj}.weight", arr, GGMLType.F32)
            w.write_tensor(f"{pfx}.post_attention_layernorm.weight",
                           sd[f"{pfx}.post_attention_layernorm.weight"], GGMLType.F32)
            for mj in ("gate_proj", "up_proj", "down_proj"):
                w.write_tensor(f"{pfx}.mlp.{mj}.weight",
                               sd[f"{pfx}.mlp.{mj}.weight"], GGMLType.F32)
        # one extra prediction head (n_future=2), random weights
        pfx = "model.extra_heads.0"
        w.write_tensor(f"{pfx}.input_layernorm.weight", np.ones(64, np.float32),
                       GGMLType.F32)
        for pj, shp in (("q_proj", (64, 64)), ("k_proj", (32, 64)),
                        ("v_proj", (32, 64)), ("o_proj", (64, 64))):
            w.write_tensor(f"{pfx}.self_attn.{pj}.weight",
                           (rng.standard_normal(shp) * 0.05).astype(np.float32),
                           GGMLType.F32)
        w.write_tensor(f"{pfx}.post_attention_layernorm.weight",
                       np.ones(64, np.float32), GGMLType.F32)
        for mj, shp in (("gate_proj", (96, 64)), ("up_proj", (96, 64)),
                        ("down_proj", (64, 96))):
            w.write_tensor(f"{pfx}.mlp.{mj}.weight",
                           (rng.standard_normal(shp) * 0.05).astype(np.float32),
                           GGMLType.F32)
        w.write_tensor("model.norm.weight", sd["model.norm.weight"], GGMLType.F32)
        w.write_tensor("lm_head.weight", sd["lm_head.weight"], GGMLType.F32)

    model = load_model(path, RuntimeConfig(**RT32))
    assert model.n_future_tokens == 2 and model.effective_n == 2
    ids = np.array([[3, 9, 50, 7]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    lh = np.asarray(logits)
    assert lh.shape == (2, V)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits[0, -1].numpy()
    np.testing.assert_allclose(lh[0], ref, atol=5e-3, rtol=5e-3)

    # greedy generation: first sampled token equals HF argmax; two tokens
    # are emitted per forward step
    from chatllm_tpu.runtime.generate import GenerationConfig
    out, _, _ = model.generate(list(ids[0]), GenerationConfig(
        max_new_tokens=4, do_sample=False))
    assert len(out) == 4
    assert out[0] == int(ref.argmax())

    # --set n_future_tokens 1 limits the heads
    m1 = load_model(path, RuntimeConfig(
        additional={"n_future_tokens": "1"}, **RT32))
    assert m1.effective_n == 1
    l1, _ = m1.forward_logits(ids)
    assert np.asarray(l1).shape == (1, V)
