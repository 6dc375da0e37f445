"""Apriel / Reka-Flash-3 / RNJ-1 / JiuTian / CodeFuse-DeepSeek loaders +
the multi-token terminate-sequence engine feature (reference
match_output_sequence, models/reka.cpp:82-108)."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model
from chatllm_tpu.runtime.generate import GenerationConfig, _Emitter
from test_model_golden import _bpe_pieces, _permute
from test_zoo_wave2 import _llama_weights

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")
V = 256


def test_emitter_sequence_holdback():
    got = []
    e = _Emitter(got.append, terminate_seq=[7, 8, 9])
    out = []
    for t in [1, 2, 7, 8, 3, 7, 8, 9]:
        out.append(t)
        done = e.step(out)
        if done:
            break
    assert done
    assert out == [1, 2, 7, 8, 3]          # terminator removed
    e.flush(out)
    assert got == out                       # stream == final, no seq leaked


def test_emitter_no_seq_passthrough():
    got = []
    e = _Emitter(got.append, terminate_seq=None)
    out = []
    for t in [5, 6, 7]:
        out.append(t)
        assert not e.step(out)
    e.flush(out)
    assert got == [5, 6, 7]


def _tiny_llama(mtype, extra_bytes, vocab_kind="bpe", specials=(),
                heads=4, kv=2, theta=50000.0, seed=1):
    torch.manual_seed(seed)
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=theta, rms_norm_eps=1e-5,
        tie_word_embeddings=False, attention_bias=False)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    def write(path):
        with open(path, "wb") as f:
            w = GGMMWriter(f, int(mtype), 1, meta={})
            w.write_config([int(GGMLType.F32), V, 64, heads, 2, 96, 128,
                            1, 2, -1, -1], fmt="11i")
            f.write(extra_bytes)
            w._patch_offset(12)
            pieces = [(p, 1) for p in _bpe_pieces(V)]
            for j, sp in enumerate(specials):
                pieces[V - len(specials) + j] = (sp, 4)
            w.write_vocab_bpe(pieces, [])
            _llama_weights(w, sd, 2, permute_heads=(heads, kv))
    return hf, write


def test_apriel_yarn_golden(tmp_path):
    extra = struct.pack("<ifii3f", 2, 50000.0, 16, 64, 32.0, 1.0, 4.0)
    hf, write = _tiny_llama(ModelType.APRIEL, extra, specials=[b"<|end|>"])
    path = str(tmp_path / "apriel.bin")
    write(path)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.rope.freq_scale == pytest.approx(0.25)
    assert model.cfg.rope.ext_factor == 1.0
    # prompt within orig_max: logits finite + template applies
    logits, _ = model.forward_logits(np.array([[5, 9, 11, 30]], np.int32))
    assert np.isfinite(np.asarray(logits)).all()
    tok = model.tokenizer
    ids = []
    tok.chat_encoder.append_sys_prompt(ids)
    tok.chat_encoder.append_user(0, "q", ids)
    tok.chat_encoder.append_ai_opening(0, ids)
    text = tok.tp.decode([i for i in ids if i != tok.bos_token_id])
    assert "<|system|>" in text and text.endswith("<|assistant|>\n")


def test_reka_terminate_seq_end_to_end(tmp_path):
    extra = struct.pack("<if", 2, 50000.0)
    hf, write = _tiny_llama(ModelType.REKA_FLASH3, extra, seed=3)
    path = str(tmp_path / "reka.bin")
    write(path)
    model = load_model(path, RuntimeConfig(**RT32))
    tok = model.tokenizer
    assert tok.terminate_seq == tok.tp.encode(" <sep>")

    gcfg = GenerationConfig(do_sample=False, sampling="greedy",
                            max_new_tokens=10, temperature=0.0)
    # unconstrained greedy tokens
    model.tokenizer.terminate_seq = None
    base_out, _, _ = model.engine.generate([5, 9, 11], gcfg)
    assert len(base_out) >= 6
    # terminate on the 3rd..4th generated tokens as a sequence
    seq = base_out[2:4]
    streamed = []
    out, _, _ = model.engine.generate(
        [5, 9, 11], gcfg, terminate_seq=seq, on_token=streamed.append)
    assert out == base_out[:2]
    assert streamed == out


def test_jiutian_golden(tmp_path):
    torch.manual_seed(4)
    cfg = transformers.Qwen2Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=True)
    hf = transformers.Qwen2ForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    sd.pop("lm_head.weight", None)
    path = str(tmp_path / "jiutian.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.JIUTIAN), 1, meta={})
        w.write_config([int(GGMLType.F32), V, 64, 4, 2, 96, 128,
                        1, 2, -1, -1, 2, 1], fmt="13i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        pieces = [(p, 1) for p in _bpe_pieces(V)]
        pieces[V - 3] = (b"<|endoftext|>", 4)
        pieces[V - 2] = (b"<|im_start|>", 4)
        pieces[V - 1] = (b"<|im_end|>", 4)
        w.write_vocab_bpe(pieces, [])
        _llama_weights(w, sd, 2)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.tie_lm_head
    ids = np.array([[3, 99, 150, 7]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=2e-3, rtol=2e-3)


def test_codefuse_template(tmp_path):
    extra = struct.pack("<iff", 2, 1.0, 100000.0)
    hf, write = _tiny_llama(ModelType.CODEFUSE_DEEPSEEK, extra, seed=5)
    path = str(tmp_path / "cf.bin")
    write(path)
    model = load_model(path, RuntimeConfig(**RT32))
    tok = model.tokenizer
    assert tok.bos_token_id in tok.terminate_ids
    ids = []
    tok.sys_prompt = "s"
    tok.chat_encoder.append_sys_prompt(ids)
    tok.chat_encoder.append_user(0, "u", ids)
    tok.chat_encoder.append_ai_opening(0, ids)
    assert ids.count(tok.bos_token_id) == 3      # one per segment
    text = tok.tp.decode([i for i in ids if i != tok.bos_token_id])
    assert text == "system\ns\nhuman\nu\nbot\n"


def test_cohere_r7b_golden(tmp_path):
    """Cohere2: SWA+rope layers with a NoPE global layer every `pattern`
    (HF Cohere2ForCausalLM is ground truth)."""
    torch.manual_seed(12)
    cfg = transformers.Cohere2Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=4, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        sliding_window=8, sliding_window_pattern=4, logit_scale=0.25,
        layer_norm_eps=1e-5, tie_word_embeddings=True, layer_switch=4,
        order_of_interleaved_layers=None)
    hf = transformers.Cohere2ForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "r7b.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.COHERE_COMMAND_R7B), 1, meta={})
        w.write_config([int(GGMLType.F32), V, 64, 4, 4, 96, 128,
                        1, 2, -1, -1, 2, 8, 4], fmt="14i")
        f.write(struct.pack("<ff", 10000.0, 0.25))
        w._patch_offset(12)
        pieces = [(p, 1) for p in _bpe_pieces(V)]
        for j, sp in enumerate([b"<|START_OF_TURN_TOKEN|>", b"<|END_OF_TURN_TOKEN|>",
                                b"<|USER_TOKEN|>", b"<|CHATBOT_TOKEN|>",
                                b"<|SYSTEM_TOKEN|>"]):
            pieces[V - 5 + j] = (sp, 4)
        w.write_vocab_bpe(pieces, [])
        # cohere: parallel residual, single input_layernorm, no lm_head
        w.write_tensor("model.embed_tokens.weight",
                       sd["model.embed_tokens.weight"], GGMLType.F32)
        for i in range(4):
            pfx = f"model.layers.{i}"
            w.write_tensor(f"{pfx}.input_layernorm.weight",
                           sd[f"{pfx}.input_layernorm.weight"], GGMLType.F32)
            for pj in ("q_proj", "k_proj", "v_proj", "o_proj"):
                arr = sd[f"{pfx}.self_attn.{pj}.weight"]
                if pj == "q_proj":
                    arr = _permute(arr, 4)
                elif pj == "k_proj":
                    arr = _permute(arr, 2)
                w.write_tensor(f"{pfx}.self_attn.{pj}.weight", arr, GGMLType.F32)
            for mj in ("gate_proj", "up_proj", "down_proj"):
                w.write_tensor(f"{pfx}.mlp.{mj}.weight",
                               sd[f"{pfx}.mlp.{mj}.weight"], GGMLType.F32)
        w.write_tensor("model.norm.weight", sd["model.norm.weight"], GGMLType.F32)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.layer_specs[0].sliding_window == 8
    assert model.cfg.layer_specs[3].use_rope is False
    ids = np.array([[7, 30, 102, 89, 5, 200, 41, 77, 3, 9, 150, 66]],
                   dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3, rtol=3e-3)


def test_instella_forward(tmp_path):
    torch.manual_seed(13)
    # reuse llama weights + add full-projection q/k norms
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "instella.bin")
    rng = np.random.default_rng(0)
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.INSTELLA), 1, meta={})
        w.write_config([int(GGMLType.F32), V, 64, 4, 2, 96, 128,
                        1, 2, -1, -1, 2], fmt="12i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        pieces = [(p, 1) for p in _bpe_pieces(V)]
        pieces[V - 2] = (b"<|im_start|>", 4)
        pieces[V - 1] = (b"<|im_end|>", 4)
        w.write_vocab_bpe(pieces, [])
        w.write_tensor("model.embed_tokens.weight",
                       sd["model.embed_tokens.weight"], GGMLType.F32)
        for i in range(2):
            pfx = f"model.layers.{i}"
            w.write_tensor(f"{pfx}.pre_attention_layernorm.weight",
                           sd[f"{pfx}.input_layernorm.weight"], GGMLType.F32)
            w.write_tensor(f"{pfx}.pre_feedforward_layernorm.weight",
                           sd[f"{pfx}.post_attention_layernorm.weight"], GGMLType.F32)
            for pj in ("q_proj", "k_proj", "v_proj", "o_proj"):
                w.write_tensor(f"{pfx}.self_attn.{pj}.weight",
                               sd[f"{pfx}.self_attn.{pj}.weight"], GGMLType.F32)
            w.write_tensor(f"{pfx}.self_attn.q_norm.weight",
                           rng.random(64).astype(np.float32), GGMLType.F32)
            w.write_tensor(f"{pfx}.self_attn.k_norm.weight",
                           rng.random(32).astype(np.float32), GGMLType.F32)
            for mj in ("gate_proj", "up_proj", "down_proj"):
                w.write_tensor(f"{pfx}.mlp.{mj}.weight",
                               sd[f"{pfx}.mlp.{mj}.weight"], GGMLType.F32)
        w.write_tensor("model.norm.weight", sd["model.norm.weight"], GGMLType.F32)
        w.write_tensor("lm_head.weight", sd["lm_head.weight"], GGMLType.F32)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.qk_norm == "rmsnorm_full"
    logits, _ = model.forward_logits(np.array([[5, 9, 11]], np.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_pangu_embedded_template(tmp_path):
    torch.manual_seed(14)
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, attention_bias=True,
        tie_word_embeddings=False)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "pangu.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.PANGU_EMBEDDED), 1, meta={})
        w.write_config([int(GGMLType.F32), V, 64, 4, 2, 96, 128,
                        1, 2, -1, -1, 2, 0], fmt="13i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        pieces = [(chr(b).encode(), -float(b)) for b in range(V)]
        pieces[V - 5] = ("<pad>".encode(), -900.0)
        pieces[V - 4] = ("[unused9]".encode(), -901.0)
        pieces[V - 3] = ("[unused10]".encode(), -902.0)
        pieces[V - 2] = ("[unused16]".encode(), -903.0)
        pieces[V - 1] = ("[unused17]".encode(), -904.0)
        w.write_vocab_sp(pieces)
        _llama_weights(w, sd, 2)   # NEOX rope: weights land unpermuted
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.qkv_bias and model.cfg.o_bias
    tok = model.tokenizer
    assert tok.unused9_token_id >= 0
    ids = []
    tok.chat_encoder.append_user(0, "hi", ids)
    tok.chat_encoder.append_ai_opening(0, ids)
    assert ids.count(tok.unused9_token_id) == 2
    assert ids.count(tok.unused10_token_id) == 1
    # think-token decode overrides
    assert tok.tp.decode([tok.tp.piece_to_id("[unused16]")]) == "<think>"


def test_deepseek_v3_light_registered():
    from chatllm_tpu.models.base import lookup_model
    from chatllm_tpu.models.deepseek import DeepSeekV3

    assert lookup_model(int(ModelType.DEEPSEEK_V3_LIGHT)) is DeepSeekV3


def test_apertus_xielu_golden(tmp_path):
    """Apertus: xIELU MLP + per-head qk-norm + llama3 freq factors
    (HF ApertusForCausalLM is ground truth)."""
    torch.manual_seed(15)
    cfg = transformers.ApertusConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=256, rope_theta=100000.0,
        rope_scaling={"rope_type": "llama3", "factor": 4.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64},
        tie_word_embeddings=False, attention_bias=False, mlp_bias=False)
    hf = transformers.ApertusForCausalLM(cfg).eval()
    with torch.no_grad():
        for layer in hf.model.layers:
            act = layer.mlp.act_fn
            act.alpha_n.normal_(0.5, 0.1)
            act.alpha_p.normal_(0.5, 0.1)
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "apertus.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.APERTUS), 1, meta={})
        w.write_config([int(GGMLType.F32), V, 64, 4, 2, 96, 256,
                        1, 2, -1, -1, 2], fmt="12i")
        f.write(struct.pack("<fifff", 100000.0, 64, 4.0, 1.0, 4.0))
        w._patch_offset(12)
        pieces = [(p, 1) for p in _bpe_pieces(V)]
        for j, sp in enumerate([b"<|system_start|>", b"<|system_end|>",
                                b"<|developer_start|>", b"<|developer_end|>",
                                b"<|user_start|>", b"<|user_end|>",
                                b"<|assistant_start|>", b"<|assistant_end|>"]):
            pieces[V - 8 + j] = (sp, 4)
        w.write_vocab_bpe(pieces, [])
        w.write_tensor("model.embed_tokens.weight",
                       sd["model.embed_tokens.weight"], GGMLType.F32)
        for i in range(2):
            pfx = f"model.layers.{i}"
            w.write_tensor(f"{pfx}.input_layernorm.weight",
                           sd[f"{pfx}.attention_layernorm.weight"], GGMLType.F32)
            for mj, hfmj in (("down_proj", "down_proj"), ("up_proj", "up_proj")):
                w.write_tensor(f"{pfx}.mlp.{mj}.weight",
                               sd[f"{pfx}.mlp.{hfmj}.weight"], GGMLType.F32)
            for k in ("alpha_n", "alpha_p", "beta", "eps"):
                w.write_tensor(f"{pfx}.mlp.act_fn.{k}",
                               sd[f"{pfx}.mlp.act_fn.{k}"].reshape(1), GGMLType.F32)
            w.write_tensor(f"{pfx}.post_attention_layernorm.weight",
                           sd[f"{pfx}.feedforward_layernorm.weight"], GGMLType.F32)
            for pj in ("k_proj", "o_proj", "q_proj", "v_proj"):
                w.write_tensor(f"{pfx}.self_attn.{pj}.weight",
                               sd[f"{pfx}.self_attn.{pj}.weight"], GGMLType.F32)
            w.write_tensor(f"{pfx}.self_attn.q_norm.weight",
                           sd[f"{pfx}.self_attn.q_norm.weight"], GGMLType.F32)
            w.write_tensor(f"{pfx}.self_attn.k_norm.weight",
                           sd[f"{pfx}.self_attn.k_norm.weight"], GGMLType.F32)
        w.write_tensor("model.norm.weight", sd["model.norm.weight"], GGMLType.F32)
        w.write_tensor("lm_head.weight", sd["lm_head.weight"], GGMLType.F32)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.rope.freq_factors is not None
    ids = np.array([[7, 30, 102, 89, 5, 200]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3, rtol=3e-3)

    tok = model.tokenizer
    ids = []
    tok.chat_encoder.append_sys_prompt(ids)
    tok.chat_encoder.append_user(0, "hi", ids)
    tok.chat_encoder.append_ai_opening(0, ids)
    assert ids[0] == tok.bos_token_id
    assert ids.count(tok.system_token_id) == 1
    assert ids.count(tok.developer_token_id) == 1
    assert ids[-1] == tok.assistant_token_id
    assert tok.end_assistant_token_id in tok.terminate_ids


def test_bailing_moe2_forward(tmp_path):
    from chatllm_tpu.models.base import lookup_model
    from chatllm_tpu.models.deepseek import BailingMoE2

    assert lookup_model(int(ModelType.BAILING_MOE2)) is BailingMoE2
