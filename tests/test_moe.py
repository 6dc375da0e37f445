"""MoE golden test: tiny Qwen2MoE vs HF (routing, top-k, shared expert with
sigmoid gate)."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def make_tiny_qwen2moe(path, *, vocab=256, hidden=48, heads=4, kv=2, layers=2,
                       inter=64, moe_inter=32, shared_inter=64, n_experts=4,
                       top_k=2, max_len=128):
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    torch.manual_seed(5)
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=layers,
        intermediate_size=inter, moe_intermediate_size=moe_inter,
        shared_expert_intermediate_size=shared_inter,
        num_experts=n_experts, num_experts_per_tok=top_k,
        norm_topk_prob=False, decoder_sparse_step=1,
        max_position_embeddings=max_len, rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        output_router_logits=False, mlp_only_layers=[])
    hf = transformers.Qwen2MoeForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.QWEN2MoE), 1, meta={})
        w.write_config([int(GGMLType.F32), vocab, hidden, heads, layers, inter,
                        max_len, -1, 0, -1, -1,
                        kv, moe_inter, shared_inter, max_len, top_k,
                        n_experts, 0], fmt="18i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        pieces = [byte_level_encode(bytes([b])) for b in range(vocab)]
        w.write_vocab_bpe([(p, 1) for p in pieces], [])

        def hf2disk(n):
            return n
        names = ["model.embed_tokens.weight"]
        for i in range(layers):
            pfx = f"model.layers.{i}"
            names.append(f"{pfx}.input_layernorm.weight")
            for j in range(n_experts):
                names += [f"{pfx}.mlp.experts.{j}.down_proj.weight",
                          f"{pfx}.mlp.experts.{j}.gate_proj.weight",
                          f"{pfx}.mlp.experts.{j}.up_proj.weight"]
            names += [f"{pfx}.mlp.gate.weight",
                      f"{pfx}.mlp.shared_expert.down_proj.weight",
                      f"{pfx}.mlp.shared_expert.gate_proj.weight",
                      f"{pfx}.mlp.shared_expert.up_proj.weight",
                      f"{pfx}.mlp.shared_expert_gate.weight",
                      f"{pfx}.post_attention_layernorm.weight",
                      f"{pfx}.self_attn.k_proj.weight",
                      f"{pfx}.self_attn.k_proj.bias",
                      f"{pfx}.self_attn.q_proj.weight",
                      f"{pfx}.self_attn.q_proj.bias",
                      f"{pfx}.self_attn.v_proj.weight",
                      f"{pfx}.self_attn.v_proj.bias",
                      f"{pfx}.self_attn.o_proj.weight"]
        names += ["model.norm.weight", "lm_head.weight"]
        for n in names:
            w.write_tensor(n, sd[n], GGMLType.F32)
    return hf


def test_qwen2moe_logits_match_hf(tmp_path):
    path = str(tmp_path / "tiny_q2moe.bin")
    hf = make_tiny_qwen2moe(path)
    rt = RuntimeConfig(weight_dtype="float32", compute_dtype="float32",
                       cache_dtype="float32")
    model = load_model(path, rt)
    ids = np.array([[3, 17, 42, 99, 7, 200]], np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3, rtol=3e-3)


def test_bailing_moe_smoke(tmp_path):
    """Bailing/Ling: deepseek-v1-MoE arch + explicit head_dim + role template."""
    import struct

    from chatllm_tpu.ggmm.quants import GGMLType
    from chatllm_tpu.ggmm.writer import GGMMWriter
    from chatllm_tpu.models import ModelType, RuntimeConfig, load_model
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    vocab, hidden, heads, layers, inter, E, moe_i, hd = 300, 64, 4, 2, 96, 4, 32, 24
    rng = np.random.default_rng(37)
    path = str(tmp_path / "bailing.bin")
    pieces = [byte_level_encode(bytes([b])) for b in range(256)]
    pieces += [b"<role>", b"</role>"]
    pieces += [f"<x{i}>".encode() for i in range(vocab - len(pieces))]
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.BAILINGMOE), 1, meta={"model_name": "t"})
        w.write_config([int(GGMLType.F32), vocab, hidden, heads, layers, inter,
                        128, -1, 1, 0, -1,
                        2, 1, moe_i, 1, E, 1, 1, 2], fmt="19i")
        f.write(struct.pack("<fi", 10000.0, hd))
        w._patch_offset(12)
        w.write_vocab_bpe([(p, 1) for p in pieces], [])

        def wt(name, shape):
            w.write_tensor(name, rng.standard_normal(shape).astype(np.float32) * 0.05,
                           GGMLType.F32)

        wt("model.embed_tokens.weight", (vocab, hidden))
        for i in range(layers):
            pfx = f"model.layers.{i}"
            wt(f"{pfx}.input_layernorm.weight", (hidden,))
            wt(f"{pfx}.post_attention_layernorm.weight", (hidden,))
            wt(f"{pfx}.self_attn.q_proj.weight", (heads * hd, hidden))
            wt(f"{pfx}.self_attn.k_proj.weight", (2 * hd, hidden))
            wt(f"{pfx}.self_attn.v_proj.weight", (2 * hd, hidden))
            wt(f"{pfx}.self_attn.o_proj.weight", (hidden, heads * hd))
            if i >= 1:
                wt(f"{pfx}.mlp.gate.weight", (E, hidden))
                for j in range(E):
                    for n, shp in (("gate_proj", (moe_i, hidden)),
                                   ("up_proj", (moe_i, hidden)),
                                   ("down_proj", (hidden, moe_i))):
                        wt(f"{pfx}.mlp.experts.{j}.{n}.weight", shp)
                for n, shp in (("gate_proj", (moe_i, hidden)),
                               ("up_proj", (moe_i, hidden)),
                               ("down_proj", (hidden, moe_i))):
                    wt(f"{pfx}.mlp.shared_experts.{n}.weight", shp)
            else:
                wt(f"{pfx}.mlp.gate_proj.weight", (inter, hidden))
                wt(f"{pfx}.mlp.up_proj.weight", (inter, hidden))
                wt(f"{pfx}.mlp.down_proj.weight", (hidden, inter))
        wt("model.norm.weight", (hidden,))
        wt("lm_head.weight", (vocab, hidden))
    model = load_model(path, RuntimeConfig(weight_dtype="float32",
                                           compute_dtype="float32",
                                           cache_dtype="float32"))
    assert model.cfg.resolved_head_dim() == hd
    ids = np.array([[3, 14, 15, 92, 6]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_xverse_moe_smoke(tmp_path):
    """XVERSE-MoE: deepseek-v1-MoE arch + role: template (sp vocab)."""
    import struct

    from chatllm_tpu.ggmm.quants import GGMLType
    from chatllm_tpu.ggmm.writer import GGMMWriter
    from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

    vocab, hidden, heads, layers, inter, E, moe_i = 260, 64, 4, 2, 96, 4, 32
    rng = np.random.default_rng(47)
    path = str(tmp_path / "xvmoe.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.XVERSEMOE), 1, meta={"model_name": "t"})
        w.write_config([int(GGMLType.F32), vocab, hidden, heads, layers, inter,
                        128, -1, 1, 0, -1,
                        2, 0, moe_i, 1, E, 1, 1, 2], fmt="19i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        w.write_vocab_bpe([(f"w{i}".encode(), 1) for i in range(vocab)], [])

        def wt(name, shape):
            w.write_tensor(name, rng.standard_normal(shape).astype(np.float32) * 0.05,
                           GGMLType.F32)

        wt("model.embed_tokens.weight", (vocab, hidden))
        for i in range(layers):
            pfx = f"model.layers.{i}"
            wt(f"{pfx}.input_layernorm.weight", (hidden,))
            wt(f"{pfx}.post_attention_layernorm.weight", (hidden,))
            for n in ("q_proj", "o_proj"):
                wt(f"{pfx}.self_attn.{n}.weight", (hidden, hidden))
            for n in ("k_proj", "v_proj"):
                wt(f"{pfx}.self_attn.{n}.weight", (hidden // 2, hidden))
            wt(f"{pfx}.mlp.gate.weight", (E, hidden))
            for j in range(E):
                for n, shp in (("gate_proj", (moe_i, hidden)),
                               ("up_proj", (moe_i, hidden)),
                               ("down_proj", (hidden, moe_i))):
                    wt(f"{pfx}.mlp.experts.{j}.{n}.weight", shp)
            for n, shp in (("gate_proj", (moe_i, hidden)),
                           ("up_proj", (moe_i, hidden)),
                           ("down_proj", (hidden, moe_i))):
                wt(f"{pfx}.mlp.shared_experts.{n}.weight", shp)
        wt("model.norm.weight", (hidden,))
        wt("lm_head.weight", (vocab, hidden))
    model = load_model(path, RuntimeConfig(weight_dtype="float32",
                                           compute_dtype="float32",
                                           cache_dtype="float32"))
    ids = np.array([[3, 14, 15, 92, 6]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    assert np.all(np.isfinite(np.asarray(logits)))
    out = []
    model.tokenizer.chat_encoder.append_user(0, "hi", out)
    assert len(out) > 0
