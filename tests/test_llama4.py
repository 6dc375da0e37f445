"""Llama-4 text model HF-golden: interleaved MoE with sigmoid PRE-weighted
top-1 routing + shared expert, NoPE every 4th layer, weightless post-rope
qk L2 norm (reference models/llama.h v4:347-600)."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model
from test_model_golden import _bpe_pieces

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")
V = 264


@pytest.fixture(scope="module")
def llama4_pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("l4")
    torch.manual_seed(17)
    cfg = transformers.Llama4TextConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, num_hidden_layers=4,
        intermediate_size=48, intermediate_size_mlp=96,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=2, use_qk_norm=True,
        no_rope_layers=None,                  # default: every 4th layer NoPE
        max_position_embeddings=256, rope_theta=500000.0,
        rope_scaling=None, attention_chunk_size=256,
        attn_temperature_tuning=False, attention_bias=False,
        tie_word_embeddings=False)
    hf = transformers.Llama4ForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp / "l4.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.LLAMA4), 1, meta={})
        w.write_config([int(GGMLType.F32), V, 64, 4, 4, 48, 256,
                        1, 2, -1, -1,
                        2, 256, 16, 2, 96, 1, 4, 1], fmt="19i")
        f.write(struct.pack("<ffifff", 0.001, 500000.0, 0, 1.0, 1.0, 4.0))
        w._patch_offset(12)
        pieces = [(p, 1) for p in _bpe_pieces(V)]
        for j, sp in enumerate([b"<|header_start|>", b"<|header_end|>", b"<|eot|>"]):
            pieces[V - 3 + j] = (sp, 4)
        w.write_vocab_bpe(pieces, [])
        w.write_tensor("model.embed_tokens.weight",
                       sd["model.embed_tokens.weight"], GGMLType.F32)
        for i in range(4):
            pfx = f"model.layers.{i}"
            moe = (i + 1) % 2 == 0
            if moe:
                # HF stores experts fused: gate_up_proj [E, H, 2F], down [E, F, H]
                gu = sd[f"{pfx}.feed_forward.experts.gate_up_proj"]
                dn = sd[f"{pfx}.feed_forward.experts.down_proj"]
                E, H, F2 = gu.shape
                F = F2 // 2
                for j in range(E):
                    w.write_tensor(f"{pfx}.mlp.experts.{j}.gate_proj.weight",
                                   np.ascontiguousarray(gu[j][:, :F].T), GGMLType.F32)
                    w.write_tensor(f"{pfx}.mlp.experts.{j}.up_proj.weight",
                                   np.ascontiguousarray(gu[j][:, F:].T), GGMLType.F32)
                    w.write_tensor(f"{pfx}.mlp.experts.{j}.down_proj.weight",
                                   np.ascontiguousarray(dn[j].T), GGMLType.F32)
                w.write_tensor(f"{pfx}.mlp.gate.weight",
                               sd[f"{pfx}.feed_forward.router.weight"], GGMLType.F32)
                for n in ("gate_proj", "up_proj", "down_proj"):
                    w.write_tensor(f"{pfx}.mlp.shared_expert.{n}.weight",
                                   sd[f"{pfx}.feed_forward.shared_expert.{n}.weight"],
                                   GGMLType.F32)
            else:
                for n in ("gate_proj", "up_proj", "down_proj"):
                    w.write_tensor(f"{pfx}.mlp.{n}.weight",
                                   sd[f"{pfx}.feed_forward.{n}.weight"], GGMLType.F32)
            w.write_tensor(f"{pfx}.input_layernorm.weight",
                           sd[f"{pfx}.input_layernorm.weight"], GGMLType.F32)
            w.write_tensor(f"{pfx}.post_attention_layernorm.weight",
                           sd[f"{pfx}.post_attention_layernorm.weight"], GGMLType.F32)
            for pj in ("q_proj", "k_proj", "v_proj", "o_proj"):
                w.write_tensor(f"{pfx}.self_attn.{pj}.weight",
                               sd[f"{pfx}.self_attn.{pj}.weight"], GGMLType.F32)
        w.write_tensor("model.norm.weight", sd["model.norm.weight"], GGMLType.F32)
        w.write_tensor("lm_head.weight", sd["lm_head.weight"], GGMLType.F32)
    return hf, path


def test_llama4_logits_match_hf(llama4_pair):
    hf, path = llama4_pair
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.qk_norm == "l2norm_post"
    assert model.cfg.moe_pre_weighting
    assert model.cfg.layer_specs[1].is_moe and not model.cfg.layer_specs[0].is_moe
    assert model.cfg.layer_specs[3].use_rope is False
    ids = np.array([[7, 30, 102, 89, 5, 200, 41, 9]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3, rtol=3e-3)


def test_llama4_template(llama4_pair):
    _, path = llama4_pair
    model = load_model(path, RuntimeConfig(**RT32))
    tok = model.tokenizer
    tok.sys_prompt = "be nice"
    ids = []
    tok.chat_encoder.append_sys_prompt(ids)
    tok.chat_encoder.append_user(0, "hi", ids)
    tok.chat_encoder.append_ai_opening(0, ids)
    assert ids[0] == tok.bos_token_id
    assert ids.count(tok.start_header_id) == 3
    assert ids.count(tok.eot_id) == 2
    assert tok.eot_id in tok.terminate_ids
