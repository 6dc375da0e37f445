"""DeepSeek-V2-Lite golden test: MLA attention + shared-expert MoE vs HF."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _permute_pair(w, n_head):
    # convert.py:1365 — interleaved pairs -> half-split, per head
    out = w.shape[0]
    return (w.reshape(n_head, out // n_head // 2, 2, *w.shape[1:])
             .swapaxes(1, 2).reshape(w.shape))


def _permute_pair_3(w, n_head, nope_dim):
    # convert.py:6236 — rope tail of each head interleaved -> half-split
    hidden = w.shape[0]
    head_dim = hidden // n_head
    rope_dim = head_dim - nope_dim
    r = w.reshape(n_head, head_dim, *w.shape[1:])
    rot = r[:, nope_dim:]
    other = r[:, :nope_dim]
    rot = (rot.reshape(n_head, rope_dim // 2, 2, *w.shape[1:])
              .swapaxes(1, 2).reshape(rot.shape))
    return np.concatenate([other, rot], axis=1).reshape(w.shape)


def make_tiny_dsv2(path, *, vocab=256, hidden=64, heads=4, layers=3,
                   inter=96, moe_inter=32, kv_rank=32, nope=16, rope_d=8,
                   v_dim=16, n_routed=4, n_shared=1, top_k=2,
                   first_dense=1, max_len=128):
    torch.manual_seed(11)
    cfg = transformers.DeepseekV2Config(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=heads, num_hidden_layers=layers,
        intermediate_size=inter, moe_intermediate_size=moe_inter,
        kv_lora_rank=kv_rank, q_lora_rank=None,
        qk_nope_head_dim=nope, qk_rope_head_dim=rope_d, v_head_dim=v_dim,
        n_routed_experts=n_routed, n_shared_experts=n_shared,
        num_experts_per_tok=top_k, first_k_dense_replace=first_dense,
        moe_layer_freq=1, n_group=1, topk_group=1,
        routed_scaling_factor=1.0, norm_topk_prob=False,
        scoring_func="softmax", topk_method="greedy",
        max_position_embeddings=max_len, rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False, attention_bias=False,
        rope_scaling=None, aux_loss_alpha=0.0, seq_aux=False,
        attention_dropout=0.0)
    hf = transformers.DeepseekV2ForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    def is_moe(i):
        return i >= first_dense

    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.DEEPSEEK_V2_LIGHT), 1, meta={})
        vals = [int(GGMLType.F32), vocab, hidden, heads, layers, inter,
                max_len, -1, 0, -1, -1,
                heads, first_dense, kv_rank, moe_inter, 1, 1, n_routed,
                n_shared, 0, top_k, nope, rope_d, max_len, v_dim]
        w.write_config(vals, fmt=f"{len(vals)}i")
        # beta_fast, beta_slow, factor, mscale, mscale_all_dim, rope_theta,
        # routed_scaling_factor
        f.write(struct.pack("<7f", 32.0, 1.0, 1.0, 1.0, 1.0, 10000.0, 1.0))
        w._patch_offset(12)
        w.write_vocab_bpe([(f"w{i}".encode(), 1) for i in range(vocab)], [])

        tensors = {"model.embed_tokens.weight": sd["model.embed_tokens.weight"],
                   "model.norm.weight": sd["model.norm.weight"],
                   "lm_head.weight": sd["lm_head.weight"]}
        for i in range(layers):
            pfx = f"model.layers.{i}"
            kv_a = sd[f"{pfx}.self_attn.kv_a_proj_with_mqa.weight"]
            tensors[f"{pfx}.self_attn.d_kv_proj.weight"] = kv_a[:kv_rank]
            tensors[f"{pfx}.self_attn.k_pe_proj.weight"] = _permute_pair(kv_a[kv_rank:], 1)
            tensors[f"{pfx}.self_attn.kv_norm.weight"] = sd[f"{pfx}.self_attn.kv_a_layernorm.weight"]
            kv_b = sd[f"{pfx}.self_attn.kv_b_proj.weight"]
            v3 = kv_b.reshape(heads, nope + v_dim, kv_rank)
            tensors[f"{pfx}.self_attn.u_k_nope_proj.weight"] = v3[:, :nope].reshape(heads * nope, kv_rank)
            tensors[f"{pfx}.self_attn.u_v_proj.weight"] = v3[:, nope:].reshape(heads * v_dim, kv_rank)
            tensors[f"{pfx}.self_attn.q_proj.weight"] = _permute_pair_3(
                sd[f"{pfx}.self_attn.q_proj.weight"], heads, nope)
            tensors[f"{pfx}.self_attn.o_proj.weight"] = sd[f"{pfx}.self_attn.o_proj.weight"]
            tensors[f"{pfx}.input_layernorm.weight"] = sd[f"{pfx}.input_layernorm.weight"]
            tensors[f"{pfx}.post_attention_layernorm.weight"] = sd[f"{pfx}.post_attention_layernorm.weight"]
            if is_moe(i):
                tensors[f"{pfx}.mlp.gate.weight"] = sd[f"{pfx}.mlp.gate.weight"]
                for j in range(n_routed):
                    for n in ("gate_proj", "up_proj", "down_proj"):
                        tensors[f"{pfx}.mlp.experts.{j}.{n}.weight"] = sd[f"{pfx}.mlp.experts.{j}.{n}.weight"]
                for n in ("gate_proj", "up_proj", "down_proj"):
                    tensors[f"{pfx}.mlp.shared_experts.{n}.weight"] = sd[f"{pfx}.mlp.shared_experts.{n}.weight"]
            else:
                for n in ("gate_proj", "up_proj", "down_proj"):
                    tensors[f"{pfx}.mlp.{n}.weight"] = sd[f"{pfx}.mlp.{n}.weight"]
        for n, arr in tensors.items():
            w.write_tensor(n, arr, GGMLType.F32)
    return hf


def test_deepseek_v2_logits_match_hf(tmp_path):
    path = str(tmp_path / "tiny_dsv2.bin")
    hf = make_tiny_dsv2(path)
    rt = RuntimeConfig(weight_dtype="float32", compute_dtype="float32",
                       cache_dtype="float32")
    model = load_model(path, rt)
    assert model.cfg.mla is not None
    ids = np.array([[3, 17, 42, 99, 7, 200, 11, 4]], np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3, rtol=3e-3)


def test_mla_compressed_cache_matches_expanded(tmp_path):
    """Latent ("memory") MLA cache with absorbed projections must reproduce
    the expanded ("speed") mode logits exactly (reference forward_memory vs
    forward_speed, deepseek.cpp:406/328)."""
    path = str(tmp_path / "dsv2c.bin")
    make_tiny_dsv2(path)
    rt = dict(weight_dtype="float32", compute_dtype="float32",
              cache_dtype="float32")
    m_speed = load_model(path, RuntimeConfig(**rt))
    m_mem = load_model(path, RuntimeConfig(**rt, mla_cache="memory"))
    assert m_mem.cfg.mla_compressed
    # latent cache is h× smaller
    from chatllm_tpu.nn.transformer import init_cache

    ck = init_cache(m_mem.cfg, 1, 32).k[0]
    ek = init_cache(m_speed.cfg, 1, 32).k[0]
    assert ck.shape[2] == 1 and ck.shape[3] == (
        m_mem.cfg.mla.kv_lora_rank + m_mem.cfg.mla.qk_rope_head_dim)
    assert ek.shape[2] == m_speed.cfg.num_attention_heads

    ids = np.array([[3, 14, 15, 92, 6, 53]], dtype=np.int32)
    ls, _ = m_speed.forward_logits(ids)
    lm, _ = m_mem.forward_logits(ids)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(ls),
                               atol=2e-4, rtol=2e-4)

    # incremental decode parity (cache correctness across steps)
    eng = m_mem.engine
    cache = eng.new_cache(1, 32)
    l1, cache, n_past = eng.prefill(ids[:, :4], cache, 0)
    l2, cache, n_past = eng.prefill(ids[:, 4:], cache, n_past)
    np.testing.assert_allclose(np.asarray(l2)[0], np.asarray(lm)[0, -1],
                               atol=2e-4, rtol=2e-4)
