"""Long-tail families part 2: Hunyuan-Dense HF-golden (post-rope qk-norm),
Baichuan-13B ALiBi, Orion LayerNorm, TeleChat2/Zhinao smoke."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")


def _base_vals(vocab, hidden, heads, layers, inter, max_len=128,
               bos=-1, eos=1, pad=0, sep=-1):
    return [int(GGMLType.F32), vocab, hidden, heads, layers, inter, max_len,
            bos, eos, pad, sep]


def _llama_names(layers, tie=False, qk=None):
    names = ["model.embed_tokens.weight"]
    for i in range(layers):
        names += [f"model.layers.{i}.{n}" for n in [
            "input_layernorm.weight",
            "self_attn.q_proj.weight", "self_attn.k_proj.weight",
            "self_attn.v_proj.weight", "self_attn.o_proj.weight",
            "post_attention_layernorm.weight",
            "mlp.gate_proj.weight", "mlp.up_proj.weight",
            "mlp.down_proj.weight"]]
        if qk:
            names += [f"model.layers.{i}.self_attn.{qk[0]}",
                      f"model.layers.{i}.self_attn.{qk[1]}"]
    names += ["model.norm.weight"]
    if not tie:
        names += ["lm_head.weight"]
    return names


def make_tiny_hunyuan(path, *, vocab=280, hidden=64, heads=4, kv=2, layers=2,
                      inter=96):
    torch.manual_seed(11)
    cfg = transformers.HunYuanDenseV1Config(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=layers,
        intermediate_size=inter, max_position_embeddings=128,
        head_dim=hidden // heads, rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=True,
        attention_bias=False, rope_scaling=None, use_qk_norm=True,
        pad_token_id=0, eos_token_id=1, bos_token_id=None)
    hf = transformers.HunYuanDenseV1ForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.HUNYUAN_DENSE), 1,
                       meta={"model_name": "tiny-hunyuan"})
        w.write_config(_base_vals(vocab, hidden, heads, layers, inter) + [kv],
                       fmt="12i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        w.write_vocab_bpe([(f"<t{i}>".encode(), 1) for i in range(vocab)], [])
        for n in _llama_names(layers, tie=True,
                              qk=("key_layernorm.weight",
                                  "query_layernorm.weight")):
            w.write_tensor(n, sd[n], GGMLType.F32)
    return hf


def test_hunyuan_logits_match_hf(tmp_path):
    path = str(tmp_path / "tiny_hy.bin")
    hf = make_tiny_hunyuan(path)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.qk_norm == "rmsnorm_post"
    assert model.cfg.tie_lm_head
    ids = np.array([[5, 77, 101, 32, 9, 200, 3]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=2e-3, rtol=2e-3)


def _write_sp_model(path, mtype, extra_bytes, layers=2, vocab=260, hidden=64,
                    heads=4, inter=96, norm_bias=False, extra_tensors=(),
                    fmt_extra="", bpe_vocab=False):
    rng = np.random.default_rng(5)
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(mtype), 1, meta={"model_name": "tiny"})
        w.write_config(_base_vals(vocab, hidden, heads, layers, inter),
                       fmt="11i")
        f.write(extra_bytes)
        w._patch_offset(12)
        if bpe_vocab:
            w.write_vocab_bpe([(f"w{i}".encode(), 1) for i in range(vocab)], [])
        else:
            w.write_vocab_sp([(f"w{i}".encode(), -float(i)) for i in range(vocab)])

        def wt(name, shape):
            w.write_tensor(name, rng.standard_normal(shape).astype(np.float32) * 0.05,
                           GGMLType.F32)

        wt("model.embed_tokens.weight", (vocab, hidden))
        for i in range(layers):
            pfx = f"model.layers.{i}"
            for n in ("input_layernorm", "post_attention_layernorm"):
                wt(f"{pfx}.{n}.weight", (hidden,))
                if norm_bias:
                    wt(f"{pfx}.{n}.bias", (hidden,))
            for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
                wt(f"{pfx}.self_attn.{n}.weight", (hidden, hidden))
            for n, shape in (("gate_proj", (inter, hidden)),
                             ("up_proj", (inter, hidden)),
                             ("down_proj", (hidden, inter))):
                wt(f"{pfx}.mlp.{n}.weight", shape)
            for n, shape in extra_tensors:
                wt(f"{pfx}.{n}", shape)
        wt("model.norm.weight", (hidden,))
        if norm_bias:
            wt("model.norm.bias", (hidden,))
        wt("lm_head.weight", (vocab, hidden))


def _smoke(model):
    ids = np.array([[3, 14, 15, 92, 6]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    arr = np.asarray(logits)
    assert arr.shape == (1, 5, model.cfg.vocab_size)
    assert np.all(np.isfinite(arr))
    return arr


def test_baichuan13b_alibi(tmp_path):
    path = str(tmp_path / "bc13.bin")
    _write_sp_model(path, ModelType.BAICHUAN, struct.pack("<2i", 10, 11))
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.use_alibi
    assert not model.cfg.layer_spec(0).use_rope
    arr = _smoke(model)
    # the ALiBi bias must change the output: compare against the same
    # weights with the bias disabled
    from dataclasses import replace

    from chatllm_tpu.nn.transformer import init_cache, transformer_forward

    import jax.numpy as jnp
    ids = jnp.asarray(np.array([[3, 14, 15, 92, 6]], np.int32))
    cache = init_cache(model.cfg, 1, 16)
    no_alibi = replace(model.cfg, use_alibi=False)
    l2, _ = transformer_forward(no_alibi, model.params, ids, cache, 0)
    assert not np.allclose(arr, np.asarray(l2), atol=1e-5)


def test_baichuan7b_rope(tmp_path):
    path = str(tmp_path / "bc7.bin")
    _write_sp_model(path, ModelType.BAICHUANLLAMA, struct.pack("<2i", 10, 11))
    model = load_model(path, RuntimeConfig(**RT32))
    assert not model.cfg.use_alibi
    _smoke(model)


def test_orion_layernorm(tmp_path):
    path = str(tmp_path / "orion.bin")
    _write_sp_model(path, ModelType.ORION,
                    struct.pack("<i2f", 4, 1.0, 10000.0), norm_bias=True)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.norm_type == "layernorm"
    assert model.params["final_norm"].get("b") is not None
    _smoke(model)


def test_telechat2(tmp_path):
    path = str(tmp_path / "tc2.bin")
    _write_sp_model(path, ModelType.TELECHAT2, struct.pack("<2i", 4, 8192))
    model = load_model(path, RuntimeConfig(**RT32))
    _smoke(model)
    ids = []
    model.tokenizer.chat_encoder.append_user(0, "hi", ids)
    assert ids[0] == model.tokenizer.pad_token_id + 1


def test_xverse(tmp_path):
    path = str(tmp_path / "xv.bin")
    # xverse loads a BPEProcessor3 (BPE2-format vocab), not scored-SP
    _write_sp_model(path, ModelType.XVERSE, b"", bpe_vocab=True)
    model = load_model(path, RuntimeConfig(**RT32))
    _smoke(model)


def test_aquila2_freq_scale(tmp_path):
    path = str(tmp_path / "aq.bin")
    # aquila2 loads default-regex BPEProcessor2 (aquila.cpp:185)
    _write_sp_model(path, ModelType.AQUILA2,
                    struct.pack("<i2f", 4, 10000.0, 2.0), bpe_vocab=True)
    model = load_model(path, RuntimeConfig(**RT32))
    assert abs(model.cfg.rope.freq_scale - 0.5) < 1e-9
    _smoke(model)


def test_bluelm_ntk_mix(tmp_path):
    path = str(tmp_path / "blm.bin")
    _write_sp_model(path, ModelType.BLUELM,
                    struct.pack("<i3f", 4, 10000.0, 16.0, 0.3))
    model = load_model(path, RuntimeConfig(**RT32))
    ff = model.cfg.rope.freq_factors
    assert ff is not None and len(ff) == 8  # head_dim 16 → 8 dividers
    assert ff[0] > 1.0 and ff[-1] > ff[0]   # monotone NTK-mix stretch
    _smoke(model)


def test_index_template(tmp_path):
    path = str(tmp_path / "idx.bin")
    _write_sp_model(path, ModelType.INDEX, struct.pack("<if", 4, 10000.0))
    model = load_model(path, RuntimeConfig(**RT32))
    _smoke(model)
    ids = []
    model.tokenizer.chat_encoder.append_user(0, "hi", ids)
    assert ids[0] == 3


def test_qwen1_dynamic_ntk(tmp_path):
    """Qwen-v1: dynamic-NTK rope tables match the reference custom op's
    per-position formula (custom_ops.cpp:79), and logn attention activates."""
    import jax.numpy as jnp

    from chatllm_tpu.ggmm.writer import GGMMWriter
    from chatllm_tpu.ops.rope import RopeConfig, precompute_rope_cache

    # rope formula check
    d, L = 16, 64
    cfg = RopeConfig(head_dim=d, freq_base=10000.0, ntk_dynamic=True,
                     orig_ctx=L)
    pos = np.array([1, 10, 63, 64, 65, 128, 200, 1000])
    cos, sin = precompute_rope_cache(jnp.asarray(pos), cfg)
    import math
    for pi, p in enumerate(pos):
        cv = math.log2(max(p, 1) / L) + 1
        alpha = max(2 ** math.ceil(cv) - 1, 1.0)
        base = 10000.0 * alpha ** (d / (d - 2))
        for j in range(d // 2):
            th = p * base ** (-2 * j / d)
            assert abs(float(cos[pi, j]) - math.cos(th)) < 1e-4, (p, j)

    # end-to-end smoke with qwen1 weight names
    vocab, hidden, heads, layers, inter = 300, 64, 4, 2, 96
    rng = np.random.default_rng(9)
    path = str(tmp_path / "qw1.bin")
    from test_qwen_vl import _pieces as _qwen_pieces  # byte vocab + specials
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.QWEN), 2, meta={"model_name": "t"})
        w.write_config(_base_vals(vocab, hidden, heads, layers, inter) +
                       [32, 16, 3], fmt="14i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        pieces, _ = _qwen_pieces()
        w.write_vocab_bpe([(p, 1) for p in pieces[:vocab]], [])

        def wt(name, shape):
            w.write_tensor(name, rng.standard_normal(shape).astype(np.float32) * 0.05,
                           GGMLType.F32)

        wt("transformer.wte.weight", (vocab, hidden))
        for i in range(layers):
            pfx = f"transformer.h.{i}"
            for n in ("q_proj", "k_proj", "v_proj"):
                wt(f"{pfx}.attn.{n}.weight", (hidden, hidden))
                wt(f"{pfx}.attn.{n}.bias", (hidden,))
            wt(f"{pfx}.attn.c_proj.weight", (hidden, hidden))
            wt(f"{pfx}.ln_1.weight", (hidden,))
            wt(f"{pfx}.ln_2.weight", (hidden,))
            wt(f"{pfx}.mlp.w1.weight", (inter, hidden))
            wt(f"{pfx}.mlp.w2.weight", (inter, hidden))
            wt(f"{pfx}.mlp.c_proj.weight", (hidden, inter))
        wt("transformer.ln_f.weight", (hidden,))
        wt("lm_head.weight", (vocab, hidden))
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.rope.ntk_dynamic and model.cfg.rope.orig_ctx == 32
    assert model.cfg.logn_attn_seq == 32
    assert model.cfg.rope.resolved_rot_dim() == 16
    _smoke(model)


def test_stablelm(tmp_path, monkeypatch):
    path = str(tmp_path / "slm.bin")
    # stablelm reads a BPE2 vocab — patch the sp-vocab writer for this file
    import chatllm_tpu.ggmm.writer as gw
    orig = gw.GGMMWriter.write_vocab_sp
    monkeypatch.setattr(
        gw.GGMMWriter, "write_vocab_sp",
        lambda self, toks: self.write_vocab_bpe(
            [(t, 1) for t, _ in toks], []))
    _write_sp_model(path, ModelType.STABLELM,
                    struct.pack("<2i2f", 4, 8, 10000.0, 1.0), norm_bias=True)
    monkeypatch.setattr(gw.GGMMWriter, "write_vocab_sp", orig)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.norm_type == "layernorm"
    assert model.cfg.rope.resolved_rot_dim() == 8
    _smoke(model)


def test_grok1_moe(tmp_path):
    from chatllm_tpu.ggmm.writer import GGMMWriter

    vocab, hidden, heads, layers, inter, E = 260, 64, 4, 2, 48, 4
    rng = np.random.default_rng(17)
    path = str(tmp_path / "grok.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.GROK_1), 1, meta={"model_name": "t"})
        w.write_config(_base_vals(vocab, hidden, heads, layers, inter) +
                       [2, E, 2], fmt="14i")
        f.write(struct.pack("<2f", 10000.0, 0.5))
        w._patch_offset(12)
        w.write_vocab_sp([(f"w{i}".encode(), -float(i)) for i in range(vocab)])

        def wt(name, shape):
            w.write_tensor(name, rng.standard_normal(shape).astype(np.float32) * 0.05,
                           GGMLType.F32)

        wt("model.embed_tokens.weight", (vocab, hidden))
        for i in range(layers):
            pfx = f"model.layers.{i}"
            for n in ("rms_norm", "rms_norm_1", "rms_norm_2", "rms_norm_3"):
                wt(f"{pfx}.{n}.weight", (hidden,))
            wt(f"{pfx}.self_attn.q_proj.weight", (hidden, hidden))
            wt(f"{pfx}.self_attn.k_proj.weight", (hidden // 2, hidden))
            wt(f"{pfx}.self_attn.v_proj.weight", (hidden // 2, hidden))
            wt(f"{pfx}.self_attn.o_proj.weight", (hidden, hidden))
            wt(f"{pfx}.router.weight", (E, hidden))
            for j in range(E):
                wt(f"{pfx}.experts.{j}.w1.weight", (inter, hidden))
                wt(f"{pfx}.experts.{j}.w2.weight", (hidden, inter))
                wt(f"{pfx}.experts.{j}.w3.weight", (inter, hidden))
        wt("model.norm.weight", (hidden,))
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.logit_softcap == 30.0
    assert model.cfg.post_norms and model.cfg.tie_lm_head
    assert abs(model.cfg.logit_scale - 0.5) < 1e-9
    _smoke(model)


def test_hunyuan_moe_v1(tmp_path):
    from chatllm_tpu.ggmm.writer import GGMMWriter

    vocab, hidden, heads, layers, inter, E, moe_i = 260, 64, 4, 2, 48, 4, 32
    rng = np.random.default_rng(23)
    path = str(tmp_path / "hymoe.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.HUNYUAN_MOE_V1), 1,
                       meta={"model_name": "t"})
        w.write_config(_base_vals(vocab, hidden, heads, layers, inter) +
                       [2, E, moe_i, 2, 1], fmt="16i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        w.write_vocab_bpe([(f"<t{i}>".encode(), 1) for i in range(vocab)], [])

        def wt(name, shape):
            w.write_tensor(name, rng.standard_normal(shape).astype(np.float32) * 0.05,
                           GGMLType.F32)

        wt("model.embed_tokens.weight", (vocab, hidden))
        for i in range(layers):
            pfx = f"model.layers.{i}"
            for n in ("input_layernorm", "post_attention_layernorm"):
                wt(f"{pfx}.{n}.weight", (hidden,))
            wt(f"{pfx}.self_attn.q_proj.weight", (hidden, hidden))
            wt(f"{pfx}.self_attn.k_proj.weight", (hidden // 2, hidden))
            wt(f"{pfx}.self_attn.v_proj.weight", (hidden // 2, hidden))
            wt(f"{pfx}.self_attn.o_proj.weight", (hidden, hidden))
            wt(f"{pfx}.self_attn.query_layernorm.weight", (hidden // heads,))
            wt(f"{pfx}.self_attn.key_layernorm.weight", (hidden // heads,))
            wt(f"{pfx}.mlp.gate.weight", (E, hidden))
            for j in range(E):
                wt(f"{pfx}.mlp.experts.{j}.gate_proj.weight", (moe_i, hidden))
                wt(f"{pfx}.mlp.experts.{j}.up_proj.weight", (moe_i, hidden))
                wt(f"{pfx}.mlp.experts.{j}.down_proj.weight", (hidden, moe_i))
            wt(f"{pfx}.mlp.shared_expert.gate_proj.weight", (inter, hidden))
            wt(f"{pfx}.mlp.shared_expert.up_proj.weight", (inter, hidden))
            wt(f"{pfx}.mlp.shared_expert.down_proj.weight", (hidden, inter))
        wt("model.norm.weight", (hidden,))
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.moe_num_experts == E and model.cfg.qk_norm == "rmsnorm_post"
    _smoke(model)


def test_template_aliases(tmp_path):
    """WizardLM/TigerBot/CodeLlama: arch reuse + swapped templates."""
    cases = [
        (ModelType.WIZARDLM, b""),
        (ModelType.TIGERBOT, b""),
        (ModelType.CODELLAMA, struct.pack("<f", 1000000.0)),
    ]
    for mtype, extra in cases:
        path = str(tmp_path / f"alias_{int(mtype)}.bin")
        _write_sp_model(path, mtype, extra)
        model = load_model(path, RuntimeConfig(**RT32))
        _smoke(model)
        if mtype == ModelType.CODELLAMA:
            assert model.cfg.rope.freq_base == 1000000.0
        if mtype == ModelType.WIZARDLM:
            from chatllm_tpu.models.aliases import VicunaEncoder
            assert isinstance(model.tokenizer.chat_encoder, VicunaEncoder)
            assert model.tokenizer.sys_prompt.startswith("A chat between")
        if mtype == ModelType.TIGERBOT:
            ids = []
            model.tokenizer.chat_encoder.append_ai_opening(0, ids)
            assert ids[-1] == model.tokenizer.pad_token_id - 1


def test_decilm_heterogeneous(tmp_path):
    """DeciLM: per-layer GQA + attention-free layers (HeterogeneousModel)."""
    from chatllm_tpu.ggmm.writer import GGMMWriter
    from test_qwen_vl import _pieces as _qwen_pieces

    vocab, hidden, heads, layers, inter = 300, 64, 4, 3, 96
    groups = [2, 0, 4]     # layer1: kv=2; layer2: no attn; layer3: kv=1 (MQA)
    rng = np.random.default_rng(31)
    path = str(tmp_path / "deci.bin")
    lc = []
    for g in groups:
        lc += [g, inter]
    lc += [0] * (200 - len(lc))
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.DECILM), 1, meta={"model_name": "t"})
        w.write_config(_base_vals(vocab, hidden, heads, layers, inter), fmt="11i")
        f.write(struct.pack("<if", 2, 500000.0))          # n_kv, theta
        f.write(struct.pack("<ifff", 8192, 8.0, 1.0, 4.0))  # 3.1 scaling
        f.write(struct.pack("<200i", *lc))
        w._patch_offset(12)
        pieces, _ = _qwen_pieces()
        w.write_vocab_bpe([(p, 1) for p in pieces[:vocab]], [])

        def wt(name, shape):
            w.write_tensor(name, rng.standard_normal(shape).astype(np.float32) * 0.05,
                           GGMLType.F32)

        wt("model.embed_tokens.weight", (vocab, hidden))
        for i, g in enumerate(groups):
            pfx = f"model.layers.{i}"
            if g > 0:
                kvh = heads // g
                wt(f"{pfx}.input_layernorm.weight", (hidden,))
                wt(f"{pfx}.self_attn.q_proj.weight", (hidden, hidden))
                wt(f"{pfx}.self_attn.k_proj.weight", (kvh * 16, hidden))
                wt(f"{pfx}.self_attn.v_proj.weight", (kvh * 16, hidden))
                wt(f"{pfx}.self_attn.o_proj.weight", (hidden, hidden))
            wt(f"{pfx}.post_attention_layernorm.weight", (hidden,))
            wt(f"{pfx}.mlp.gate_proj.weight", (inter, hidden))
            wt(f"{pfx}.mlp.up_proj.weight", (inter, hidden))
            wt(f"{pfx}.mlp.down_proj.weight", (hidden, inter))
        wt("model.norm.weight", (hidden,))
        wt("lm_head.weight", (vocab, hidden))
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.layer_spec(0).num_kv_heads == 2
    assert model.cfg.layer_spec(1).no_attn
    assert model.cfg.layer_spec(2).num_kv_heads == 1
    from chatllm_tpu.nn.transformer import init_cache
    cache = init_cache(model.cfg, 1, 32)
    assert cache.k[0].shape[2] == 2 and cache.k[1].shape == (1, 1, 1, 1)
    assert cache.k[2].shape[2] == 1
    _smoke(model)


def test_olmoe_logits_match_hf(tmp_path):
    """OLMoE: full-projection qk-norm + top-k MoE, HF-golden."""
    from chatllm_tpu.ggmm.writer import GGMMWriter
    from test_qwen_vl import _pieces as _qwen_pieces

    torch.manual_seed(29)
    vocab, hidden, heads, kv, layers, inter, E, K = 300, 64, 4, 2, 2, 48, 4, 2
    cfg = transformers.OlmoeConfig(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=layers,
        intermediate_size=inter, num_experts=E, num_experts_per_tok=K,
        norm_topk_prob=True, max_position_embeddings=128,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False)
    hf = transformers.OlmoeForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "olmoe.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.OLMoE), 1, meta={"model_name": "t"})
        w.write_config(_base_vals(vocab, hidden, heads, layers, inter) +
                       [kv, K, E, 1], fmt="15i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        pieces, _ = _qwen_pieces()
        w.write_vocab_bpe([(p, 1) for p in pieces[:vocab]], [])
        for i in range(layers):
            pfx = f"model.layers.{i}"
            for j in range(E):
                for n in ("down_proj", "gate_proj", "up_proj"):
                    w.write_tensor(f"{pfx}.mlp.experts.{j}.{n}.weight",
                                   sd[f"{pfx}.mlp.experts.{j}.{n}.weight"],
                                   GGMLType.F32)
        names = ["model.embed_tokens.weight"]
        for i in range(layers):
            names += [f"model.layers.{i}.{n}" for n in [
                "mlp.gate.weight", "input_layernorm.weight",
                "post_attention_layernorm.weight",
                "self_attn.k_norm.weight", "self_attn.k_proj.weight",
                "self_attn.o_proj.weight", "self_attn.q_norm.weight",
                "self_attn.q_proj.weight", "self_attn.v_proj.weight"]]
        names += ["model.norm.weight", "lm_head.weight"]
        for n in names:
            w.write_tensor(n, sd[n], GGMLType.F32)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.qk_norm == "rmsnorm_full"
    ids = np.array([[5, 77, 101, 32, 9, 200]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3, rtol=3e-3)


def test_granite_moe_golden(tmp_path):
    """GraniteMoE: granite multipliers + MoE, HF-golden."""
    from chatllm_tpu.ggmm.writer import GGMMWriter
    from test_qwen_vl import _pieces as _qwen_pieces

    torch.manual_seed(33)
    vocab, hidden, heads, kv, layers, inter, E, K = 300, 64, 4, 2, 2, 48, 4, 2
    cfg = transformers.GraniteMoeConfig(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=layers,
        intermediate_size=inter, num_local_experts=E, num_experts_per_tok=K,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attention_multiplier=0.015625,
        logits_scaling=8.0, residual_multiplier=0.22,
        embedding_multiplier=1.0)
    hf = transformers.GraniteMoeForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "gmoe.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.GRANITE_MoE), 1, meta={"model_name": "t"})
        w.write_config(_base_vals(vocab, hidden, heads, layers, inter) +
                       [kv, 0, K, E], fmt="15i")
        f.write(struct.pack("<4f", 0.015625, 8.0, 0.22, 10000.0))
        w._patch_offset(12)
        pieces, _ = _qwen_pieces()
        w.write_vocab_bpe([(p, 1) for p in pieces[:vocab]], [])

        from test_model_golden import _permute
        for i in range(layers):
            pfx = f"model.layers.{i}"
            # HF GraniteMoe: fused input_linear [E, 2*inter, H] (gate|up),
            # output_linear [E, H, inter] (GraniteMoEConverter.state_dict_pp)
            inp = sd[f"{pfx}.block_sparse_moe.input_linear.weight"]
            outp = sd[f"{pfx}.block_sparse_moe.output_linear.weight"]
            for j in range(E):
                w.write_tensor(f"{pfx}.block_sparse_moe.experts.{j}.gate_proj.weight",
                               inp[j, :inter], GGMLType.F32)
                w.write_tensor(f"{pfx}.block_sparse_moe.experts.{j}.up_proj.weight",
                               inp[j, inter:], GGMLType.F32)
                w.write_tensor(f"{pfx}.block_sparse_moe.experts.{j}.down_proj.weight",
                               outp[j], GGMLType.F32)
        names = ["model.embed_tokens.weight"]
        for i in range(layers):
            names += [f"model.layers.{i}.{n}" for n in [
                "block_sparse_moe.router.layer.weight",
                "input_layernorm.weight", "post_attention_layernorm.weight",
                "self_attn.k_proj.weight", "self_attn.o_proj.weight",
                "self_attn.q_proj.weight", "self_attn.v_proj.weight"]]
        names += ["model.norm.weight", "lm_head.weight"]
        for n in names:
            arr = sd[n]
            if n.endswith("q_proj.weight"):
                arr = _permute(arr, heads)
            elif n.endswith("k_proj.weight"):
                arr = _permute(arr, kv)
            w.write_tensor(n, arr, GGMLType.F32)
    model = load_model(path, RuntimeConfig(**RT32))
    assert abs(model.cfg.residual_scale - 0.22) < 1e-6
    ids = np.array([[5, 77, 101, 32, 9]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3, rtol=3e-3)


def test_seed_oss(tmp_path):
    from chatllm_tpu.ggmm.writer import GGMMWriter
    from test_qwen_vl import _pieces as _qwen_pieces

    vocab, hidden, heads, layers, inter, hd = 300, 64, 4, 2, 96, 24
    rng = np.random.default_rng(43)
    path = str(tmp_path / "seed.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.SEED), 1, meta={"model_name": "t"})
        w.write_config(_base_vals(vocab, hidden, heads, layers, inter,
                                  bos=2, eos=1) + [2, hd], fmt="13i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        pieces, _ = _qwen_pieces()
        w.write_vocab_bpe([(p, 1) for p in pieces[:vocab]], [])

        def wt(name, shape):
            w.write_tensor(name, rng.standard_normal(shape).astype(np.float32) * 0.05,
                           GGMLType.F32)

        wt("model.embed_tokens.weight", (vocab, hidden))
        for i in range(layers):
            pfx = f"model.layers.{i}"
            wt(f"{pfx}.input_layernorm.weight", (hidden,))
            for n, out in (("q_proj", heads * hd), ("k_proj", 2 * hd),
                           ("v_proj", 2 * hd)):
                wt(f"{pfx}.self_attn.{n}.weight", (out, hidden))
                wt(f"{pfx}.self_attn.{n}.bias", (out,))
            wt(f"{pfx}.self_attn.o_proj.weight", (hidden, heads * hd))
            wt(f"{pfx}.post_attention_layernorm.weight", (hidden,))
            wt(f"{pfx}.mlp.gate_proj.weight", (inter, hidden))
            wt(f"{pfx}.mlp.up_proj.weight", (inter, hidden))
            wt(f"{pfx}.mlp.down_proj.weight", (hidden, inter))
        wt("model.norm.weight", (hidden,))
        wt("lm_head.weight", (vocab, hidden))
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.resolved_head_dim() == hd and model.cfg.qkv_bias
    _smoke(model)
    ids = []
    model.tokenizer.chat_encoder.append_user(0, "hi", ids)
    assert ids[0] == 2 and ids[-1] == 1    # bos … eos framing


def test_phi2_v1_layout(tmp_path):
    """Phi-2 v1 GPT-style tensor names (transformer.h.*.mixer.*)."""
    from chatllm_tpu.ggmm.writer import GGMMWriter
    from test_qwen_vl import _pieces as _qwen_pieces

    vocab, hidden, heads, layers, inter = 300, 128, 2, 2, 96   # head_dim 64 > rot 32
    rng = np.random.default_rng(53)
    path = str(tmp_path / "phi2v1.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.DOLPHINPHI2), 1, meta={"model_name": "t"})
        w.write_config(_base_vals(vocab, hidden, heads, layers, inter),
                       fmt="11i")
        w._patch_offset(12)
        pieces, _ = _qwen_pieces()
        w.write_vocab_bpe([(p, 1) for p in pieces[:vocab]], [])

        def wt(name, shape):
            w.write_tensor(name, rng.standard_normal(shape).astype(np.float32) * 0.05,
                           GGMLType.F32)

        wt("transformer.embd.wte.weight", (vocab, hidden))
        for i in range(layers):
            pfx = f"transformer.h.{i}"
            wt(f"{pfx}.ln.weight", (hidden,))
            wt(f"{pfx}.ln.bias", (hidden,))
            for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
                wt(f"{pfx}.mixer.{n}.weight", (hidden, hidden))
                wt(f"{pfx}.mixer.{n}.bias", (hidden,))
            wt(f"{pfx}.mlp.fc1.weight", (inter, hidden))
            wt(f"{pfx}.mlp.fc1.bias", (inter,))
            wt(f"{pfx}.mlp.fc2.weight", (hidden, inter))
            wt(f"{pfx}.mlp.fc2.bias", (hidden,))
        wt("lm_head.ln.weight", (hidden,))
        wt("lm_head.ln.bias", (hidden,))
        wt("lm_head.linear.weight", (vocab, hidden))
        wt("lm_head.linear.bias", (vocab,))
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.parallel_residual and model.cfg.rope.rot_dim == 32
    _smoke(model)
