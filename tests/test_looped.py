"""Looped/recurrent layer stacks (num_loops: Nanbeige LoopModel, Ouro):
parity with a manually-unrolled stack, per-loop KV cache independence,
and the Nanbeige/Ouro/Mellum loader registrations."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model
from chatllm_tpu.models.synthetic import tiny_config
from chatllm_tpu.models.synthetic import build_synthetic_params
from chatllm_tpu.nn.transformer import init_cache, transformer_forward
from dataclasses import replace

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")


def test_loops_match_unrolled_stack():
    """num_loops=2 with skip_loop_final_norm == the same layers repeated
    twice explicitly."""
    cfg = tiny_config(vocab=64, hidden=32, layers=2, heads=2, kv_heads=2,
                      inter=48, max_length=64)
    params = build_synthetic_params(cfg, "f32", zeros=False,
                                    compute_dtype=jnp.float32)
    ids = np.array([[3, 9, 1, 7]], dtype=np.int32)

    looped = replace(cfg, num_loops=2, skip_loop_final_norm=True)
    cache_l = init_cache(looped, 1, 16)
    assert len(cache_l.k) == 4                      # 2 layers x 2 loops
    y_l, _ = transformer_forward(looped, params, jnp.asarray(ids), cache_l, 0)

    unrolled = replace(cfg, num_hidden_layers=4)
    params_u = dict(params)
    params_u["layers"] = params["layers"] + params["layers"]
    cache_u = init_cache(unrolled, 1, 16)
    y_u, _ = transformer_forward(unrolled, params_u, jnp.asarray(ids), cache_u, 0)

    np.testing.assert_allclose(np.asarray(y_l), np.asarray(y_u), atol=1e-5)


def test_loops_with_final_norm_between():
    cfg = tiny_config(vocab=64, hidden=32, layers=2, heads=2, kv_heads=2,
                      inter=48, max_length=64)
    params = build_synthetic_params(cfg, "f32", zeros=False,
                                    compute_dtype=jnp.float32)
    ids = np.array([[3, 9, 1]], dtype=np.int32)
    looped = replace(cfg, num_loops=3)
    cache = init_cache(looped, 1, 16)
    y, cache = transformer_forward(looped, params, jnp.asarray(ids), cache, 0)
    assert np.isfinite(np.asarray(y)).all()
    # incremental decode through the looped caches stays consistent
    y2, _ = transformer_forward(looped, params, jnp.asarray([[5]]), cache, 3)
    assert np.isfinite(np.asarray(y2)).all()


def test_nanbeige_loader(tmp_path):
    torch.manual_seed(21)
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, tie_word_embeddings=False,
        attention_bias=False)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    from test_zoo_wave2 import _llama_weights, _sp_pieces

    path = str(tmp_path / "nb.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.NANBEIGE), 1,
                       meta={"tokenizer_config.json": {
                           "added_tokens_decoder": {
                               "254": {"content": "<|im_start|>"},
                               "255": {"content": "<|im_end|>"}}}})
        w.write_config([int(GGMLType.F32), 256, 64, 4, 2, 96, 128,
                        1, 2, -1, -1,
                        2, 16, 2, 0, 0], fmt="16i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        w.write_vocab_sp(_sp_pieces())
        _llama_weights(w, sd, 2, permute_heads=(4, 2))
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.num_loops == 2
    assert model.tokenizer.im_start_token_id == 254
    logits, cache = model.forward_logits(np.array([[5, 9, 11]], np.int32))
    assert len(cache.k) == 4
    assert np.isfinite(np.asarray(logits)).all()

    # --set num_loops 1 drops the extra loop
    m1 = load_model(path, RuntimeConfig(additional={"num_loops": "1"}, **RT32))
    assert m1.cfg.num_loops == 1


def test_ouro_loader(tmp_path):
    torch.manual_seed(22)
    V = 256
    rng = np.random.default_rng(0)
    path = str(tmp_path / "ouro.bin")
    from test_model_golden import _bpe_pieces

    H, L, F = 32, 2, 48
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.OURO), 1, meta={})
        w.write_config([int(GGMLType.F32), V, H, 2, L, F, 64,
                        1, 2, -1, -1, 2], fmt="12i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        pieces = [(p, 1) for p in _bpe_pieces(V)]
        pieces[V - 3] = (b"<|endoftext|>", 4)
        pieces[V - 2] = (b"<|im_start|>", 4)
        pieces[V - 1] = (b"<|im_end|>", 4)
        w.write_vocab_bpe(pieces, [])

        def t(shape):
            return (rng.standard_normal(shape) * 0.05).astype(np.float32)

        w.write_tensor("model.embed_tokens.weight", t((V, H)), GGMLType.F32)
        for i in range(L):
            pfx = f"model.layers.{i}"
            for n in ("input_layernorm", "input_layernorm_2",
                      "post_attention_layernorm", "post_attention_layernorm_2"):
                w.write_tensor(f"{pfx}.{n}.weight", np.ones(H, np.float32),
                               GGMLType.F32)
            w.write_tensor(f"{pfx}.self_attn.q_proj.weight", t((H, H)), GGMLType.F32)
            w.write_tensor(f"{pfx}.self_attn.k_proj.weight", t((H, H)), GGMLType.F32)
            w.write_tensor(f"{pfx}.self_attn.v_proj.weight", t((H, H)), GGMLType.F32)
            w.write_tensor(f"{pfx}.self_attn.o_proj.weight", t((H, H)), GGMLType.F32)
            w.write_tensor(f"{pfx}.mlp.gate_proj.weight", t((F, H)), GGMLType.F32)
            w.write_tensor(f"{pfx}.mlp.up_proj.weight", t((F, H)), GGMLType.F32)
            w.write_tensor(f"{pfx}.mlp.down_proj.weight", t((H, F)), GGMLType.F32)
        w.write_tensor("model.norm.weight", np.ones(H, np.float32), GGMLType.F32)
        w.write_tensor("lm_head.weight", t((V, H)), GGMLType.F32)
        w.write_tensor("model.early_exit_gate.weight", t((1, H)), GGMLType.F32)
        w.write_tensor("model.early_exit_gate.bias", t((1,)), GGMLType.F32)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.num_loops == 4
    assert model.cfg.post_norms
    logits, cache = model.forward_logits(np.array([[5, 9]], np.int32))
    assert len(cache.k) == 8                    # 2 layers x 4 steps
    assert np.isfinite(np.asarray(logits)).all()

    m2 = load_model(path, RuntimeConfig(additional={"total_ut_steps": "2"}, **RT32))
    assert m2.cfg.num_loops == 2


def test_mellum_registered():
    from chatllm_tpu.models.base import lookup_model
    from chatllm_tpu.models.misc_wave2 import Mellum

    assert lookup_model(int(ModelType.MELLUM)) is Mellum


def test_layer_spec_remap(tmp_path):
    """--layer_spec '0:2,0:2' doubles the stack with aliased weights
    (reference set_layer_ids, src/chat.h:988, --layer_spec main.cpp:169)."""
    from test_model_golden import make_tiny_llama3

    path = str(tmp_path / "l3.bin")
    hf = make_tiny_llama3(path)
    base = load_model(path, RuntimeConfig(**RT32))
    dup = load_model(path, RuntimeConfig(layer_spec="0:2,0:2", **RT32))
    assert dup.cfg.num_hidden_layers == 4
    assert dup.params["layers"][2] is dup.params["layers"][0]
    # selection: single layer
    one = load_model(path, RuntimeConfig(layer_spec="1", **RT32))
    assert one.cfg.num_hidden_layers == 1
    logits, _ = dup.forward_logits(np.array([[5, 9, 11]], np.int32))
    assert np.isfinite(np.asarray(logits)).all()

    from chatllm_tpu.models.base import parse_layer_spec
    assert parse_layer_spec("0:3,1:4", 8) == [0, 1, 2, 1, 2, 3]
    with pytest.raises(ValueError):
        parse_layer_spec("7:9", 8)
