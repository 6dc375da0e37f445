"""ChatGLM-6B (v1): 2D rope vs a direct numpy port of the reference custom
op (src/custom_ops.cpp:383-534), the GLM residual block, tokenizer text
transforms, and end-to-end generation with the position boundary."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model
from chatllm_tpu.ops.rope import vision_rope_cos_sin, apply_rope
from chatllm_tpu.runtime.generate import GenerationConfig

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")


def ref_chatglm1_rope(x, positions, n_ctx, base=10000.0):
    """Direct port of ggml_compute_forward_chatglm1_rope_f32
    (custom_ops.cpp:383-447): x [T, H, D], per-token scalar position p;
    first D/2 dims rotated with min(p, n_ctx-2), second D/2 with
    max(p - (n_ctx-2), 0); pairing (i, i+D/4) within each half."""
    T, H, D = x.shape
    n_dims = D // 2
    theta_scale = base ** (-2.0 / n_dims)
    out = x.copy()
    for t in range(T):
        p = positions[t]
        theta = float(min(p, n_ctx - 2))
        block = float(max(p - (n_ctx - 2), 0))
        for i0 in range(D // 4):
            c, s = np.cos(theta), np.sin(theta)
            cb, sb = np.cos(block), np.sin(block)
            theta *= theta_scale
            block *= theta_scale
            for h in range(H):
                x0 = x[t, h, i0]
                x1 = x[t, h, i0 + n_dims // 2]
                x2 = x[t, h, i0 + n_dims]
                x3 = x[t, h, i0 + n_dims // 2 * 3]
                out[t, h, i0] = x0 * c - x1 * s
                out[t, h, i0 + n_dims // 2] = x0 * s + x1 * c
                out[t, h, i0 + n_dims] = x2 * cb - x3 * sb
                out[t, h, i0 + n_dims // 2 * 3] = x2 * sb + x3 * cb
    return out


def test_glm1_rope_matches_reference_op():
    rng = np.random.default_rng(0)
    T, H, D = 5, 2, 16
    n_ctx = 4
    x = rng.standard_normal((T, H, D)).astype(np.float32)
    pos = np.arange(T)
    ref = ref_chatglm1_rope(x, pos, n_ctx)

    b = n_ctx - 2
    pos_a = np.minimum(pos, b)[None, :]
    pos_b = np.maximum(pos - b, 0)[None, :]
    cos, sin = vision_rope_cos_sin(jnp.asarray(pos_a), jnp.asarray(pos_b), D)
    got = apply_rope(jnp.asarray(x)[None], cos, sin, layout="glm1")
    np.testing.assert_allclose(np.asarray(got)[0], ref, atol=1e-5)


@pytest.fixture(scope="module")
def glm1_model(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("glm1")
    rng = np.random.default_rng(7)
    V, H, L, F = 260, 32, 2, 64
    path = str(tmp / "glm1.bin")

    def t(shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.CHATGLM), 1, meta={})
        w.write_config([int(GGMLType.F32), V, H, 2, L, F, 64,
                        -1, -1, -1, -1], fmt="11i")
        w._patch_offset(12)
        toks = [(chr(b).encode(), -float(b)) for b in range(V - 6)]
        toks += [(s.encode(), -900.0 - i) for i, s in enumerate(
            ["<sop>", "<eop>", "[MASK]", "[gMASK]", "<pad>", "<n>"])]
        w.write_vocab_sp(toks)
        w.write_tensor("transformer.word_embeddings.weight", t((V, H)), GGMLType.F32)
        for i in range(L):
            pfx = f"transformer.layers.{i}"
            for n in ("input_layernorm", "post_attention_layernorm"):
                w.write_tensor(f"{pfx}.{n}.weight", np.ones(H, np.float32), GGMLType.F32)
                w.write_tensor(f"{pfx}.{n}.bias", t((H,)), GGMLType.F32)
            w.write_tensor(f"{pfx}.attention.query_key_value.weight", t((3 * H, H)), GGMLType.F32)
            w.write_tensor(f"{pfx}.attention.query_key_value.bias", t((3 * H,)), GGMLType.F32)
            w.write_tensor(f"{pfx}.attention.dense.weight", t((H, H)), GGMLType.F32)
            w.write_tensor(f"{pfx}.attention.dense.bias", t((H,)), GGMLType.F32)
            w.write_tensor(f"{pfx}.mlp.dense_h_to_4h.weight", t((F, H)), GGMLType.F32)
            w.write_tensor(f"{pfx}.mlp.dense_h_to_4h.bias", t((F,)), GGMLType.F32)
            w.write_tensor(f"{pfx}.mlp.dense_4h_to_h.weight", t((H, F)), GGMLType.F32)
            w.write_tensor(f"{pfx}.mlp.dense_4h_to_h.bias", t((H,)), GGMLType.F32)
        w.write_tensor("transformer.final_layernorm.weight", np.ones(H, np.float32), GGMLType.F32)
        w.write_tensor("transformer.final_layernorm.bias", t((H,)), GGMLType.F32)
    return load_model(path, RuntimeConfig(**RT32))


def test_glm1_tokenizer_transforms(glm1_model):
    tok = glm1_model.tokenizer
    ids = tok.encode("a\nb  c")
    assert ids[0] == tok.gmask_token_id and ids[1] == tok.bos_token_id
    text = tok.tp.decode(ids[2:])
    assert "<n>" in text and "<|blank_2|>" in text
    # decode inverts
    assert tok.decode(ids[2:]) == "a\nb  c"


def test_glm1_generation(glm1_model):
    model = glm1_model
    assert model.cfg.glm1_residual
    assert model.cfg.rope.layout == "glm1"
    gcfg = GenerationConfig(do_sample=False, sampling="greedy",
                            max_new_tokens=6, temperature=0.0)
    ids = model.tokenizer.encode("你好")
    out, _, _ = model.engine.generate(ids, gcfg)
    assert model.engine.pos_delta == len(ids) - 2   # boundary = prompt-2
    assert len(out) >= 1
    # deterministic
    out2, _, _ = model.engine.generate(ids, gcfg)
    assert out == out2
