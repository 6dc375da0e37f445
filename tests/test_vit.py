"""ViT tower golden test vs HF SiglipVisionModel."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from chatllm_tpu.nn.vit import ViTConfig, vit_forward


def test_siglip_tower_matches_hf():
    torch.manual_seed(21)
    hidden, layers, heads, inter, patch, img = 64, 2, 4, 128, 16, 64
    cfg_hf = transformers.SiglipVisionConfig(
        hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=inter,
        patch_size=patch, image_size=img, num_channels=3,
        layer_norm_eps=1e-6, hidden_act="gelu_pytorch_tanh",
        vision_use_head=False)
    hf = transformers.SiglipVisionModel(cfg_hf).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    pfx = "vision_model."

    cfg = ViTConfig(hidden_size=hidden, num_hidden_layers=layers,
                    num_attention_heads=heads, intermediate_size=inter,
                    patch_size=patch, image_size=img)

    def lin(name):
        from chatllm_tpu.ops.qtensor import DenseLinear

        return DenseLinear(
            w=jnp.asarray(sd[pfx + name + ".weight"].T),
            bias=jnp.asarray(sd[pfx + name + ".bias"]))

    params = {
        "embed": {
            # HF conv weight is [out, in, kh, kw] -> HWIO
            "proj_w": jnp.asarray(np.transpose(
                sd[pfx + "embeddings.patch_embedding.weight"], (2, 3, 1, 0))),
            "proj_b": jnp.asarray(sd[pfx + "embeddings.patch_embedding.bias"]),
            "pos": jnp.asarray(sd[pfx + "embeddings.position_embedding.weight"]),
        },
        "post_norm": {"w": jnp.asarray(sd[pfx + "post_layernorm.weight"]),
                      "b": jnp.asarray(sd[pfx + "post_layernorm.bias"])},
        "layers": [],
    }
    for i in range(layers):
        lp = f"encoder.layers.{i}."
        params["layers"].append({
            "norm1": {"w": jnp.asarray(sd[pfx + lp + "layer_norm1.weight"]),
                      "b": jnp.asarray(sd[pfx + lp + "layer_norm1.bias"])},
            "attn": {
                "q": lin(lp + "self_attn.q_proj"),
                "k": lin(lp + "self_attn.k_proj"),
                "v": lin(lp + "self_attn.v_proj"),
                "o": lin(lp + "self_attn.out_proj"),
            },
            "norm2": {"w": jnp.asarray(sd[pfx + lp + "layer_norm2.weight"]),
                      "b": jnp.asarray(sd[pfx + lp + "layer_norm2.bias"])},
            "mlp": {"fc0": lin(lp + "mlp.fc1"), "fc1": lin(lp + "mlp.fc2")},
        })

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, img, img, 3)).astype(np.float32)
    ours = np.asarray(vit_forward(cfg, params, jnp.asarray(pixels)))
    with torch.no_grad():
        ref = hf(torch.from_numpy(np.transpose(pixels, (0, 3, 1, 2)))
                 ).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=3e-4)


def test_pixel_shuffle_shape():
    from chatllm_tpu.nn.vit import pixel_shuffle

    x = jnp.arange(2 * 16 * 8, dtype=jnp.float32).reshape(2, 16, 8)
    y = pixel_shuffle(x, 4, 4, 0.5)
    assert y.shape == (2, 4, 32)
