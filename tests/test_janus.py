"""Janus-Pro HF-golden: VQ-16 decoder, SigLIP tower + aligner, gen head,
and an end-to-end tiny image generation (reference models/janus.cpp)."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RT32 = dict(weight_dtype="float32", compute_dtype="float32",
            cache_dtype="float32")

VOCAB, HID, HEADS, LAYERS, INTER = 300, 64, 4, 2, 96
VH, VL, VHEADS, PATCH, IMG = 32, 2, 2, 8, 32
VQ_EMBED, VQ_CODES, VQ_CH, VQ_MULT = 8, 32, 32, [1, 2]
GEN_TOK_EMBED = 64   # HF ties head input/intermediate dims; = HID like real Janus


def make_tiny_janus(path):
    torch.manual_seed(23)
    cfg = transformers.JanusConfig(
        text_config=dict(
            vocab_size=VOCAB, hidden_size=HID, num_attention_heads=HEADS,
            num_key_value_heads=HEADS, num_hidden_layers=LAYERS,
            intermediate_size=INTER, max_position_embeddings=512,
            rms_norm_eps=1e-6, tie_word_embeddings=False,
            bos_token_id=1, eos_token_id=2),
        vision_config=dict(
            hidden_size=VH, num_hidden_layers=VL, num_attention_heads=VHEADS,
            image_size=IMG, patch_size=PATCH),
        vq_config=dict(
            embed_dim=VQ_EMBED, num_embeddings=VQ_CODES,
            base_channels=VQ_CH, channel_multiplier=VQ_MULT,
            latent_channels=VQ_CH, resolution=IMG, num_patches=4,
            projection_dim=HID, image_token_embed_dim=GEN_TOK_EMBED))
    hf = transformers.JanusForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    meta = {
        "config.json": {
            "vision_config": {"params": {
                "width": VH, "layers": VL, "heads": VHEADS,
                "mlp_ratio": sd["model.vision_model.encoder.layers.0.mlp.fc1.weight"].shape[0] / VH,
                "patch_size": PATCH, "image_size": IMG,
                "model_name": "siglip_large_patch16_384"}},
            "gen_head_config": {"params": {
                "n_embed": HID, "image_token_embed": GEN_TOK_EMBED,
                "image_token_size": VQ_CODES}},
            "gen_vision_config": {"cls": "VQ-16",
                                  "params": {"n_embed": VQ_EMBED}},
        },
    }

    def wt(w, name, arr):
        w.write_tensor(name, np.ascontiguousarray(arr, np.float32),
                       GGMLType.F32)

    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.JANUS_PRO), 1, meta=meta)
        w.write_config([int(GGMLType.F32), VOCAB, HID, HEADS, LAYERS, INTER,
                        512, 1, 2, -1, -1], fmt="11i")
        # deepseek v1 tokenizer: BPE1 (SP-score) vocab
        toks = [(b"<unk>", -10.0),
                (b"<\xef\xbd\x9cbegin\xe2\x96\x81of\xe2\x96\x81sentence\xef\xbd\x9c>", -9.0),
                (b"<\xef\xbd\x9cend\xe2\x96\x81of\xe2\x96\x81sentence\xef\xbd\x9c>", -9.0),
                (b"<begin_of_image>", -9.0), (b"<end_of_image>", -9.0),
                (b"<\xef\xbd\x9c\xe2\x96\x81pad\xe2\x96\x81\xef\xbd\x9c>", -9.0)]
        import string

        from chatllm_tpu.tokenizer.processor import byte_level_encode

        # BPE2 base pieces are byte-level-ENCODED (space -> \u0120 etc.)
        for ch in string.printable:
            toks.append((byte_level_encode(ch.encode()), -2.0))
        toks += [(f"<p{i}>".encode(), -20.0) for i in range(VOCAB - len(toks))]
        # janus inherits the deepseek v1 tokenizer = byte-BPE + merges
        # (janus.cpp:64, deepseek.cpp:22-36) — BPE-format vocab, not SP
        w.write_vocab_bpe([(t, 1) for t, _s in toks], [])

        # LM (llama names)
        wt(w, "model.embed_tokens.weight", sd["model.language_model.embed_tokens.weight"])
        for i in range(LAYERS):
            src = f"model.language_model.layers.{i}"
            dst = f"model.layers.{i}"
            for n in ["input_layernorm.weight",
                      "self_attn.q_proj.weight", "self_attn.k_proj.weight",
                      "self_attn.v_proj.weight", "self_attn.o_proj.weight",
                      "post_attention_layernorm.weight",
                      "mlp.gate_proj.weight", "mlp.up_proj.weight",
                      "mlp.down_proj.weight"]:
                wt(w, f"{dst}.{n}", sd[f"{src}.{n}"])
        wt(w, "model.norm.weight", sd["model.language_model.norm.weight"])
        wt(w, "lm_head.weight", sd["lm_head.weight"])

        # understanding tower: HF janus names -> reference on-disk names
        vm = "model.vision_model"
        wt(w, "vision_model.patch_embed.proj.weight",
           sd[f"{vm}.embeddings.patch_embedding.weight"])
        wt(w, "vision_model.patch_embed.proj.bias",
           sd[f"{vm}.embeddings.patch_embedding.bias"])
        wt(w, "vision_model.pos_embed",
           sd[f"{vm}.embeddings.position_embedding.weight"])
        wt(w, "vision_model.norm.weight", sd[f"{vm}.post_layernorm.weight"])
        wt(w, "vision_model.norm.bias", sd[f"{vm}.post_layernorm.bias"])
        for i in range(VL):
            src = f"{vm}.encoder.layers.{i}"
            dst = f"vision_model.layers.{i}"
            for a, b in [("self_attn.q_proj", "attn.q_proj"),
                         ("self_attn.k_proj", "attn.k_proj"),
                         ("self_attn.v_proj", "attn.v_proj"),
                         ("self_attn.projection_layer", "attn.o_proj"),
                         ("mlp.fc1", "mlp.fc0"), ("mlp.fc2", "mlp.fc1"),
                         ("layer_norm1", "norm1"), ("layer_norm2", "norm2")]:
                wt(w, f"{dst}.{b}.weight", sd[f"{src}.{a}.weight"])
                wt(w, f"{dst}.{b}.bias", sd[f"{src}.{a}.bias"])
        # aligners: HF fc1 = first linear, hidden_layers.0 = second
        wt(w, "aligner.fc0.weight", sd["model.aligner.fc1.weight"])
        wt(w, "aligner.fc0.bias", sd["model.aligner.fc1.bias"])
        wt(w, "aligner.fc1.weight", sd["model.aligner.hidden_layers.0.weight"])
        wt(w, "aligner.fc1.bias", sd["model.aligner.hidden_layers.0.bias"])
        wt(w, "gen_aligner.fc0.weight", sd["model.generation_aligner.fc1.weight"])
        wt(w, "gen_aligner.fc0.bias", sd["model.generation_aligner.fc1.bias"])
        wt(w, "gen_aligner.fc1.weight",
           sd["model.generation_aligner.hidden_layers.0.weight"])
        wt(w, "gen_aligner.fc1.bias",
           sd["model.generation_aligner.hidden_layers.0.bias"])
        wt(w, "gen_embed.weight", sd["model.generation_embeddings.weight"])
        wt(w, "gen_head.output_mlp_projector.weight",
           sd["model.generation_head.proj_out.weight"])
        wt(w, "gen_head.output_mlp_projector.bias",
           sd["model.generation_head.proj_out.bias"])
        wt(w, "gen_head.vision_head.weight",
           sd["model.generation_head.vision_head.weight"])
        wt(w, "gen_head.vision_head.bias",
           sd["model.generation_head.vision_head.bias"])

        # VQ decoder: HF vqmodel names -> reference on-disk names
        vq = "model.vqmodel"
        for a in ["decoder.conv_in", "decoder.norm_out", "decoder.conv_out",
                  "post_quant_conv"]:
            wt(w, f"gen_vision_model.{a}.weight", sd[f"{vq}.{a}.weight"])
            wt(w, f"gen_vision_model.{a}.bias", sd[f"{vq}.{a}.bias"])
        wt(w, "gen_vision_model.quantize.embedding.weight",
           sd[f"{vq}.quantize.embedding.weight"])

        def res_block(src, dst):
            for sub in ["norm1", "conv1", "norm2", "conv2", "nin_shortcut"]:
                if f"{src}.{sub}.weight" in sd:
                    wt(w, f"{dst}.{sub}.weight", sd[f"{src}.{sub}.weight"])
                    wt(w, f"{dst}.{sub}.bias", sd[f"{src}.{sub}.bias"])

        def attn_block(src, dst):
            for a, b in [("norm", "norm"), ("q", "q_proj"), ("k", "k_proj"),
                         ("v", "v_proj"), ("proj_out", "o_proj")]:
                wt(w, f"{dst}.{b}.weight", sd[f"{src}.{a}.weight"])
                wt(w, f"{dst}.{b}.bias", sd[f"{src}.{a}.bias"])

        res_block(f"{vq}.decoder.mid.block_1", "gen_vision_model.decoder.mid.0")
        attn_block(f"{vq}.decoder.mid.attn_1", "gen_vision_model.decoder.mid.1")
        res_block(f"{vq}.decoder.mid.block_2", "gen_vision_model.decoder.mid.2")
        for lvl in range(len(VQ_MULT)):
            for j in range(3):
                res_block(f"{vq}.decoder.up.{lvl}.block.{j}",
                          f"gen_vision_model.decoder.conv_blocks.{lvl}.res.{j}")
                if f"{vq}.decoder.up.{lvl}.attn.{j}.norm.weight" in sd:
                    attn_block(f"{vq}.decoder.up.{lvl}.attn.{j}",
                               f"gen_vision_model.decoder.conv_blocks.{lvl}.attn.{j}")
            if f"{vq}.decoder.up.{lvl}.upsample.conv.weight" in sd:
                wt(w, f"gen_vision_model.decoder.conv_blocks.{lvl}.upsample.conv.weight",
                   sd[f"{vq}.decoder.up.{lvl}.upsample.conv.weight"])
                wt(w, f"gen_vision_model.decoder.conv_blocks.{lvl}.upsample.conv.bias",
                   sd[f"{vq}.decoder.up.{lvl}.upsample.conv.bias"])
    return hf


@pytest.fixture(scope="module")
def janus(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("janus") / "janus.bin")
    hf = make_tiny_janus(path)
    model = load_model(path, RuntimeConfig(**RT32))
    return hf, model


def test_janus_vq_decoder_golden(janus):
    hf, model = janus
    assert model.gen_params is not None
    from chatllm_tpu.nn.vqgan import vq_decode

    rng = np.random.default_rng(4)
    codes = rng.integers(0, VQ_CODES, (2, 16), dtype=np.int64)
    with torch.no_grad():
        ref = hf.model.vqmodel.decode(torch.from_numpy(codes)).numpy()
    ref = np.clip((np.transpose(ref, (0, 2, 3, 1)) + 1) * 0.5, 0, 1)
    ours = np.asarray(vq_decode(model.gen_params["vq"],
                                codes.astype(np.int32), (4, 4)))
    # conv accumulation-order noise; 1e-3 of the [0,1] pixel range
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=0)


def test_janus_tower_golden(janus):
    hf, model = janus
    rng = np.random.default_rng(6)
    px = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        ref = hf.model.get_image_features(torch.from_numpy(px)).numpy()
    ours = np.asarray(model.encode_images(np.transpose(px, (0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref.reshape(ours.shape),
                               atol=2e-4, rtol=2e-4)


def test_janus_generate_image(janus):
    _, model = janus
    imgs = model.generate_image("a cat", parallel_size=1, cfg_weight=5.0,
                                temperature=1.0, seed=0, grid=4)
    assert imgs.shape == (1, 8, 8, 3)   # grid 4, 2 levels -> 2x upsample
    assert np.isfinite(imgs).all()
    assert (imgs >= 0).all() and (imgs <= 1).all()
