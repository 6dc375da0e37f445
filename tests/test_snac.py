"""SNAC codec decoder tests (structure, shapes, streaming layout)."""
import numpy as np

import conftest  # noqa: F401

import jax.numpy as jnp

from chatllm_tpu.nn.snac import (SnacConfig, pyramid_order, snac_decode,
                                 snake1d)


def test_pyramid_order():
    assert pyramid_order(3) == [0, 1, 2, 2, 1, 2, 2]
    assert pyramid_order(2) == [0, 1, 1]


def _rand_params(cfg: SnacConfig, rng):
    def conv_w(out, cin, k):
        return jnp.asarray(rng.standard_normal((out, cin, k)).astype(np.float32) * 0.1)

    def bias(n):
        return jnp.asarray(np.zeros(n, np.float32))

    ch = cfg.decoder_dim
    dec = {
        "in0_w": conv_w(ch if cfg.depthwise else ch, 1 if cfg.depthwise else ch, 7),
        "in0_b": bias(ch),
        "out_snake": jnp.ones((ch // (1 << len(cfg.decoder_rates)),), jnp.float32),
    }
    if cfg.depthwise:
        dec["in1_w"] = conv_w(ch, ch, 1)
        dec["in1_b"] = bias(ch)
    for i, rate in enumerate(cfg.decoder_rates):
        cin = ch // (1 << i)
        cout = ch // (1 << (i + 1))
        groups = cout if cfg.depthwise else 1
        blk = {
            "snake": jnp.ones((cin,), jnp.float32),
            "up_w": conv_w(cin, cout, 2 * rate).transpose(0, 1, 2),
            "up_b": bias(cout),
        }
        # torch convT layout [in, out, k]
        blk["up_w"] = jnp.asarray(
            rng.standard_normal((cin, cout, 2 * rate)).astype(np.float32) * 0.1)
        if cfg.noise:
            blk["noise_w"] = conv_w(cout, cout, 1)
        for r in range(3):
            blk[f"res{r}"] = {
                "s0": jnp.ones((cout,), jnp.float32),
                "c1_w": conv_w(cout, cout // groups, 7),
                "c1_b": bias(cout),
                "s2": jnp.ones((cout,), jnp.float32),
                "c3_w": conv_w(cout, cout, 1),
                "c3_b": bias(cout),
            }
        dec[f"block{i}"] = blk
    out_ch = ch // (1 << len(cfg.decoder_rates))
    dec["out_w"] = conv_w(1, out_ch, 7)
    dec["out_b"] = bias(1)
    vq = []
    for s in cfg.vq_strides:
        vq.append({
            "codebook": jnp.asarray(
                rng.standard_normal((cfg.codebook_size, cfg.codebook_dim)).astype(np.float32)),
            "out_w": conv_w(ch, cfg.codebook_dim, 1), "out_b": bias(ch),
            "in_w": conv_w(cfg.codebook_dim, ch, 1), "in_b": bias(cfg.codebook_dim),
        })
    return {"decoder": dec, "vq": vq}


def test_snac_decode_shapes():
    rng = np.random.default_rng(0)
    cfg = SnacConfig(decoder_dim=32, decoder_rates=(4, 2), codebook_size=64,
                     codebook_dim=8, vq_strides=(2, 1), noise=True,
                     depthwise=False)
    params = _rand_params(cfg, rng)
    # one "frame" = 3 tokens at 2 levels → coarse 1, fine 2 per frame
    n_frames = 4
    codes = [list(rng.integers(0, 64, n_frames)),          # coarse
             list(rng.integers(0, 64, 2 * n_frames))]      # fine
    wave = np.asarray(snac_decode(cfg, params, codes))
    # upsampling factor = prod(rates) = 8, finest length = 8
    assert wave.shape == (8 * n_frames * 2,)
    assert np.all(np.abs(wave) <= 1.0)


def test_snake_identity_at_zero():
    x = jnp.zeros((4, 8))
    out = np.asarray(snake1d(x, jnp.ones((8,))))
    np.testing.assert_allclose(out, 0.0)


def test_orpheus_token_frame_unpack():
    from chatllm_tpu.models.orpheus import CUSTOM_TOKEN_START, OrpheusTTS

    cfg = SnacConfig()
    # 7 tokens/frame with per-position codebook offsets
    fs = cfg.frame_tokens
    llm_toks = []
    for f in range(4):
        for pos in range(fs):
            llm_toks.append(CUSTOM_TOKEN_START + pos * cfg.codebook_size + (f * 7 + pos))
    # decode path: strip offsets → values 0..27ish in pyramid order
    ids = []
    for t in llm_toks:
        v = (t - CUSTOM_TOKEN_START) - (len(ids) % fs) * cfg.codebook_size
        assert v >= 0
        ids.append(v)
    assert ids == [f * 7 + p for f in range(4) for p in range(7)]


def test_maya1_prompt_and_token_mod():
    """Maya1 (maya.cpp): <description> prompt framing + mod-codebook codec
    id reduction."""
    from chatllm_tpu.models.orpheus import CUSTOM_TOKEN_START, Maya1

    cfg = SnacConfig()
    fs = cfg.frame_tokens
    llm = [CUSTOM_TOKEN_START + pos * cfg.codebook_size + (7 * f + pos)
           for f in range(2) for pos in range(fs)]
    ids = [(t - CUSTOM_TOKEN_START) % cfg.codebook_size for t in llm]
    assert ids == [7 * f + p for f in range(2) for p in range(7)]
    assert "voice-design" in (Maya1.__doc__ or "")
    assert "american accent" in Maya1.DEFAULT_VOICE
