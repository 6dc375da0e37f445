"""Logit lens: decode intermediate hidden states through the unembedding.

Reference: lens support in HeterogeneousModel
(/root/reference/src/models.h:87-129, docs/lens.md, scripts/convert_j_lens.py).
Supports the identity lens (final-norm + lm_head applied to every layer's
hidden state) and linear lenses (per-layer affine map loaded from a lens
GGMM file produced by the reference's convert_j_lens.py).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..nn.transformer import (TransformerConfig, _norm, decoder_layer,
                              embed_tokens, init_cache, lm_logits,
                              precompute_rope_cache)


def load_lens_file(path: str):
    """Load per-layer linear lenses from a lens GGMM (reference
    scripts/convert_j_lens.py writes `lens.{i}.weight` [+ .bias]).
    Returns {layer_idx: {"w": [H,H], "b": [H]|None}}."""
    from ..ggmm.reader import GGMMFile

    gf = GGMMFile.open(path)
    out = {}
    i = 0
    while gf.has_tensor(f"lens.{i}.weight"):
        lp = {"w": jnp.asarray(gf.tensor_f32(f"lens.{i}.weight").T)}
        if gf.has_tensor(f"lens.{i}.bias"):
            lp["b"] = jnp.asarray(gf.tensor_f32(f"lens.{i}.bias"))
        out[i] = lp
        i += 1
    return out


def lens_logits(model, input_ids, *, lens_params=None, top_k: int = 8):
    """Run one forward pass collecting per-layer logits for the LAST token.

    Returns {"logits": [n_layers+1, V] (layers then final), "top": list of
    [(token_id, prob), ...] per layer}.  `lens_params` (optional) is a list
    of per-layer {"w": [H,H], "b": [H]} affine lenses; None = identity lens.
    """
    cfg: TransformerConfig = model.cfg
    params = model.params
    ids = jnp.asarray(np.atleast_2d(np.asarray(input_ids, np.int32)))
    B, T = ids.shape
    cache = init_cache(cfg, B, T)

    @jax.jit
    def run(params, ids, cache):
        x = embed_tokens(cfg, params, ids)
        positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        cos, sin = precompute_rope_cache(positions, cfg.rope)
        ks, vs = list(cache.k), list(cache.v)
        quant = cache.k_scale is not None
        kss = list(cache.k_scale) if quant else [None] * cfg.num_hidden_layers
        vss = list(cache.v_scale) if quant else [None] * cfg.num_hidden_layers
        per_layer = []
        for i in range(cfg.num_hidden_layers):
            spec = cfg.layer_spec(i)
            x, ks[i], vs[i], kss[i], vss[i] = decoder_layer(
                cfg, spec, params["layers"][i], x, cos, sin, ks[i], vs[i], 0,
                kss[i], vss[i])
            h = x[:, -1:, :]
            if lens_params is not None:
                lp = (lens_params.get(i) if hasattr(lens_params, "get")
                      else lens_params[i])
                if lp is not None:
                    h = jnp.dot(h, lp["w"]) + lp.get("b", 0.0)
            h = _norm(cfg, h, params["final_norm"])
            per_layer.append(lm_logits(cfg, params, h)[:, 0, :])
        x = _norm(cfg, x, params["final_norm"])
        final = lm_logits(cfg, params, x[:, -1:, :])[:, 0, :]
        per_layer.append(final)
        return jnp.stack(per_layer, axis=0)[:, 0, :]   # [L+1, V]

    logits = np.asarray(run(params, ids, cache))
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    top = []
    for layer in np.asarray(probs):
        order = np.argsort(-layer)[:top_k]
        top.append([(int(t), float(layer[t])) for t in order])
    return {"logits": logits, "top": top}


def format_lens(model, result) -> str:
    """Human-readable per-layer top-token table."""
    lines = []
    for li, row in enumerate(result["top"]):
        label = f"layer {li:3d}" if li < len(result["top"]) - 1 else "final    "
        toks = "  ".join(f"{model.tokenizer.decode_id(t)!r}:{p:.3f}"
                         for t, p in row[:4])
        lines.append(f"{label} | {toks}")
    return "\n".join(lines)
