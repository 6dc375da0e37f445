"""Synthetic (random/zero-weight) models of real architectures.

Used by bench.py (perf on N-billion-param shapes without a checkpoint file),
__graft_entry__.py (compile checks, multi-chip dryrun), and sharding tests.
The device layouts are identical to loader output, so measured kernels are
the production kernels.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn.transformer import LayerSpec, TransformerConfig
from ..ops.qtensor import DenseLinear, QuantLinear
from ..ops.rope import ROPE_NEOX, RopeConfig


def synth_linear(n_in: int, n_out: int, fmt: str, *, bias: bool = False,
                 rng=None, zeros: bool = True):
    """Build a linear layer in the given device format:
    'q4k' = superblock QuantLinear (int8 sc/m + f16 d/dmin, the q4_k loader
    layout), 'q4'/'q8' = grouped-affine QuantLinear, 'bf16'/'f32' = dense."""
    G = 32
    if fmt == "q4k" and n_in % 256 != 0:
        fmt = "q4"                # same gate as the q4_k loader (in % QK_K)
    if fmt == "q4k":
        SB = 8
        if zeros:
            q = jnp.zeros((n_in // 2, n_out), jnp.uint8)
            sc = jnp.full((n_in // G, n_out), 20, jnp.int8)
            m = jnp.full((n_in // G, n_out), 10, jnp.int8)
            d = jnp.full((n_in // (G * SB), n_out), 0.001, jnp.float16)
            dm = jnp.full((n_in // (G * SB), n_out), 0.0005, jnp.float16)
        else:
            rng = rng or np.random.default_rng(0)
            q = jnp.asarray(rng.integers(0, 255, (n_in // 2, n_out),
                                         dtype=np.uint8))
            sc = jnp.asarray(rng.integers(0, 64, (n_in // G, n_out),
                                          dtype=np.int8))
            m = jnp.asarray(rng.integers(0, 64, (n_in // G, n_out),
                                         dtype=np.int8))
            d = jnp.asarray(rng.random((n_in // (G * SB), n_out))
                            .astype(np.float16) * np.float16(0.002))
            dm = jnp.asarray(rng.random((n_in // (G * SB), n_out))
                             .astype(np.float16) * np.float16(0.001))
        return QuantLinear(q=q, s=sc, b=m, packed=True, d=d, dm=dm, sb=SB,
                           bias=jnp.zeros((n_out,), jnp.float32) if bias else None)
    if fmt in ("q4", "q8"):
        packed = fmt == "q4"
        rows = n_in // 2 if packed else n_in
        qdt = jnp.uint8 if packed else jnp.int8
        if zeros:
            q = jnp.zeros((rows, n_out), qdt)
            s = jnp.full((n_in // G, n_out), 0.01, jnp.float16)
        else:
            rng = rng or np.random.default_rng(0)
            if packed:
                q = jnp.asarray(rng.integers(0, 255, (rows, n_out), dtype=np.uint8))
            else:
                q = jnp.asarray(rng.integers(-127, 127, (rows, n_out), dtype=np.int8))
            s = jnp.asarray((rng.random((n_in // G, n_out)).astype(np.float16) * np.float16(0.01)))
        b = jnp.zeros((n_in // G, n_out), jnp.float16) if fmt == "q4" else None
        return QuantLinear(q=q, s=s, b=b, packed=packed,
                           bias=jnp.zeros((n_out,), jnp.float32) if bias else None)
    dt = jnp.bfloat16 if fmt == "bf16" else jnp.float32
    if zeros:
        w = jnp.zeros((n_in, n_out), dt)
    else:
        rng = rng or np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((n_in, n_out)).astype(np.float32) * 0.02, dtype=dt)
    return DenseLinear(w=w, bias=jnp.zeros((n_out,), jnp.float32) if bias else None)


def build_synthetic_params(cfg: TransformerConfig, fmt: str = "q4", *,
                           zeros: bool = True, qkv_bias: bool = False,
                           compute_dtype=jnp.bfloat16, seed: int = 0):
    rng = np.random.default_rng(seed)
    H = cfg.hidden_size
    d = cfg.resolved_head_dim()
    qo = cfg.num_attention_heads * d
    kvo = cfg.num_key_value_heads * d
    F = cfg.intermediate_size

    def lin(i, o, bias=False):
        return synth_linear(i, o, fmt, bias=bias, rng=rng, zeros=zeros)

    if zeros:
        embed = jnp.zeros((cfg.vocab_size, H), compute_dtype)
    else:
        embed = jnp.asarray(rng.standard_normal((cfg.vocab_size, H)).astype(np.float32) * 0.02,
                            dtype=compute_dtype)
    params = {"embed": embed, "final_norm": {"w": jnp.ones((H,), jnp.float32)}, "layers": []}
    for i in range(cfg.num_hidden_layers):
        spec = cfg.layer_spec(i)
        attn = {
            "q": lin(H, qo, qkv_bias), "k": lin(H, kvo, qkv_bias),
            "v": lin(H, kvo, qkv_bias), "o": lin(qo, H),
        }
        if cfg.qk_norm != "none":
            attn["q_norm"] = {"w": jnp.ones((d,), jnp.float32)}
            attn["k_norm"] = {"w": jnp.ones((d,), jnp.float32)}
        if spec.is_moe:
            E = cfg.moe_num_experts
            me = cfg.intermediate_size
            mlp = {
                "gate": synth_linear(H, E, "bf16", rng=rng, zeros=zeros),
                "experts": {
                    "gate": jnp.zeros((E, H, me), compute_dtype),
                    "up": jnp.zeros((E, H, me), compute_dtype),
                    "down": jnp.zeros((E, me, H), compute_dtype),
                },
            }
        else:
            mlp = {"gate": lin(H, F), "up": lin(H, F), "down": lin(F, H)}
        params["layers"].append({
            "attn_norm": {"w": jnp.ones((H,), jnp.float32)},
            "attn": attn,
            "ffn_norm": {"w": jnp.ones((H,), jnp.float32)},
            "mlp": mlp,
        })
    params["layers"] = tuple(params["layers"])
    if not cfg.tie_lm_head:
        params["lm_head"] = lin(H, cfg.vocab_size)
    return params


def llama3_8b_config(max_length: int = 8192) -> TransformerConfig:
    """Llama-3-8B shape (BASELINE.json config #2)."""
    return TransformerConfig(
        vocab_size=128256, hidden_size=4096, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=8,
        intermediate_size=14336, max_length=max_length,
        rope=RopeConfig(head_dim=128, freq_base=500000.0, layout=ROPE_NEOX),
        norm_eps=1e-5,
    )


def tiny_config(*, vocab=512, hidden=128, layers=2, heads=4, kv_heads=2,
                inter=256, max_length=256, moe_layer: bool = False,
                n_experts: int = 4, top_k: int = 2) -> TransformerConfig:
    specs = ()
    kw = {}
    if moe_layer:
        specs = tuple(LayerSpec(is_moe=(i == layers - 1)) for i in range(layers))
        kw = dict(moe_num_experts=n_experts, moe_top_k=top_k)
    return TransformerConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, num_key_value_heads=kv_heads,
        intermediate_size=inter, max_length=max_length,
        rope=RopeConfig(head_dim=hidden // heads, layout=ROPE_NEOX),
        layer_specs=specs, **kw)


def param_bytes(params) -> int:
    import jax

    return sum(x.nbytes for x in jax.tree.leaves(params))
