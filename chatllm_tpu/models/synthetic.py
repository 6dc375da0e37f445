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


# ---------------------------------------------------------------------------
# Real-architecture tiny shapes for the multi-chip dryrun / sharding tests.
# Param trees use EXACTLY the loader key vocabulary of the corresponding
# model class, so the PartitionSpec rules exercised here are the production
# rules (round-4 VERDICT item #2: MLA / GDN / PLE / cascade trees).
# ---------------------------------------------------------------------------

def _norm(n, rng):
    return {"w": jnp.asarray(1.0 + 0.1 * rng.standard_normal(n),
                             jnp.float32)}


def _dense(rng, n_in, n_out, *, bias=False, dt=jnp.float32):
    w = jnp.asarray(rng.standard_normal((n_in, n_out)) * (n_in ** -0.5),
                    dtype=dt)
    return DenseLinear(w=w, bias=jnp.asarray(
        rng.standard_normal(n_out) * 0.01, jnp.float32) if bias else None)


def _experts(rng, E, H, F, dt=jnp.float32):
    g = rng.standard_normal((E, H, F)) * (H ** -0.5)
    u = rng.standard_normal((E, H, F)) * (H ** -0.5)
    d = rng.standard_normal((E, F, H)) * (F ** -0.5)
    return {"gate": jnp.asarray(g, dt), "up": jnp.asarray(u, dt),
            "down": jnp.asarray(d, dt)}


def build_deepseek_v2_lite(*, seed=0, dtype=jnp.float32):
    """DeepSeek-V2-Lite shape: MLA (q_lora_rank=0) + grouped MoE with a
    shared expert, first layer dense (models/deepseek.py DeepSeekV2.load;
    reference models/deepseek.h:251-490)."""
    from ..nn.transformer import MLAConfig
    from ..ops.rope import ROPE_NORMAL

    rng = np.random.default_rng(seed)
    V, H, L, h = 256, 128, 2, 8
    rank, dn, dr, dv = 32, 16, 8, 16
    E, topk, me, F = 8, 2, 64, 192
    cfg = TransformerConfig(
        vocab_size=V, hidden_size=H, num_hidden_layers=L,
        num_attention_heads=h, num_key_value_heads=h,
        intermediate_size=F, max_length=128, norm_eps=1e-6,
        rope=RopeConfig(head_dim=dr, rot_dim=dr, freq_base=10000.0,
                        layout=ROPE_NORMAL),
        attention_scale=(dn + dr) ** -0.5,
        layer_specs=tuple(LayerSpec(is_moe=(i >= 1)) for i in range(L)),
        moe_num_experts=E, moe_top_k=topk, moe_norm_topk_prob=True,
        moe_n_group=1, moe_topk_group=1, moe_score_func="softmax",
        mla=MLAConfig(q_lora_rank=0, kv_lora_rank=rank, qk_nope_head_dim=dn,
                      qk_rope_head_dim=dr, v_head_dim=dv))
    params = {
        "embed": jnp.asarray(rng.standard_normal((V, H)) * 0.02, dtype),
        "final_norm": _norm(H, rng),
        "lm_head": _dense(rng, H, V, dt=dtype),
        "layers": [],
    }
    for i in range(L):
        attn = {
            "q": _dense(rng, H, h * (dn + dr), dt=dtype),
            "d_kv": _dense(rng, H, rank, dt=dtype),
            "k_pe": _dense(rng, H, dr, dt=dtype),
            "kv_norm": _norm(rank, rng),
            "u_k_nope": _dense(rng, rank, h * dn, dt=dtype),
            "u_v": _dense(rng, rank, h * dv, dt=dtype),
            "o": _dense(rng, h * dv, H, dt=dtype),
        }
        if i >= 1:
            mlp = {"gate": _dense(rng, H, E, dt=dtype),
                   "experts": _experts(rng, E, H, me, dtype),
                   "shared": {"gate": _dense(rng, H, me, dt=dtype),
                              "up": _dense(rng, H, me, dt=dtype),
                              "down": _dense(rng, me, H, dt=dtype)}}
        else:
            mlp = {"gate": _dense(rng, H, F, dt=dtype),
                   "up": _dense(rng, H, F, dt=dtype),
                   "down": _dense(rng, F, H, dt=dtype)}
        params["layers"].append({
            "attn_norm": _norm(H, rng), "attn": attn,
            "ffn_norm": _norm(H, rng), "mlp": mlp,
        })
    params["layers"] = tuple(params["layers"])
    return cfg, params


def build_qwen35_hybrid(*, seed=1, dtype=jnp.float32):
    """Qwen3.5 hybrid shape: Gated-DeltaNet linear-attention layer + gated
    full-attention layer, both with shared-expert MoE (models/qwen3_5.py;
    reference models/qwen3_5.cpp:198-485)."""
    from ..nn.transformer import GDNConfig
    from ..ops.rope import ROPE_NEOX

    rng = np.random.default_rng(seed)
    V, H, L = 256, 128, 2
    heads, kv, d = 8, 4, 16
    nk, nv, dk, dv, ck = 4, 8, 16, 16, 4
    E, topk, me = 8, 2, 64
    gdn = GDNConfig(conv_kernel=ck, num_k_heads=nk, num_v_heads=nv,
                    k_head_dim=dk, v_head_dim=dv)
    cfg = TransformerConfig(
        vocab_size=V, hidden_size=H, num_hidden_layers=L,
        num_attention_heads=heads, num_key_value_heads=kv,
        intermediate_size=me, max_length=128, norm_eps=1e-6,
        rope=RopeConfig(head_dim=d, freq_base=10000.0, layout=ROPE_NEOX),
        qk_norm="rmsnorm", attn_out_gate=True, gdn=gdn,
        layer_specs=(LayerSpec(linear_attn=True, is_moe=True),
                     LayerSpec(is_moe=True)),
        moe_num_experts=E, moe_top_k=topk, moe_norm_topk_prob=True)
    params = {
        "embed": jnp.asarray(rng.standard_normal((V, H)) * 0.02, dtype),
        "final_norm": _norm(H, rng),
        "lm_head": _dense(rng, H, V, dt=dtype),
        "layers": [],
    }
    conv_dim = gdn.conv_dim
    # layer 0: DeltaNet
    attn0 = {
        "qkv": _dense(rng, H, conv_dim, dt=dtype),
        "z": _dense(rng, H, nv * dv, dt=dtype),
        "b": _dense(rng, H, nv, dt=dtype),
        "a": _dense(rng, H, nv, dt=dtype),
        "conv_w": jnp.asarray(rng.standard_normal((conv_dim, 1, ck)) * 0.2,
                              jnp.float32),
        "dt_bias": jnp.asarray(rng.standard_normal(nv) * 0.1, jnp.float32),
        "A_log": jnp.asarray(rng.standard_normal(nv) * 0.1, jnp.float32),
        "norm_w": jnp.asarray(1.0 + 0.1 * rng.standard_normal(dv),
                              jnp.float32),
        "o": _dense(rng, nv * dv, H, dt=dtype),
    }
    # layer 1: gated full attention
    attn1 = {
        "q": _dense(rng, H, heads * d, dt=dtype),
        "k": _dense(rng, H, kv * d, dt=dtype),
        "v": _dense(rng, H, kv * d, dt=dtype),
        "o": _dense(rng, heads * d, H, dt=dtype),
        "gate": _dense(rng, H, heads * d, dt=dtype),
        "q_norm": _norm(d, rng), "k_norm": _norm(d, rng),
    }
    for attn in (attn0, attn1):
        mlp = {"gate": _dense(rng, H, E, dt=dtype),
               "experts": _experts(rng, E, H, me, dtype),
               "shared": {"gate": _dense(rng, H, me, dt=dtype),
                          "up": _dense(rng, H, me, dt=dtype),
                          "down": _dense(rng, me, H, dt=dtype)},
               "shared_gate": _dense(rng, H, 1, dt=dtype)}
        params["layers"].append({
            "attn_norm": _norm(H, rng), "attn": attn,
            "ffn_norm": _norm(H, rng), "mlp": mlp,
        })
    params["layers"] = tuple(params["layers"])
    return cfg, params


def build_gemma4_moe(*, seed=2, dtype=jnp.float32):
    """Gemma4 shape: PLE + SWA/full alternation + KV-shared tail +
    cascaded MoE + k_eq_v full-attn layers (models/gemma4.py
    _load_llm_params; reference models/gemma4.cpp:1777-2340)."""
    from ..ops.rope import ROPE_NEOX

    rng = np.random.default_rng(seed)
    V, H, L = 256, 128, 4
    heads, n_kv, hd, ghd = 8, 4, 16, 16
    ple = 16
    E, topk, me, F = 8, 2, 64, 192
    swa = 32
    # layers: swa, full(k_eq_v), swa(shared from 0), full(shared from 1)
    specs = (
        LayerSpec(sliding_window=swa, local_rope=True, is_moe=True),
        LayerSpec(head_dim=ghd, num_kv_heads=n_kv, v_from_k=True,
                  is_moe=True),
        LayerSpec(sliding_window=swa, local_rope=True, is_moe=True,
                  shared_kv_from=0),
        LayerSpec(head_dim=ghd, num_kv_heads=n_kv, v_from_k=True,
                  is_moe=True, shared_kv_from=1),
    )
    cfg = TransformerConfig(
        vocab_size=V, hidden_size=H, num_hidden_layers=L,
        num_attention_heads=heads, num_key_value_heads=n_kv,
        intermediate_size=F, max_length=128, head_dim=hd,
        act="gelu_tanh", norm_eps=1e-6,
        rope=RopeConfig(head_dim=ghd, freq_base=1000000.0, layout=ROPE_NEOX),
        rope_local=RopeConfig(head_dim=hd, freq_base=10000.0,
                              layout=ROPE_NEOX),
        attention_scale=1.0, qk_norm="rmsnorm", v_norm=True,
        post_norms=True, layer_specs=specs, tie_lm_head=True,
        logit_scale=H ** -0.5, final_logit_softcap=30.0,
        cascaded_moe=True, ple_dim=ple,
        moe_num_experts=E, moe_top_k=topk)
    params = {
        "embed": jnp.asarray(rng.standard_normal((V, H)) * 0.02, dtype),
        "final_norm": _norm(H, rng),
        "ple": {
            "embed": jnp.asarray(rng.standard_normal((V, L * ple)) * 0.02,
                                 dtype),
            "proj": _dense(rng, H, L * ple, dt=dtype),
            "norm": _norm(ple, rng),
        },
        "layers": [],
    }
    for i, spec in enumerate(specs):
        d_l = spec.head_dim or hd
        attn = {
            "q": _dense(rng, H, heads * d_l, dt=dtype),
            "o": _dense(rng, heads * d_l, H, dt=dtype),
            "q_norm": _norm(d_l, rng),
        }
        if spec.shared_kv_from < 0:
            attn["k"] = _dense(rng, H, (spec.num_kv_heads or n_kv) * d_l,
                               dt=dtype)
            attn["k_norm"] = _norm(d_l, rng)
            if not spec.v_from_k:
                attn["v"] = _dense(rng, H, (spec.num_kv_heads or n_kv) * d_l,
                                   dt=dtype)
        lay = {
            "attn_norm": _norm(H, rng), "attn": attn,
            "post_attn_norm": _norm(H, rng),
            "ffn_norm": _norm(H, rng), "post_ffn_norm": _norm(H, rng),
            "mlp": {"gate": _dense(rng, H, F, dt=dtype),
                    "up": _dense(rng, H, F, dt=dtype),
                    "down": _dense(rng, F, H, dt=dtype)},
            "layer_scalar": jnp.asarray(1.0, jnp.float32),
            "moe": {
                "router_norm": _norm(H, rng),
                "router_proj": _dense(rng, H, E, dt=dtype),
                "per_expert_scale": jnp.asarray(
                    1.0 + 0.1 * rng.standard_normal(E), jnp.float32),
                "post1": _norm(H, rng), "post2": _norm(H, rng),
                "pre2": _norm(H, rng),
                "experts": _experts(rng, E, H, me, dtype),
            },
            "ple_gate": _dense(rng, H, ple, dt=dtype),
            "ple_proj": _dense(rng, ple, H, dt=dtype),
            "ple_norm": _norm(H, rng),
        }
        params["layers"].append(lay)
    params["layers"] = tuple(params["layers"])
    return cfg, params


def build_grok1_moe(*, seed=3, dtype=jnp.float32):
    """Grok-1 shape: sandwich norms + MoE on every layer + tanh logit cap
    (models/misc_llama2.py Grok1.load; reference models/grok.cpp)."""
    from ..ops.rope import ROPE_NEOX

    rng = np.random.default_rng(seed)
    V, H, L = 256, 128, 2
    heads, kv, d = 8, 4, 16
    E, topk, me = 8, 2, 64
    cfg = TransformerConfig(
        vocab_size=V, hidden_size=H, num_hidden_layers=L,
        num_attention_heads=heads, num_key_value_heads=kv,
        intermediate_size=me, max_length=128, norm_eps=1e-5,
        rope=RopeConfig(head_dim=d, freq_base=10000.0, layout=ROPE_NEOX),
        act="gelu", post_norms=True, logit_softcap=30.0,
        logit_scale=0.5, tie_lm_head=True,
        layer_specs=tuple(LayerSpec(is_moe=True) for _ in range(L)),
        moe_num_experts=E, moe_top_k=topk, moe_norm_topk_prob=True)
    params = {
        "embed": jnp.asarray(rng.standard_normal((V, H)) * 0.02, dtype),
        "final_norm": _norm(H, rng),
        "layers": [],
    }
    for i in range(L):
        params["layers"].append({
            "attn_norm": _norm(H, rng),
            "post_attn_norm": _norm(H, rng),
            "ffn_norm": _norm(H, rng),
            "post_ffn_norm": _norm(H, rng),
            "attn": {
                "q": _dense(rng, H, heads * d, dt=dtype),
                "k": _dense(rng, H, kv * d, dt=dtype),
                "v": _dense(rng, H, kv * d, dt=dtype),
                "o": _dense(rng, heads * d, H, dt=dtype),
            },
            "mlp": {"gate": _dense(rng, H, E, dt=dtype),
                    "experts": _experts(rng, E, H, me, dtype)},
        })
    params["layers"] = tuple(params["layers"])
    return cfg, params


REAL_ARCH_BUILDERS = {
    "deepseek-v2-lite(MLA+MoE)": build_deepseek_v2_lite,
    "qwen3.5-hybrid(GDN+MoE)": build_qwen35_hybrid,
    "gemma4(PLE+KVshared+cascadeMoE)": build_gemma4_moe,
    "grok-1(MoE)": build_grok1_moe,
}
