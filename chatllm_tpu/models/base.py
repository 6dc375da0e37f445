"""Model framework: registry, config parsing, weight loading.

Reference analog: ModelFactory + ImplModelLoader self-registration
(/root/reference/src/models.cpp:2104-2177, src/models_priv.h:398-436) and
ModelLoader's named-tensor reads with on-the-fly re-quantization
(/root/reference/src/chat.h:670-869).

Per-arch modules register a loader keyed by the on-disk ModelType int; the
loader parses the binary Config struct, builds the tokenizer from the file's
vocab span, and maps GGMM tensor names into the param pytree.
"""
from __future__ import annotations

import struct as _struct
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..ggmm.quants import GGMLType
from ..ggmm.reader import GGMMFile
from ..nn.transformer import TransformerConfig
from ..ops.qtensor import linear_from_ggml
from ..runtime.chat import ChatTokenizer
from ..runtime.generate import GenerationConfig, InferenceEngine, PerfInfo
from .model_types import ModelType

_REGISTRY: dict[int, type] = {}


def register_model(*types):
    def deco(cls):
        for t in types:
            _REGISTRY[int(t)] = cls
        return cls
    return deco


def lookup_model(model_type: int):
    return _REGISTRY.get(int(model_type))


@dataclass
class RuntimeConfig:
    """Runtime options (reference RuntimeConfig + relevant Args,
    /root/reference/src/chat.h:870-874, src/main.cpp:30-135)."""
    weight_dtype: str = "auto"      # auto = keep quantized | bfloat16 | float32
    compute_dtype: str = "bfloat16" # activation dtype
    cache_dtype: str = "bfloat16"   # KV cache dtype
    max_length: int = -1            # context override (-1 = model default)
    re_quantize: str = ""           # on-the-fly requantization target, e.g.
                                    # "q4_0"/"q4_k"/"q8_0" (reference
                                    # --re_quantize, src/chat.h:710)
    mla_cache: str = "speed"        # MLA cache mode: "speed" (expanded per-
                                    # head K/V) | "memory" (latent cache,
                                    # reference forward_memory deepseek.cpp:406)
    additional: dict = field(default_factory=dict)  # --set k v
    layer_spec: str = ""            # --layer_spec "0:3,1:4": rebuild the
                                    # stack from half-open source-layer
                                    # ranges (duplicates share weights;
                                    # reference set_layer_ids, src/chat.h:988)


@dataclass
class BaseConfig:
    """The common binary config header every arch embeds
    (/root/reference/src/chat.h:243-263): 11 little-endian i32."""
    dtype: int
    vocab_size: int
    hidden_size: int
    num_attention_heads: int
    num_hidden_layers: int
    intermediate_size: int
    max_length: int
    bos_token_id: int
    eos_token_id: int
    pad_token_id: int
    sep_token_id: int

    STRUCT_FMT = "11i"
    NBYTES = 44

    @classmethod
    def parse(cls, gf: GGMMFile, extra_fmt: str = ""):
        """Parse BaseConfig (+ trailing per-arch fields given by extra_fmt,
        e.g. '2if' for 2 ints + 1 float).  Returns (BaseConfig, tuple)."""
        vals = gf.read_config(cls.STRUCT_FMT + extra_fmt)
        base = cls(*vals[:11])
        return base, vals[11:]


class ParamBuilder:
    """Reads named tensors from a GGMMFile into device arrays, applying the
    runtime dtype policy (keep-quantized vs dequantize-at-load)."""

    def __init__(self, gf: GGMMFile, rt: RuntimeConfig):
        self.gf = gf
        self.rt = rt
        self.compute_dtype = jnp.dtype(rt.compute_dtype)
        self.loaded: set[str] = set()

    def _dequant_to(self):
        if self.rt.weight_dtype == "auto":
            return None
        return jnp.dtype(self.rt.weight_dtype)

    def has(self, name: str) -> bool:
        return self.gf.has_tensor(name)

    def raw_f32(self, name: str) -> np.ndarray:
        self.loaded.add(name)
        return self.gf.tensor_f32(name)

    def array(self, name: str, dtype=jnp.float32):
        """Full-precision small tensor (norm weights, biases)."""
        return jnp.asarray(self.raw_f32(name), dtype=dtype)

    def embedding(self, name: str):
        """Token embedding table [V, H] in compute dtype."""
        return jnp.asarray(self.raw_f32(name), dtype=self.compute_dtype)

    def linear(self, prefix: str, *, bias: bool | str = "auto", transpose_ok=True):
        """Load `{prefix}.weight` (+ `.bias`) as a DenseLinear/QuantLinear,
        optionally re-quantizing on the fly (reference read_tensor_data with
        a target type, src/chat.h:710)."""
        wname = prefix + ".weight"
        e = self.gf.tensors[wname]
        self.loaded.add(wname)
        bname = prefix + ".bias"
        b = None
        if (bias is True) or (bias == "auto" and self.gf.has_tensor(bname)):
            b = self.raw_f32(bname)
        raw, dtype = self.gf.raw_tensor(wname), e.dtype
        if self.rt.re_quantize and len(e.shape) == 2:
            from ..ggmm.quants import dequantize, quantize

            target = GGMLType[self.rt.re_quantize.upper()]
            if target != dtype:
                w = dequantize(raw, dtype, e.shape)
                raw, dtype = quantize(w, target), target
        dq = self._dequant_to()
        if dq is None and dtype in (GGMLType.F16, GGMLType.F32, GGMLType.BF16):
            dq = self.compute_dtype
        return linear_from_ggml(raw, dtype, e.shape, bias=b, dequant_to=dq)

    def norm(self, prefix: str, *, bias: bool | str = "auto") -> dict:
        p = {"w": self.array(prefix + ".weight")}
        bname = prefix + ".bias"
        if (bias is True) or (bias == "auto" and self.gf.has_tensor(bname)):
            p["b"] = self.array(bname)
        return p


def load_llama_family_params(pb: ParamBuilder, n_layers: int, *, tie_lm_head: bool = False,
                             qk_norm: bool = False, sinks: bool = False) -> dict:
    """Weight map shared by the llama-like families (converter weight names:
    /root/reference/convert.py QWen2Converter.get_weight_names:4805,
    LlamaConverter:1604)."""
    params = {
        "embed": pb.embedding("model.embed_tokens.weight"),
        "final_norm": pb.norm("model.norm"),
        "layers": [],
    }
    for i in range(n_layers):
        pfx = f"model.layers.{i}"
        attn = {
            "q": pb.linear(f"{pfx}.self_attn.q_proj"),
            "k": pb.linear(f"{pfx}.self_attn.k_proj"),
            "v": pb.linear(f"{pfx}.self_attn.v_proj"),
            "o": pb.linear(f"{pfx}.self_attn.o_proj"),
        }
        if qk_norm:
            attn["q_norm"] = pb.norm(f"{pfx}.self_attn.q_norm")
            attn["k_norm"] = pb.norm(f"{pfx}.self_attn.k_norm")
        if sinks and pb.has(f"{pfx}.self_attn.sinks"):
            attn["sinks"] = pb.array(f"{pfx}.self_attn.sinks")
        layer = {
            "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
            "attn": attn,
            "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
            "mlp": {
                "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                "up": pb.linear(f"{pfx}.mlp.up_proj"),
                "down": pb.linear(f"{pfx}.mlp.down_proj"),
            },
        }
        params["layers"].append(layer)
    params["layers"] = tuple(params["layers"])
    if not tie_lm_head:
        params["lm_head"] = pb.linear("lm_head")
    return params


def load_moe_experts(pb: "ParamBuilder", pfx: str, n_experts: int,
                     names=("gate_proj", "up_proj", "down_proj"),
                     container: str = "experts") -> dict:
    """Stack per-expert FFN weights `{pfx}.{container}.{j}.<name>.weight`
    (reference concat-on-load, e.g. models/qwen.cpp:312-314) into dense
    [E, ...] arrays for the expert einsum."""
    gates, ups, downs = [], [], []
    g_n, u_n, d_n = names
    for j in range(n_experts):
        gates.append(pb.raw_f32(f"{pfx}.{container}.{j}.{g_n}.weight").T)
        ups.append(pb.raw_f32(f"{pfx}.{container}.{j}.{u_n}.weight").T)
        downs.append(pb.raw_f32(f"{pfx}.{container}.{j}.{d_n}.weight").T)
    dt = pb.compute_dtype
    return {
        "gate": jnp.asarray(np.stack(gates), dtype=dt),   # [E, H, F]
        "up": jnp.asarray(np.stack(ups), dtype=dt),       # [E, H, F]
        "down": jnp.asarray(np.stack(downs), dtype=dt),   # [E, F, H]
    }


class BaseLLM:
    """A loaded model: static config + param pytree + tokenizer + engine.

    Reference analog: AbstractModel/BaseModelForConditionalGeneration
    (/root/reference/src/chat.h:978, src/models_priv.h:450)."""

    def __init__(self, model_type: int, cfg: TransformerConfig, params,
                 tokenizer: ChatTokenizer, native_config=None, meta=None):
        self.model_type = model_type
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.native_config = native_config
        self.meta = meta or {}
        self.perf = PerfInfo()
        self._engine: Optional[InferenceEngine] = None

    @property
    def engine(self) -> InferenceEngine:
        if self._engine is None:
            self._engine = InferenceEngine(self.cfg, self.params)
        return self._engine

    def generate(self, input_ids, gen_cfg: GenerationConfig, **kw):
        kw.setdefault("is_terminator", self.tokenizer.is_terminate_token)
        kw.setdefault("terminate_seq",
                      getattr(self.tokenizer, "terminate_seq", None))
        kw.setdefault("perf", self.perf)
        return self.engine.generate(input_ids, gen_cfg, **kw)

    def forward_logits(self, input_ids, n_past: int = 0, cache=None):
        """Full-sequence logits (testing / PPL harness)."""
        from ..nn.transformer import transformer_forward
        import jax

        ids = jnp.asarray(np.atleast_2d(np.asarray(input_ids, np.int32)))
        if cache is None:
            cache = self.engine.new_cache(ids.shape[0], max(ids.shape[1], 1))
        logits, cache = transformer_forward(self.cfg, self.params, ids, cache, n_past)
        return logits, cache


def load_model(path: str, rt: RuntimeConfig | None = None) -> BaseLLM:
    """ModelFactory::load analog: open file, dispatch on model_type."""
    rt = rt or RuntimeConfig()
    gf = GGMMFile.open(path)
    cls = lookup_model(gf.model_type)
    if cls is None:
        raise ValueError(f"unsupported model_type 0x{gf.model_type:x} in {path}")
    model = cls.load(gf, rt)
    # The GGMM JSON meta carries the original HF config.json (reference
    # load_more(meta_json), src/chat.h:986).  Norm eps is the one field the
    # binary config structs don't carry, and HF checkpoints vary it
    # (1e-5 vs 1e-6) — honor it so converted checkpoints match HF exactly.
    if rt.layer_spec:
        model = _apply_layer_spec(model, rt.layer_spec)
    hf_cfg = (gf.meta or {}).get("config.json") or {}
    norm_type = getattr(getattr(model, "cfg", None), "norm_type", None)
    if norm_type in ("rmsnorm", "layernorm") and not getattr(
            cls, "IGNORE_META_NORM_EPS", False):
        from dataclasses import replace as _replace

        key = "rms_norm_eps" if norm_type == "rmsnorm" else "layer_norm_eps"
        eps = hf_cfg.get(key)
        if eps is not None and float(eps) != model.cfg.norm_eps:
            model.cfg = _replace(model.cfg, norm_eps=float(eps))
    return model


def parse_layer_spec(spec: str, n_layers: int) -> list[int]:
    """'0:3,1:4' -> [0,1,2, 1,2,3]; 'all' -> identity; bare ints allowed
    (reference --layer_spec, src/main.cpp:169-176)."""
    if spec in ("", "all"):
        return list(range(n_layers))
    ids: list[int] = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if ":" in part:
            a, b = part.split(":")
            ids.extend(range(int(a), int(b)))
        else:
            ids.append(int(part))
    for i in ids:
        if not (0 <= i < n_layers):
            raise ValueError(f"layer_spec index {i} out of range 0..{n_layers - 1}")
    return ids


def _apply_layer_spec(model: "BaseLLM", spec: str) -> "BaseLLM":
    """Rebuild the layer stack from source-layer indices.  Duplicated layers
    ALIAS the same weight arrays (no copies); each stack position still gets
    its own KV cache slot."""
    from dataclasses import replace as _replace

    cfg = model.cfg
    ids = parse_layer_spec(spec, cfg.num_hidden_layers)
    layers = tuple(model.params["layers"][j] for j in ids)
    model.params = dict(model.params)
    model.params["layers"] = layers
    specs = cfg.layer_specs
    new_specs = tuple(cfg.layer_spec(j) for j in ids) if specs else ()
    model.cfg = _replace(cfg, num_hidden_layers=len(ids),
                         layer_specs=new_specs)
    return model
