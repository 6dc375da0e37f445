"""Model downloader: `:model_id[:variant[:quant]]` → local GGMM file.

Port of the reference's scripts/model_downloader.py (parse_model_id :124,
get_model :145, preprocess_args :169): model ids resolve through a JSON
catalog to a ModelScope URL, download with a progress bar + size check, and
`-m :id` CLI arguments are rewritten in place.

The catalog schema is identical to the reference's scripts/models.json, so
that file can be dropped in via CHATLLM_TPU_MODELS_JSON for the full list;
a small built-in catalog covers the headline models.
"""
from __future__ import annotations

import copy
import json
import os
import sys

DEF_STORAGE_DIR = os.environ.get("CHATLLM_TPU_MODEL_DIR", "quantized")

# built-in catalog (reference models.json schema)
BUILTIN_MODELS = {
    "llama3.1": {
        "brief": "Llama 3.1 from Meta, 8B.",
        "license": "LLAMA 3.1 COMMUNITY LICENSE AGREEMENT",
        "default": "8b",
        "variants": {
            "8b": {"default": "q4_1", "quantized": {
                "q4_1": {"size": 5078283600,
                         "url": "chatllm_quantized_models/llama3.1-8b_q4_1.bin"}}},
        },
    },
    "qwen2.5": {
        "brief": "Qwen2.5 from Alibaba.",
        "license": "Apache License Version 2.0",
        "default": "7b",
        "variants": {
            "7b": {"default": "q8", "quantized": {
                "q8": {"size": 8096418400,
                       "url": "chatllm_quantized_models/qwen2.5-7b.bin"}}},
            "1.5b": {"default": "q8", "quantized": {
                "q8": {"size": 1646069856,
                       "url": "chatllm_quantized_models/qwen2.5-1.5b.bin"}}},
        },
    },
    "gemma3": {
        "brief": "Gemma 3 from Google.",
        "license": "Gemma Terms of Use",
        "default": "4b",
        "variants": {
            "4b": {"default": "q8", "quantized": {
                "q8": {"size": 4130735296,
                       "url": "chatllm_quantized_gemma3/gemma3-4b.bin"}}},
        },
    },
    "deepseek-v2-lite": {
        "brief": "DeepSeek-V2-Lite MoE (MLA).",
        "license": "DEEPSEEK LICENSE AGREEMENT",
        "default": "16b",
        "variants": {
            "16b": {"default": "q8", "quantized": {
                "q8": {"size": 16691737856,
                       "url": "chatllm_quantized_deepseek/deepseekv2-lite.bin"}}},
        },
    },
}


def load_catalog() -> dict:
    path = os.environ.get("CHATLLM_TPU_MODELS_JSON", "")
    if path and os.path.isfile(path):
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    return BUILTIN_MODELS


def model_url_on_modelscope(proj: str, fn: str, user: str = "judd2024") -> str:
    return (f"https://modelscope.cn/api/v1/models/{user}/{proj}/repo"
            f"?Revision=master&FilePath={fn}")


def _edit_distance(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, d[0] = d[0], i
        for j in range(1, len(b) + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1,
                       prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[len(b)]


def find_nearest_item(s: str, candidates) -> str:
    return min(candidates, key=lambda x: _edit_distance(s, x) / max(len(s), 1))


def parse_model_id(model_id: str, catalog: dict | None = None) -> dict:
    catalog = catalog or load_catalog()
    parts = model_id.split(":")
    mid = parts[0]
    if mid not in catalog:
        guess = find_nearest_item(mid, catalog.keys())
        raise ValueError(f"`{mid}` is not a known model id. Did you mean `{guess}`?")
    model = catalog[mid]
    variants = model["variants"]
    var = parts[1] if len(parts) >= 2 else model["default"]
    if var not in variants:
        raise ValueError(f"`{var}` is not a valid variant of `{mid}` "
                         f"(have: {', '.join(variants)})")
    var = variants[var]
    q = parts[2] if len(parts) >= 3 else var["default"]
    if q not in var["quantized"]:
        raise ValueError(f"`{q}` is not a valid quantization of the variant")
    r = copy.deepcopy(var["quantized"][q])
    proj, fn = r["url"].split("/")
    r["url"] = model_url_on_modelscope(proj, fn)
    r["fn"] = fn
    return r


def _progress(done: int, total: int, width: int = 50):
    frac = done / total if total else 0
    bar = "█" * int(width * frac) + "-" * (width - int(width * frac))
    sys.stderr.write(f"\r|{bar}| {100 * frac:.1f}%")
    if done >= total:
        sys.stderr.write("\n")
    sys.stderr.flush()


def download_file(url: str, fn: str) -> bool:
    import urllib.request

    with urllib.request.urlopen(url) as r, open(fn, "wb") as f:
        total = int(r.headers.get("content-length", 0))
        done = 0
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
            done += len(chunk)
            if total:
                _progress(done, total)
    return total == 0 or done == total


def get_model(model_id: str, storage_dir: str = DEF_STORAGE_DIR,
              catalog: dict | None = None) -> str:
    """Resolve `model_id` to a local path, downloading if needed."""
    os.makedirs(storage_dir, exist_ok=True)
    info = parse_model_id(model_id, catalog)
    fn = os.path.join(storage_dir, info["fn"])
    if os.path.isfile(fn) and os.path.getsize(fn) == info["size"]:
        return fn
    if not download_file(info["url"], fn):
        raise RuntimeError(f"failed to download {model_id}")
    if os.path.getsize(fn) != info["size"]:
        raise RuntimeError("downloaded file size mismatch")
    return fn


def preprocess_args(args: list, storage_dir: str = DEF_STORAGE_DIR) -> list:
    """Rewrite `-m :id` style args to downloaded paths (reference
    preprocess_args, model_downloader.py:169)."""
    out = list(args)
    for flag in ("-m", "--model", "--embedding_model", "--reranker_model"):
        if flag in out:
            i = out.index(flag)
            if i + 1 < len(out) and out[i + 1].startswith(":"):
                out[i + 1] = get_model(out[i + 1][1:].lower(), storage_dir)
    return out


def show(catalog: dict | None = None):
    catalog = catalog or load_catalog()
    total = 0
    count = 0
    for m in sorted(catalog):
        info = catalog[m]
        print(f"**{m}**: {info['brief']}")
        print(f"License  : {info['license']}")
        names = []
        for v, var in info["variants"].items():
            names.append(f"{m}:{v}")
            count += 1
            for q in var["quantized"].values():
                total += q["size"]
        print(f"Available: {', '.join(names)}")
        if len(names) > 1:
            print(f"Default  : {m}:{info['default']}")
        print()
    print(f"-------\nTotal: {total / 1e9:.2f} GB ({count} models)")


if __name__ == "__main__":
    argv = sys.argv[1:]
    if not argv:
        show()
    else:
        print(preprocess_args(argv))
