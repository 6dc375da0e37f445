"""chatllm_tpu — a TPU-native LLM inference framework (JAX/XLA/Pallas).

Built from scratch with the capabilities of foldl/chatllm.cpp (the reference
implementation lives at /root/reference and is cited by file:line throughout
this codebase for parity checking — no code is copied from it; the compute
path here is JAX/XLA/Pallas designed for TPU hardware).

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):
  ggmm/      — GGML/GGMM model-file container + block-quant formats (numpy)
  tokenizer/ — byte-exact BPE (sentencepiece-score / byte-level) + Unigram
  ops/       — Pallas kernels + XLA compute ops (quant matmul, attention, RoPE)
  nn/        — module system + layer/block library
  models/    — model zoo (registry keyed by on-disk ModelType id)
  parallel/  — device mesh + sharding rules (TP/EP over ICI; replaces ggml-rpc)
  runtime/   — generate loop, samplers, chat pipeline, sessions, streaming
  serve/     — OpenAI/Ollama-compatible HTTP server
"""

__version__ = "0.1.0"
