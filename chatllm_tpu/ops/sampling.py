"""On-device functional samplers.

Reference semantics (all host C++ in the reference — here they run jitted on
the chip so logits never leave HBM):
  GreedySampler            /root/reference/src/models.cpp:673
  NonGreedySampler         :693 (temperature + top-k pre-filter)
  TopPSampler              :787
  FreeTailSampler (TFS)    :828
  LogitsPenalty            :640-671, src/models_priv.h:676 (windowed
                           repeat/freq/presence penalties over token counts)

Penalty state is a fixed-size token-count vector [V] plus a ring history, a
pure pytree (`PenaltyState`) updated on device each accepted token.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

NEG_INF = -1e30


@struct.dataclass
class SamplerConfig:
    do_sample: bool = struct.field(pytree_node=False, default=False)
    sampling: str = struct.field(pytree_node=False, default="top_p")  # top_p | tfs | greedy
    temperature: float = struct.field(pytree_node=False, default=0.7)
    top_k: int = struct.field(pytree_node=False, default=20)
    top_p: float = struct.field(pytree_node=False, default=0.7)
    tfs_z: float = struct.field(pytree_node=False, default=0.95)
    repeat_penalty: float = struct.field(pytree_node=False, default=1.0)
    frequency_penalty: float = struct.field(pytree_node=False, default=0.0)
    presence_penalty: float = struct.field(pytree_node=False, default=0.0)
    penalty_window: int = struct.field(pytree_node=False, default=256)


@struct.dataclass
class PenaltyState:
    token_count: jax.Array      # int32 [V]
    history: jax.Array          # int32 [window]
    write_pos: jax.Array        # int32 scalar

    @classmethod
    def init(cls, vocab_size: int, window: int):
        return cls(
            token_count=jnp.zeros((vocab_size,), jnp.int32),
            history=jnp.full((window,), -1, jnp.int32),
            write_pos=jnp.zeros((), jnp.int32),
        )


def penalty_accept(state: PenaltyState, token_id) -> PenaltyState:
    """Ring-buffer accept_choice (reference src/models.cpp:617-638)."""
    window = state.history.shape[0]
    old = state.history[state.write_pos]
    dec = jnp.where(old >= 0, 1, 0)
    count = state.token_count.at[jnp.maximum(old, 0)].add(-dec)
    count = count.at[token_id].add(1)
    hist = state.history.at[state.write_pos].set(token_id)
    return PenaltyState(count, hist, (state.write_pos + 1) % window)


def penalty_accept_batched(state: PenaltyState, token_ids) -> PenaltyState:
    """Vectorized accept over a [B]-leading penalty state (one ring per
    serving slot, runtime/batching.py).  Same semantics per row as
    `penalty_accept`."""
    window = state.history.shape[-1]
    b = jnp.arange(token_ids.shape[0])
    old = state.history[b, state.write_pos]                     # [B]
    dec = jnp.where(old >= 0, 1, 0)
    count = state.token_count.at[b, jnp.maximum(old, 0)].add(-dec)
    count = count.at[b, token_ids].add(1)
    hist = state.history.at[b, state.write_pos].set(token_ids)
    return PenaltyState(count, hist, (state.write_pos + 1) % window)


def apply_penalties(logits: jax.Array, state: PenaltyState, cfg: SamplerConfig) -> jax.Array:
    """Reference LogitsPenalty::process (src/models.cpp:640-671)."""
    lf = logits.astype(jnp.float32)
    cnt = state.token_count.astype(jnp.float32)
    seen = cnt > 0
    if cfg.repeat_penalty != 1.0 and cfg.repeat_penalty > 0:
        rp = cfg.repeat_penalty
        penalized = jnp.where(lf > 0, lf / rp, lf * rp)
        lf = jnp.where(seen, penalized, lf)
    if cfg.frequency_penalty != 0.0 or cfg.presence_penalty != 0.0:
        lf = lf - cnt * cfg.frequency_penalty - seen.astype(jnp.float32) * cfg.presence_penalty
    return lf


def _topk_filter(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    vals, _ = jax.lax.top_k(logits, k)
    thresh = vals[..., -1:]
    return jnp.where(logits >= thresh, logits, NEG_INF)


def _topp_filter(logits: jax.Array, p: float) -> jax.Array:
    if not (0.0 < p < 1.0):
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumsum >= p (inclusive) — reference src/models.cpp:800
    keep_sorted = (cum - probs) < p
    n_keep = jnp.sum(keep_sorted, axis=-1)
    thresh = jnp.take_along_axis(sorted_logits, jnp.maximum(n_keep - 1, 0)[..., None], axis=-1)
    return jnp.where(logits >= thresh, logits, NEG_INF)


def _tfs_filter(logits: jax.Array, z: float, top_k: int) -> jax.Array:
    """Tail-free sampling over the top-k candidate list
    (reference src/models.cpp:828-877)."""
    V = logits.shape[-1]
    k = top_k if 0 < top_k < V else V
    vals, idx = jax.lax.top_k(logits, k)
    probs = jax.nn.softmax(vals, axis=-1)
    d2 = probs[..., :-2] + probs[..., 2:] - 2.0 * probs[..., 1:-1]
    d2 = jnp.abs(d2)
    d2 = d2 / (jnp.sum(d2, axis=-1, keepdims=True) + 1e-6)
    cdf = jnp.cumsum(d2, axis=-1)
    keep2 = cdf <= z                       # resize happens at first cdf > z
    n_keep = jnp.sum(keep2, axis=-1) + 1   # reference keeps i+1 entries
    thresh = jnp.take_along_axis(vals, jnp.maximum(n_keep - 1, 0)[..., None], axis=-1)
    return jnp.where(logits >= thresh, logits, NEG_INF)


def sample_token(
    logits: jax.Array,              # [V] or [B, V] f32
    cfg: SamplerConfig,
    key: Optional[jax.Array] = None,
    penalty: Optional[PenaltyState] = None,
):
    """Returns (token_id int32, confidence f32) with the same filter order as
    the reference: temperature → penalties → top-k → (top-p | tfs) → sample."""
    lf = logits.astype(jnp.float32)
    if not cfg.do_sample or cfg.sampling == "greedy":
        tok = jnp.argmax(lf, axis=-1).astype(jnp.int32)
        probs = jax.nn.softmax(lf, axis=-1)
        conf = jnp.take_along_axis(probs, tok[..., None], axis=-1)[..., 0] if lf.ndim > 1 else probs[tok]
        return tok, conf

    if abs(cfg.temperature) > 1e-5 and abs(cfg.temperature - 1.0) > 1e-5:
        lf = lf / cfg.temperature
    if penalty is not None:
        lf = apply_penalties(lf, penalty, cfg)
    lf = _topk_filter(lf, cfg.top_k)
    if cfg.sampling == "top_p":
        lf = _topp_filter(lf, cfg.top_p)
    elif cfg.sampling == "tfs":
        lf = _tfs_filter(lf, cfg.tfs_z, cfg.top_k)
    tok = jax.random.categorical(key, lf, axis=-1).astype(jnp.int32)
    probs = jax.nn.softmax(lf, axis=-1)
    conf = jnp.take_along_axis(probs, tok[..., None], axis=-1)[..., 0] if lf.ndim > 1 else probs[tok]
    return tok, conf
