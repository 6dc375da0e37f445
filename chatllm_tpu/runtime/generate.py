"""Generation loop: jitted prefill + decode-step over a donated KV cache.

Reference analog: BaseModelForConditionalGeneration::generate
(/root/reference/src/models.cpp:941-1086) and generate_next_token (:1108)
with batched prefill chunking, plus the sampler hot path (:1031-1066).

TPU design (SURVEY.md §7):
  - TWO compiled functions instead of a graph rebuilt per token:
      prefill(params, ids[B,Tpad], cache, n_past, n_tokens) -> last logits
      decode_step(params, tok[B,1], cache, n_past, penalty, key) -> next tok
    The KV cache is donated, so XLA updates it in place across steps.
  - Prompt chunks are padded to power-of-two buckets; attention masks by
    `n_past + n_tokens` so padded positions never pollute the cache (the
    next write overwrites their slots).
  - Sampling (incl. penalties) runs on-device inside the decode step; the
    host only reads back one int32 per token, one step behind the dispatch
    front, so Python never stalls the TPU.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field, replace
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.transformer import KVCache, TransformerConfig, init_cache, transformer_forward
from ..ops.sampling import PenaltyState, SamplerConfig, penalty_accept, sample_token


@dataclass
class GenerationConfig:
    """Mirrors the reference GenerationConfig (/root/reference/src/chat.h:875-919)
    option-for-option so C-API param strings map 1:1."""
    max_length: int = -1            # total context; -1 = model max
    max_new_tokens: int = -1
    max_context_length: int = 4096
    do_sample: bool = True
    top_k: int = 20
    top_p: float = 0.7
    temperature: float = 0.7
    tfs_z: float = 0.95
    sampling: str = "top_p"
    repeat_penalty: float = 1.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    penalty_window: int = 256
    seed: int = 0
    batch_size: int = 4096          # prefill chunk (reference src/main.cpp:100)

    def sampler_config(self) -> SamplerConfig:
        return SamplerConfig(
            do_sample=self.do_sample, sampling=self.sampling if self.do_sample else "greedy",
            temperature=self.temperature, top_k=self.top_k, top_p=self.top_p,
            tfs_z=self.tfs_z, repeat_penalty=self.repeat_penalty,
            frequency_penalty=self.frequency_penalty,
            presence_penalty=self.presence_penalty,
            penalty_window=self.penalty_window,
        )


@dataclass
class PerfInfo:
    """ModelPerfInfo analog (/root/reference/src/chat.h:921-951)."""
    prompt_tokens: int = 0
    prompt_ms: float = 0.0
    gen_tokens: int = 0
    gen_ms: float = 0.0

    def summary(self) -> str:
        pt = self.prompt_tokens / self.prompt_ms * 1000 if self.prompt_ms else 0.0
        gt = self.gen_tokens / self.gen_ms * 1000 if self.gen_ms else 0.0
        return (f"prompt eval time: {self.prompt_ms:8.2f} ms / {self.prompt_tokens:5d} tokens ({pt:8.2f} tok/s)\n"
                f"       eval time: {self.gen_ms:8.2f} ms / {self.gen_tokens:5d} tokens ({gt:8.2f} tok/s)")


def _bucket(n: int, lo: int = 16, hi: int = 4096) -> int:
    b = lo
    while b < n and b < hi:
        b *= 2
    return b


def _fit_bucket(n: int, room: int, hi: int) -> int:
    """Largest bucket that holds `n` tokens without exceeding `room` cache
    slots.  Falls back to an exact-size pad (rare tail compile) when fewer
    than one minimum bucket of room remains near the context limit —
    padding past `room` would make update_kv_cache's dynamic_update_slice
    clamp the start index and silently corrupt older cache entries."""
    tpad = _bucket(n, hi=hi)
    if tpad <= room:
        return tpad
    b = 16
    while b * 2 <= room:
        b *= 2
    return b if b <= room else room


class _Emitter:
    """Streams accepted tokens while supporting multi-token terminator
    sequences (reference match_output_sequence / is_output_terminated,
    src/models_priv.h + models/reka.cpp:82-108): the last len(seq)-1 tokens
    are held back from the stream until they can no longer complete the
    terminator; on a match the sequence is removed from `out`."""

    def __init__(self, on_token, terminate_seq=None):
        self.on_token = on_token
        self.seq = list(terminate_seq) if terminate_seq else None
        self.hold = len(self.seq) - 1 if self.seq else 0
        self.emitted = 0

    def step(self, out: list) -> bool:
        """Called after appending a token.  Returns True when the terminator
        sequence completed (it is popped from `out`)."""
        if self.seq and len(out) >= len(self.seq) and out[-len(self.seq):] == self.seq:
            del out[-len(self.seq):]
            return True
        while self.emitted < len(out) - self.hold:
            if self.on_token:
                self.on_token(out[self.emitted])
            self.emitted += 1
        return False

    def flush(self, out: list):
        while self.emitted < len(out):
            if self.on_token:
                self.on_token(out[self.emitted])
            self.emitted += 1


class InferenceEngine:
    """Owns the jitted compute for one model (params + static config)."""

    def __init__(self, cfg: TransformerConfig, params, *, max_length: int = -1,
                 decode_block: int = 16):
        self.cfg = cfg
        self.params = params
        self.max_length = max_length if max_length > 0 else cfg.max_length
        self.decode_block = decode_block
        # rope-position offset relative to cache slots (M-RoPE models: image
        # tokens advance cache slots faster than the time axis, so text
        # continuation positions lag n_past; qwen.cpp TensorPosHelper3D)
        self.pos_delta = 0
        self._prefill_cache = {}
        self._decode_fns = {}
        # SWA models: prefill chunks are capped to the ring headroom so a
        # chunk's writes never overwrite keys its own queries still need
        # (reference extra_len pattern, src/layers.h:1973)
        from ..nn.transformer import SWA_EXTRA
        self._chunk_cap = 0
        for i in range(cfg.num_hidden_layers):
            w = cfg.layer_spec(i).sliding_window
            if 0 < w and w + SWA_EXTRA < cfg.max_length:
                self._chunk_cap = SWA_EXTRA
                break

    def _write_capacity(self, cache: KVCache) -> int:
        """Slots available for dynamic-slice writes: the smallest DENSE
        layer cache.  Ring (SWA) layers wrap and don't bound capacity."""
        cfg = self.cfg
        sizes = []
        for i in range(cfg.num_hidden_layers):
            spec = cfg.layer_spec(i)
            if spec.no_attn or spec.linear_attn:
                continue                     # stateful, not slot-written
            S = cache.k[i].shape[1]
            if spec.sliding_window > 0 and S < cfg.max_length:
                continue                     # ring-written, wraps
            sizes.append(S)
        return min(sizes) if sizes else self.max_length

    # -- compiled stages ----------------------------------------------------
    def _prefill_fn(self, tpad: int):
        if tpad in self._prefill_cache:
            return self._prefill_cache[tpad]
        cfg = self.cfg

        glm1 = cfg.rope is not None and cfg.rope.layout == "glm1"

        @partial(jax.jit, donate_argnums=(1,))
        def prefill(params, cache, ids, n_past, n_tokens, pos_delta):
            B, T = ids.shape
            if glm1:
                # pos_delta carries the GLM1 position boundary (prompt-2):
                # channel 0 clamps there, channel 1 counts past it
                # (custom_ops.cpp chatglm1_rope:420-423)
                p = jnp.broadcast_to(n_past + jnp.arange(T)[None, :], (B, T))
                pos = jnp.stack([jnp.minimum(p, pos_delta),
                                 jnp.maximum(p - pos_delta, 0)])
            else:
                pos = jnp.broadcast_to((n_past + pos_delta) + jnp.arange(T)[None, :], (B, T))
            logits, cache = transformer_forward(cfg, params, ids, cache, n_past,
                                                positions=pos,
                                                n_valid=n_tokens,
                                                last_index=n_tokens - 1)
            return logits[:, 0, :], cache

        self._prefill_cache[tpad] = prefill
        return prefill

    def _decode_fn(self, scfg: SamplerConfig, block: int):
        """Jitted block decoder: `block` autoregressive steps inside one
        lax.scan, sampling on device.  One host round-trip per block instead
        of per token — the TPU-native inversion of the reference's
        rebuild-graph-per-token loop (src/models.cpp:1108)."""
        key_s = (scfg, block)
        if key_s in self._decode_fns:
            return self._decode_fns[key_s]
        cfg = self.cfg

        glm1 = cfg.rope is not None and cfg.rope.layout == "glm1"

        @partial(jax.jit, donate_argnums=(1,), static_argnums=())
        def decode_block(params, cache, tok, n_past, penalty, key, pos_delta):
            def body(carry, _):
                tok, cache, n_past, penalty, key = carry
                if glm1:
                    p = jnp.broadcast_to(n_past[None, None], (tok.shape[0], 1))
                    pos = jnp.stack([jnp.minimum(p, pos_delta),
                                     jnp.maximum(p - pos_delta, 0)])
                else:
                    pos = jnp.broadcast_to((n_past + pos_delta)[None, None],
                                           (tok.shape[0], 1))
                logits, cache = transformer_forward(cfg, params, tok, cache, n_past,
                                                    positions=pos)
                lf = logits[:, -1, :]
                key, sub = jax.random.split(key)
                nxt, _conf = sample_token(lf[0], scfg, sub, penalty)
                penalty = penalty_accept(penalty, nxt)
                return (nxt[None, None], cache, n_past + 1, penalty, key), nxt

            (tok, cache, n_past, penalty, key), toks = jax.lax.scan(
                body, (tok, cache, n_past, penalty, key), None, length=block)
            return toks, tok, cache, penalty, key

        self._decode_fns[key_s] = decode_block
        return decode_block

    # -- public API ---------------------------------------------------------
    def new_cache(self, batch: int = 1, max_len: int | None = None) -> KVCache:
        return init_cache(self.cfg, batch, max_len or self.max_length)

    def shift_cache(self, cache: KVCache, shift: int, keep: int, n_past: int) -> KVCache:
        """Context-extension Shift: drop `shift` positions after `keep`,
        sliding the rest left, and re-rotate cached keys by -shift positions
        (the reference shifts the cache on-graph, src/layers.cpp:2995-3022;
        re-rotation keeps RoPE consistent with the new absolute positions)."""
        from ..ops.rope import apply_rope, precompute_rope_cache, rope_mscale

        cfg = self.cfg

        from ..ops.attention import quantize_kv

        @partial(jax.jit, donate_argnums=(0,))
        def do_shift(cache, shift, keep):
            ks, vs = list(cache.k), list(cache.v)
            quant = cache.k_scale is not None
            kss = list(cache.k_scale) if quant else [None] * len(cache.k)
            vss = list(cache.v_scale) if quant else [None] * len(cache.k)
            for i in range(len(cache.k)):
                k, v = ks[i], vs[i]
                S = k.shape[1]
                pos = jnp.arange(S)
                src = jnp.where(pos < keep, pos, jnp.minimum(pos + shift, S - 1))
                k_new = jnp.take(k, src, axis=1)
                v_new = jnp.take(v, src, axis=1)
                if quant:
                    kss[i] = jnp.take(kss[i], src, axis=1)
                    vss[i] = jnp.take(vss[i], src, axis=1)
                if cfg.layer_spec(i % cfg.num_hidden_layers).use_rope and cfg.rope is not None:
                    # moved keys carry rope for their OLD absolute position;
                    # rotate by -shift (without the attn mscale, which is
                    # already baked into the stored keys)
                    delta = jnp.full((1, S), -shift, jnp.int32)
                    cos, sin = precompute_rope_cache(delta, cfg.rope)
                    m = rope_mscale(cfg.rope)
                    if m != 1.0:
                        cos, sin = cos / m, sin / m
                    kf = k_new
                    if quant:
                        kf = k_new.astype(jnp.float32) * kss[i][..., None]
                    k_rot = apply_rope(kf, cos, sin, layout=cfg.rope.layout,
                                       rot_dim=cfg.rope.resolved_rot_dim())
                    if quant:
                        k_rot, ks_rot = quantize_kv(k_rot)
                        kss[i] = jnp.where((pos < keep)[None, :, None], kss[i], ks_rot)
                    k_new = jnp.where((pos < keep)[None, :, None, None], k_new, k_rot.astype(k.dtype))
                ks[i] = k_new.astype(k.dtype)
                vs[i] = v_new.astype(v.dtype)
            return KVCache(k=tuple(ks), v=tuple(vs),
                           k_scale=tuple(kss) if quant else None,
                           v_scale=tuple(vss) if quant else None)

        return do_shift(cache, jnp.int32(shift), jnp.int32(keep))

    def prefill(self, ids, cache: KVCache, n_past: int, *,
                chunk: int | None = None):
        """Feed prompt ids ([T] or [B,T]) through the model in chunks.
        Returns (last-token logits [B,V] f32 on device, cache, n_past)."""
        # prefill_chunk is the speed/memory dial: the CLI's -Os (reference
        # opt_speed=false, main.cpp:368) drops it to 512, cutting peak
        # prefill activation memory at some TTFT cost
        chunk = chunk or getattr(self, "prefill_chunk", 4096)
        ids = np.atleast_2d(np.asarray(ids, dtype=np.int32))
        B, T = ids.shape
        if self._chunk_cap:
            chunk = min(chunk, self._chunk_cap)
        cache_len = self._write_capacity(cache)
        if n_past + T > cache_len:
            # keep the most recent tokens that fit (callers normally truncate
            # upstream via encode_history; this is the last-resort guard)
            drop = n_past + T - cache_len
            ids = ids[:, drop:]
            T = ids.shape[1]
        logits = None
        done = 0
        while done < T:
            n = min(chunk, T - done, cache_len - n_past)
            tpad = _fit_bucket(n, cache_len - n_past,
                               hi=max(16, min(chunk, cache_len)))
            n = min(n, tpad)
            buf = np.zeros((B, tpad), np.int32)
            buf[:, :n] = ids[:, done : done + n]
            fn = self._prefill_fn(tpad)
            logits, cache = fn(self.params, cache, jnp.asarray(buf),
                               jnp.int32(n_past), jnp.int32(n),
                               jnp.int32(self.pos_delta))
            n_past += n
            done += n
        return logits, cache, n_past

    def prefill_embeds(self, embeds, cache: KVCache, n_past: int,
                       positions=None, extra_residuals=None, ple_ids=None):
        """Prefill from pre-computed input embeddings [1, T, H] (multimodal
        prompts with spliced media embeddings).

        `positions` (optional): explicit rope positions — [T] 1-D, or [A, T]
        M-RoPE axis streams (t, h, w[, e]) for Qwen-VL-style models.
        `extra_residuals` (optional): [n_ds, B, T, H] DeepStack features
        added to the hidden states after layers 0..n_ds-1 (Qwen3-VL).
        `ple_ids` (optional): [1, T] per-layer-embedding token ids with media
        positions clamped to pad (Gemma4 run_model ids_for_layer)."""
        cfg = self.cfg
        T = embeds.shape[1]
        room = max(1, self._write_capacity(cache) - n_past)
        cap = min(self._chunk_cap or T, room)
        if T > cap:
            # SWA ring headroom / near-context-limit: feed in chunks
            pos_np = None if positions is None else np.atleast_2d(
                np.asarray(positions, np.int32))
            logits = None
            done = 0
            while done < T:
                n = min(cap, T - done)
                p = None if pos_np is None else pos_np[..., done:done + n]
                if p is not None and p.shape[0] == 1:
                    p = p[0]
                er = None if extra_residuals is None else \
                    extra_residuals[:, :, done:done + n]
                pi = None if ple_ids is None else ple_ids[:, done:done + n]
                logits, cache, n_past = self.prefill_embeds(
                    embeds[:, done:done + n], cache, n_past, positions=p,
                    extra_residuals=er, ple_ids=pi)
                done += n
            return logits, cache, n_past
        tpad = _fit_bucket(T, room, hi=max(16, self.max_length))
        if tpad != T:
            embeds = jnp.pad(embeds, ((0, 0), (0, tpad - T), (0, 0)))
            if extra_residuals is not None:
                extra_residuals = jnp.pad(
                    extra_residuals, ((0, 0), (0, 0), (0, tpad - T), (0, 0)))
        if ple_ids is not None and ple_ids.shape[1] != tpad:
            ple_ids = jnp.pad(ple_ids,
                              ((0, 0), (0, tpad - ple_ids.shape[1])))
        if positions is not None:
            positions = jnp.asarray(np.atleast_2d(np.asarray(positions, np.int32)))
            if positions.shape[-1] != tpad:
                positions = jnp.pad(positions,
                                    ((0, 0), (0, tpad - positions.shape[-1])))
            positions = positions[:, None, :]          # [A, B=1, T]
            if positions.shape[0] == 1:                # plain 1-D positions
                positions = positions[0]               # [B=1, T]

        key_s = ("embeds", tpad, positions is not None,
                 None if positions is None else positions.shape[0],
                 None if extra_residuals is None else extra_residuals.shape[0],
                 ple_ids is not None)
        if key_s not in self._prefill_cache:
            @partial(jax.jit, donate_argnums=(1,))
            def prefill_e(params, cache, embeds, n_past, n_tokens, pos, er,
                          pids):
                logits, cache = transformer_forward(
                    cfg, params, None, cache, n_past, input_embeds=embeds,
                    positions=pos, extra_residuals=er, n_valid=n_tokens,
                    ple_ids=pids, last_index=n_tokens - 1)
                return logits[:, 0, :], cache

            self._prefill_cache[key_s] = prefill_e
        fn = self._prefill_cache[key_s]
        logits, cache = fn(self.params, cache, embeds, jnp.int32(n_past),
                           jnp.int32(T), positions, extra_residuals, ple_ids)
        return logits, cache, n_past + T

    def generate_from_logits(self, logits, cache, n_past, gen_cfg,
                             *, is_terminator=lambda t: False, on_token=None,
                             should_stop=lambda: False, max_new=-1,
                             terminate_seq=None):
        """Continue decoding given last-token logits (post-prefill)."""
        scfg = gen_cfg.sampler_config()
        max_len = self.max_length if gen_cfg.max_length <= 0 else min(gen_cfg.max_length, self.max_length)
        if max_new <= 0:
            max_new = gen_cfg.max_new_tokens if gen_cfg.max_new_tokens > 0 else max_len
        penalty = PenaltyState.init(self.cfg.vocab_size, scfg.penalty_window)
        key = jax.random.key(gen_cfg.seed or 0)
        tok, _ = sample_token(logits[0], scfg, jax.random.split(key, 2)[1], penalty)
        penalty = penalty_accept(penalty, tok)
        tok = tok[None, None]
        first = int(tok[0, 0])
        out: list[int] = []
        emit = _Emitter(on_token, terminate_seq)
        if is_terminator(first):
            return out, cache, n_past
        out.append(first)
        if emit.step(out):
            return out, cache, n_past
        block = max(1, min(self.decode_block, max_new))
        decode = self._decode_fn(scfg, block)
        done = False
        while not done and len(out) < max_new and n_past + 1 < max_len and not should_stop():
            steps = min(block, max_new - len(out), max_len - 1 - n_past)
            toks, tok, cache, penalty, key = decode(
                self.params, cache, tok, jnp.int32(n_past), penalty, key,
                jnp.int32(self.pos_delta))
            toks_host = np.asarray(toks)
            for j in range(steps):
                t = int(toks_host[j])
                n_past += 1
                if is_terminator(t):
                    done = True
                    break
                out.append(t)
                if emit.step(out):
                    done = True
                    break
        emit.flush(out)
        return out, cache, n_past

    def generate(
        self,
        input_ids: list[int],
        gen_cfg: GenerationConfig,
        *,
        is_terminator: Callable[[int], bool] = lambda t: False,
        on_token: Optional[Callable[[int], None]] = None,
        perf: Optional[PerfInfo] = None,
        cache: Optional[KVCache] = None,
        n_past: int = 0,
        completion_limit: int = -1,
        should_stop: Callable[[], bool] = lambda: False,
        terminate_seq: Optional[list] = None,
    ):
        """Autoregressive generation.  Returns (generated ids, cache, n_past)."""
        scfg = gen_cfg.sampler_config()
        max_len = self.max_length if gen_cfg.max_length <= 0 else min(gen_cfg.max_length, self.max_length)
        max_new = completion_limit if completion_limit > 0 else (
            gen_cfg.max_new_tokens if gen_cfg.max_new_tokens > 0 else max_len)

        if cache is None:
            cache = self.new_cache(1, max_len)

        if self.cfg.rope is not None and self.cfg.rope.layout == "glm1":
            # reference: transformer->set_ctx(input_ids.size()) at generate
            # start (src/models.cpp:972); boundary rides in pos_delta
            self.pos_delta = max(n_past + len(input_ids) - 2, 0)

        t0 = time.perf_counter()
        logits, cache, n_past = self.prefill(input_ids, cache, n_past, chunk=gen_cfg.batch_size)

        penalty = PenaltyState.init(self.cfg.vocab_size, scfg.penalty_window)
        key = jax.random.key(gen_cfg.seed or 0)
        # sample the first token from prefill logits on device
        tok, _ = sample_token(logits[0], scfg, jax.random.split(key, 2)[1], penalty)
        penalty = penalty_accept(penalty, tok)
        tok = tok[None, None]
        first = int(tok[0, 0])
        if perf:
            perf.prompt_tokens += len(input_ids)
            perf.prompt_ms += (time.perf_counter() - t0) * 1000

        t1 = time.perf_counter()
        out: list[int] = []
        emit = _Emitter(on_token, terminate_seq)
        if is_terminator(first):
            if perf:
                perf.gen_ms += (time.perf_counter() - t1) * 1000
            return out, cache, n_past

        out.append(first)
        done = emit.step(out)

        block = max(1, min(self.decode_block, max_new))
        decode = self._decode_fn(scfg, block)
        while not done and len(out) < max_new and n_past + 1 < max_len and not should_stop():
            steps = min(block, max_new - len(out), max_len - 1 - n_past)
            toks, tok, cache, penalty, key = decode(
                self.params, cache, tok, jnp.int32(n_past), penalty, key,
                jnp.int32(self.pos_delta))
            toks_host = np.asarray(toks)            # one sync per block
            for j in range(steps):
                t = int(toks_host[j])
                n_past += 1
                if is_terminator(t):
                    done = True
                    break
                out.append(t)
                if emit.step(out):
                    done = True
                    break
            # tokens past `steps` in the block were speculative; n_past
            # advanced only for consumed ones so their cache slots will be
            # overwritten by the next block
        emit.flush(out)
        if perf:
            perf.gen_tokens += len(out)
            perf.gen_ms += (time.perf_counter() - t1) * 1000
        return out, cache, n_past
