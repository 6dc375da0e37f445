"""Continuous batching: N concurrent generation streams over one shared
batched KV cache.

The reference serves one slot behind a lock (bindings/server.nim:849-866
reports a single `/slots` entry); llama.cpp-style servers interleave
requests at token granularity.  The TPU-native version keeps ONE compiled
batched decode step over a [B_slots, S] cache and gives every slot its own
causal frontier:

  - per-slot `n_past` int vector -> per-row masks + scatter cache writes
    (ops/attention.py `_batched_npast_attention` / `update_kv_cache`)
  - prefill happens slot-at-a-time between decode blocks: the new prompt's
    K/V are computed with a B=1 forward against that slot's cache row
    (sliced out and written back in a donated jit), so running streams
    are never re-padded or interrupted
  - decode runs `block` autoregressive steps per dispatch inside one
    lax.scan (same inversion as runtime/generate.py); slots that finish
    mid-block waste at most block-1 speculative rows which are simply
    overwritten after the slot is reused
  - sampling is on-device and batched: shared SamplerConfig per engine,
    per-slot penalty rings (`penalty_accept_batched`) and per-slot RNG
    folded from each request's seed

Aggregate throughput therefore approaches the static-batch B=N decode
bench instead of 1/N of it.
"""
from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.transformer import TransformerConfig, init_cache, transformer_forward
from ..ops.sampling import (PenaltyState, SamplerConfig, penalty_accept,
                            penalty_accept_batched, sample_token)
from .generate import _fit_bucket


@dataclass
class _Slot:
    req_id: int
    out: "queue.Queue[int | None]"
    n_past: int = 0
    produced: int = 0
    max_new: int = 0
    is_terminator: Callable[[int], bool] = lambda t: False
    last_tok: int = 0
    done: bool = False


class StreamHandle:
    """Consumer side of one request: iterate to receive token ids."""

    def __init__(self, req_id: int):
        self.req_id = req_id
        self._q: "queue.Queue[int | None]" = queue.Queue()
        self.cancelled = False

    def __iter__(self):
        while True:
            t = self._q.get()
            if t is None:
                return
            yield t

    def cancel(self):
        self.cancelled = True


class BatchedEngine:
    """Slot scheduler + compiled batched decode for one model.

    Scope: dense-attention text models — full attention AND sliding-window
    ring caches (per-slot vector-n_past ring writes + per-row ring masks,
    reference src/layers.h:1973-2016) — but no compressed-MLA cache, no
    looped stacks, no linear attention, no M-RoPE positions; one
    SamplerConfig per engine (per-request max_new/seed are honored;
    sampling params use the engine's config so the decode step stays one
    compiled function).
    """

    def __init__(self, cfg: TransformerConfig, params, *, max_slots: int = 4,
                 max_length: int | None = None, decode_block: int = 8,
                 scfg: SamplerConfig | None = None, mesh=None):
        self._validate_config(cfg)
        self.cfg = cfg
        self.max_slots = max_slots
        self.max_length = max_length or cfg.max_length
        self.decode_block = decode_block
        self.scfg = scfg or SamplerConfig()
        self.mesh = mesh
        # SWA models: prefill chunks capped to the ring headroom so one
        # chunk's writes (incl. bucket padding, which lands AHEAD of the
        # frontier) never wrap onto keys still inside any query's window
        # (same rule as InferenceEngine._chunk_cap, src/layers.h:1973).
        from ..nn.transformer import SWA_EXTRA
        self._chunk_cap = 0
        for i in range(cfg.num_hidden_layers):
            w = cfg.layer_spec(i).sliding_window
            if 0 < w and w + SWA_EXTRA < (max_length or cfg.max_length):
                self._chunk_cap = SWA_EXTRA
                break

        self.cache = init_cache(cfg, max_slots, self.max_length)
        if mesh is not None:
            # serving composed with the mesh (SURVEY §2.7 P5 done right):
            # weights tensor-parallel over 'tp', the shared KV cache and
            # batch dim over 'dp'.  The input arrays CARRY their
            # NamedShardings, so the worker thread's jitted prefill/decode
            # propagate them through GSPMD without needing an active mesh
            # context on that thread.
            from ..parallel.mesh import shard_cache, shard_params

            params = shard_params(params, mesh)
            self.cache = shard_cache(self.cache, mesh, cfg)
        self.params = params
        self.n_past = np.zeros(max_slots, np.int64)
        self.toks = np.zeros(max_slots, np.int32)
        self.slots: list[Optional[_Slot]] = [None] * max_slots
        B = max_slots
        self.penalty = PenaltyState(
            token_count=jnp.zeros((B, cfg.vocab_size), jnp.int32),
            history=jnp.full((B, self.scfg.penalty_window), -1, jnp.int32),
            write_pos=jnp.zeros((B,), jnp.int32))
        self.keys = jax.random.split(jax.random.key(0), B)

        self._prefill_fns = {}
        self._decode_fn_c = None
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._pending: list[tuple[StreamHandle, list[int], int, Callable, int]] = []
        self._next_id = 0
        self._stop = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    @staticmethod
    def _validate_config(cfg: TransformerConfig):
        """Reject configs outside the v1 scope up front — otherwise the
        vector-n_past asserts in nn/transformer.py fire at decode TRACE time
        inside the worker thread and every consumer blocks forever."""
        bad = []
        if cfg.mla_compressed:
            bad.append("compressed-MLA cache")
        if getattr(cfg, "num_loops", 1) > 1:
            bad.append("looped stacks (num_loops > 1)")
        for i in range(cfg.num_hidden_layers):
            spec = cfg.layer_spec(i)
            if spec.linear_attn:
                bad.append(f"linear attention (layer {i})")
                break
        if bad:
            raise ValueError(
                "BatchedEngine v1 supports dense full-attention models only; "
                "unsupported: " + ", ".join(bad) +
                ". Serve this model single-slot (serve/server.py falls back).")

    # -- public ------------------------------------------------------------
    def submit(self, ids: list[int], *, max_new: int = -1,
               is_terminator: Callable[[int], bool] = lambda t: False,
               seed: int = 0) -> StreamHandle:
        with self._cv:
            h = StreamHandle(self._next_id)
            self._next_id += 1
            ids = list(ids)[-(self.max_length - 1):]   # keep newest that fit
            room = self.max_length - len(ids) - 1
            mn = min(max_new if max_new > 0 else room, room)
            self._pending.append((h, ids, mn, is_terminator, seed))
            self._cv.notify()
            return h

    def active_slots(self) -> list[dict]:
        with self._lock:
            return [{"id": i,
                     "state": 0 if s is None else 1,
                     "n_past": int(self.n_past[i]) if s else 0}
                    for i, s in enumerate(self.slots)]

    def shutdown(self):
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._worker.join(timeout=5)

    # -- compiled stages ----------------------------------------------------
    def _kernel_mesh_ctx(self):
        """Activate the qmm/flash kernel mesh during TRACING of the jitted
        stages when the engine is mesh-sharded: the Pallas call sites then
        take their shard_map'd variants instead of issuing a bare
        pallas_call on GSPMD-sharded operands (which XLA cannot partition —
        it would all-gather the full KV cache every step)."""
        import contextlib

        from ..ops import qmm

        return (qmm.kernel_mesh(self.mesh) if self.mesh is not None
                else contextlib.nullcontext())

    def _prefill_fn(self, tpad: int):
        if tpad in self._prefill_fns:
            return self._prefill_fns[tpad]
        cfg = self.cfg
        mesh_ctx = self._kernel_mesh_ctx

        @partial(jax.jit, donate_argnums=(1,), static_argnums=())
        def prefill(params, cache, ids, slot, n_past, n_tokens):
            with mesh_ctx():   # trace-time: routes kernels via shard_map
                # slice out this slot's cache rows -> a B=1 cache view
                row = jax.tree.map(
                    lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=0),
                    cache)
                logits, row = transformer_forward(cfg, params, ids, row,
                                                  n_past,
                                                  last_index=n_tokens - 1)
                cache = jax.tree.map(
                    lambda a, r: jax.lax.dynamic_update_slice_in_dim(a, r, slot, axis=0),
                    cache, row)
                return logits[0, 0, :], cache

        self._prefill_fns[tpad] = prefill
        return prefill

    def _decode_fn(self):
        if self._decode_fn_c is not None:
            return self._decode_fn_c
        cfg, scfg, block = self.cfg, self.scfg, self.decode_block
        mesh_ctx = self._kernel_mesh_ctx

        @partial(jax.jit, donate_argnums=(1, 4))
        def decode(params, cache, toks, n_past, penalty, keys, active):
            # toks [B], n_past [B] int32, active [B] bool
            def body(carry, _):
                toks, cache, n_past, penalty, keys = carry
                logits, cache = transformer_forward(
                    cfg, params, toks[:, None], cache, n_past)
                lf = logits[:, -1, :]
                keys = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
                sub = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
                if scfg.do_sample and scfg.sampling != "greedy":
                    nxt = jax.vmap(
                        lambda l, k, p: sample_token(l, scfg, k, p)[0]
                    )(lf, sub, penalty)
                else:
                    nxt, _ = sample_token(lf, scfg)
                nxt = jnp.where(active, nxt, toks)
                penalty = penalty_accept_batched(penalty, nxt)
                n_past = n_past + active.astype(n_past.dtype)
                return (nxt, cache, n_past, penalty, keys), nxt

            with mesh_ctx():   # trace-time: routes kernels via shard_map
                (toks, cache, n_past, penalty, keys), hist = jax.lax.scan(
                    body, (toks, cache, n_past, penalty, keys), None,
                    length=block)
            return hist, cache, n_past, penalty, keys

        self._decode_fn_c = decode
        return decode

    # -- scheduler loop ------------------------------------------------------
    def _free_slot(self) -> int:
        for i, s in enumerate(self.slots):
            if s is None:
                return i
        return -1

    def _admit(self, h: StreamHandle, ids, max_new, is_term, seed, slot: int):
        cfg = self.cfg
        ids = np.asarray(ids, np.int32)[None, :]
        T = ids.shape[1]
        # reset per-slot sampler state
        self.keys = self.keys.at[slot].set(jax.random.fold_in(
            jax.random.key(0), seed * self.max_slots + slot))
        self.penalty = PenaltyState(
            token_count=self.penalty.token_count.at[slot].set(0),
            history=self.penalty.history.at[slot].set(-1),
            write_pos=self.penalty.write_pos.at[slot].set(0))
        # chunked prefill into the slot's cache rows
        n_past = 0
        logits = None
        chunk = 1024
        if self._chunk_cap:
            chunk = min(chunk, self._chunk_cap)
        while n_past < T:
            n = min(chunk, T - n_past)
            tpad = _fit_bucket(n, self.max_length - n_past, hi=chunk)
            n = min(n, tpad)
            buf = np.zeros((1, tpad), np.int32)
            buf[:, :n] = ids[:, n_past:n_past + n]
            fn = self._prefill_fn(tpad)
            logits, self.cache = fn(self.params, self.cache, jnp.asarray(buf),
                                    jnp.int32(slot), jnp.int32(n_past),
                                    jnp.int32(n))
            n_past += n
        # Sample tok0 from the SLOT's RNG stream and penalty row (freshly
        # reset above) so penalties see the first generated token and the
        # sample stream matches the single-stream engine for the same seed.
        k0, sub = jax.random.split(self.keys[slot])
        self.keys = self.keys.at[slot].set(k0)
        row = PenaltyState(token_count=self.penalty.token_count[slot],
                           history=self.penalty.history[slot],
                           write_pos=self.penalty.write_pos[slot])
        tok0, _ = sample_token(jnp.asarray(np.asarray(logits)), self.scfg,
                               sub, row if self.scfg.do_sample else None)
        tok0 = int(tok0)
        row = penalty_accept(row, jnp.int32(tok0))
        self.penalty = PenaltyState(
            token_count=self.penalty.token_count.at[slot].set(row.token_count),
            history=self.penalty.history.at[slot].set(row.history),
            write_pos=self.penalty.write_pos.at[slot].set(row.write_pos))
        s = _Slot(req_id=h.req_id, out=h._q, n_past=n_past, max_new=max_new,
                  is_terminator=is_term, last_tok=tok0)
        if is_term(tok0) or max_new <= 0:
            h._q.put(None)
            return
        s.produced = 1
        h._q.put(tok0)
        self._handles[slot] = h
        self.slots[slot] = s
        self.n_past[slot] = n_past
        self.toks[slot] = tok0

    def _run(self):
        self._handles: list[Optional[StreamHandle]] = [None] * self.max_slots
        while True:
            with self._cv:
                while (not self._stop and not self._pending
                       and not any(self.slots)):
                    self._cv.wait()
                if self._stop:
                    for s in self.slots:
                        if s is not None:
                            s.out.put(None)
                    return
                # admit pending requests into free slots
                while self._pending:
                    slot = self._free_slot()
                    if slot < 0:
                        break
                    h, ids, mn, it, seed = self._pending.pop(0)
                    if h.cancelled:
                        h._q.put(None)
                        continue
                    try:
                        self._admit(h, ids, mn, it, seed, slot)
                    except Exception:
                        h._q.put(None)
                        raise
                active_any = any(s is not None for s in self.slots)
            if not active_any:
                continue
            try:
                self._decode_block_once()
            except Exception:
                # Drain every in-flight consumer before the worker dies so
                # no StreamHandle blocks forever on q.get().
                with self._cv:
                    for b, s in enumerate(self.slots):
                        if s is not None:
                            s.out.put(None)
                            self.slots[b] = None
                            self._handles[b] = None
                    for h, *_ in self._pending:
                        h._q.put(None)
                    self._pending.clear()
                raise

    def _decode_block_once(self):
        with self._lock:
            active = np.array([s is not None for s in self.slots])
            n_past_d = jnp.asarray(self.n_past.astype(np.int32))
            toks_d = jnp.asarray(self.toks)
        decode = self._decode_fn()
        hist, self.cache, n_past_new, self.penalty, self.keys = decode(
            self.params, self.cache, toks_d, n_past_d, self.penalty,
            self.keys, jnp.asarray(active))
        hist = np.asarray(hist)                     # [block, B]
        with self._cv:
            for b, s in enumerate(self.slots):
                if s is None:
                    continue
                h = self._handles[b]
                for j in range(self.decode_block):
                    t = int(hist[j, b])
                    s.n_past += 1
                    if s.is_terminator(t) or h.cancelled:
                        s.done = True
                        break
                    s.produced += 1
                    s.out.put(t)
                    if s.produced >= s.max_new or s.n_past + 1 >= self.max_length:
                        s.done = True
                        break
                if s.done:
                    s.out.put(None)
                    self.slots[b] = None
                    self._handles[b] = None
                    self.n_past[b] = 0
                    self.toks[b] = 0
                else:
                    self.n_past[b] = s.n_past
                    self.toks[b] = int(hist[-1, b])   # next step's input
            self._cv.notify()
