"""Block-diffusion language models: WeDLM and LLaDA2.

- WEDLM (reference /root/reference/models/hunyuan.cpp:421 wedlm): Qwen3
  arch.  A sliding block of MASK tokens is iteratively denoised; each
  iteration the settled tokens are packed FIRST and the still-masked
  positions are appended LAST with their ORIGINAL rope positions
  (TensorPosHelper), causal over the packed order.  A masked position is
  accepted when its confidence clears a threshold (accept_algo:
  custom = sampler prob | prob = argmax softmax prob | entropy =
  distribution entropy + positional penalty below threshold); at least
  one position transfers per round.

- LLADA2 (reference /root/reference/models/bailing.cpp:385 llada):
  Bailing-MoE2 arch.  Fixed blocks with BLOCK-BIDIRECTIONAL attention
  (full attention within a block, causal across blocks — update_mask,
  bailing.cpp:427); per block up to `steps` denoise rounds with a
  transfer-count schedule; sampling forced to top_p.
"""
from __future__ import annotations

import numpy as np

from .base import RuntimeConfig, register_model
from .deepseek import BailingMoE2
from .model_types import ModelType
from .qwen import Qwen3


class _DiffusionBase:
    """Shared host-side denoising loop plumbing."""

    def _fwd(self, ids, cache, n_past, positions=None, mask_extra=None):
        import jax

        from ..nn.transformer import transformer_forward

        if not hasattr(self, "_jit_fwd"):
            cfg = self.cfg

            @jax.jit
            def fwd(params, ids, cache, n_past, positions, mask_extra):
                return transformer_forward(cfg, params, ids, cache, n_past,
                                           positions=positions,
                                           mask_extra=mask_extra)

            @jax.jit
            def fwd_nomask(params, ids, cache, n_past, positions):
                return transformer_forward(cfg, params, ids, cache, n_past,
                                           positions=positions)

            self._jit_fwd = fwd
            self._jit_fwd_nomask = fwd_nomask
        import jax.numpy as jnp

        ids = jnp.asarray(np.atleast_2d(np.asarray(ids, np.int32)))
        if positions is not None:
            positions = jnp.asarray(np.atleast_2d(np.asarray(positions, np.int32)))
        if mask_extra is None:
            return self._jit_fwd_nomask(self.params, ids, cache,
                                        jnp.int32(n_past), positions)
        return self._jit_fwd(self.params, ids, cache, jnp.int32(n_past),
                             positions, mask_extra)

    def _gen_setup(self, gen_cfg, cache, n_past, completion_limit):
        from ..nn.transformer import init_cache

        max_len = self.cfg.max_length if gen_cfg.max_length <= 0 else min(
            gen_cfg.max_length, self.cfg.max_length)
        max_new = completion_limit if completion_limit > 0 else (
            gen_cfg.max_new_tokens if gen_cfg.max_new_tokens > 0 else max_len)
        if cache is None:
            cache = init_cache(self.cfg, 1, max_len)
        return max_len, max_new, cache


@register_model(ModelType.WEDLM)
class WedLM(Qwen3, _DiffusionBase):
    """Tencent WeDLM (hunyuan.cpp wedlm; qwen::v3 Config/Tokenizer)."""

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        m = super().load(gf, rt)
        hf_cfg = (gf.meta or {}).get("config.json") or {}
        m.mask_tok_id = int(hf_cfg.get("mask_token_id", 151665))
        add = rt.additional
        m.block_size = int(add.get("block_size", 16))
        m.threshold = float(add.get("threshold", 0.7))
        m.pos_penalty_factor = float(add.get("pos_penalty_factor", 0.02))
        m.accept_algo = {"0": "entropy", "1": "prob", "2": "custom"}.get(
            str(add.get("accept_algo", "2")), "custom")
        return m

    def generate(self, input_ids, gen_cfg, *, is_terminator=lambda t: False,
                 on_token=None, perf=None, cache=None, n_past=0,
                 completion_limit=-1, should_stop=lambda: False,
                 terminate_seq=None, **_kw):
        import time

        import jax

        from ..ops.sampling import PenaltyState, sample_token

        if self.block_size <= 1:
            # degenerate to standard autoregressive decode
            return super().generate(
                input_ids, gen_cfg, is_terminator=is_terminator,
                on_token=on_token, perf=perf, cache=cache, n_past=n_past,
                completion_limit=completion_limit, should_stop=should_stop,
                terminate_seq=terminate_seq)
        scfg = gen_cfg.sampler_config()
        max_len, max_new, cache = self._gen_setup(gen_cfg, cache, n_past,
                                                  completion_limit)
        key = jax.random.key(gen_cfg.seed or 0)
        mask_id = self.mask_tok_id
        out: list[int] = []
        t0 = time.perf_counter()
        # prefill (all settled, sequential positions)
        ids = list(input_ids)
        if ids:
            _, cache = self._fwd(ids, cache, n_past,
                                 positions=list(range(n_past, n_past + len(ids))))
            n_past += len(ids)
            if perf:
                perf.prompt_tokens += len(ids)
                perf.prompt_ms += (time.perf_counter() - t0) * 1000
        block = [mask_id] * self.block_size
        next_pos_to_add = 0
        done = False
        while not done and len(out) < max_new and not should_stop():
            if next_pos_to_add == len(block):
                block = block + [mask_id] * self.block_size
            if n_past + len(block) >= max_len:
                break
            # pack: settled first (original positions), masks last
            settled = [(i, t) for i, t in enumerate(block) if t != mask_id]
            masked = [i for i, t in enumerate(block) if t == mask_id]
            seq = [t for _, t in settled] + [mask_id] * len(masked)
            pos = [n_past + i for i, _ in settled] + [n_past + i for i in masked]
            logits, cache = self._fwd(seq, cache, n_past, positions=pos)
            lg = np.asarray(logits)[0, len(settled):]          # [n_masked, V]

            transferred = 0
            candidates = []            # (prob, pos, token)
            for row, bpos in enumerate(masked):
                key, sub = jax.random.split(key)
                if self.accept_algo == "prob":
                    # HF modeling_wedlm: argmax prob of the temp-scaled
                    # softmax clears threshold
                    lf = lg[row] / max(gen_cfg.temperature, 1e-6) \
                        if gen_cfg.temperature > 1e-6 else lg[row]
                    p = np.exp(lf - lf.max())
                    p /= p.sum()
                    tok_id = int(p.argmax())
                    prob = float(p.max())
                    reject = prob <= self.threshold
                elif self.accept_algo == "entropy":
                    p = np.exp(lg[row] - lg[row].max())
                    p /= p.sum()
                    ent = float(-(p * np.log(np.maximum(p, 1e-30))).sum())
                    adj = ent + self.pos_penalty_factor * (bpos - next_pos_to_add)
                    reject = adj >= self.threshold
                    prob = -adj
                    tok, _c = sample_token(lg[row], scfg, sub, None)
                    tok_id = int(tok)
                else:
                    tok, conf = sample_token(lg[row], scfg, sub, None)
                    tok_id, prob = int(tok), float(conf)
                    reject = prob <= self.threshold
                if reject:
                    candidates.append((prob, bpos, tok_id))
                else:
                    block[bpos] = tok_id
                    transferred += 1
            if transferred < 1 and candidates:
                _, bpos, tok_id = max(candidates)
                block[bpos] = tok_id
            # emit the contiguous settled prefix
            i = next_pos_to_add
            while i < len(block) and block[i] != mask_id and not done:
                t = int(block[i])
                i += 1
                next_pos_to_add += 1
                if is_terminator(t):
                    done = True
                    break
                out.append(t)
                if on_token:
                    on_token(t)
                if len(out) >= max_new:
                    done = True
            # consume the settled prefix into the cache position base
            settle = next_pos_to_add
            if settle > 0:
                # re-run the settled prefix to refresh cache slots in order
                _, cache = self._fwd(block[:settle], cache, n_past,
                                     positions=list(range(n_past, n_past + settle)))
                block = block[settle:]
                next_pos_to_add = 0
                n_past += settle
        if perf:
            perf.gen_tokens += len(out)
        return out, cache, n_past


@register_model(ModelType.LLADA2)
class LLaDA2(BailingMoE2, _DiffusionBase):
    """LLaDA-2 MoE diffusion (bailing.cpp llada)."""

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from dataclasses import replace as _rep

        m = super().load(gf, rt)
        # block-bidirectional attention replaces the causal mask entirely
        # (update_mask, bailing.cpp:427) — every forward gets _block_mask
        m.cfg = _rep(m.cfg, causal=False)
        tid = m.tokenizer.tp.piece_to_id("<|mask|>")
        hf_cfg = (gf.meta or {}).get("config.json") or {}
        m.mask_tok_id = int(hf_cfg.get("mask_token_id", tid))
        add = rt.additional
        m.block_length = int(add.get("block_length", 32))
        m.steps = min(int(add.get("steps", 32)), m.block_length)
        m.threshold = float(add.get("threshold", 0.95))
        m._fraction_ids = []
        return m

    def forward_logits(self, input_ids, n_past: int = 0, cache=None):
        from ..nn.transformer import init_cache

        ids = np.atleast_2d(np.asarray(input_ids, np.int32))
        if cache is None:
            cache = init_cache(self.cfg, ids.shape[0],
                               max(ids.shape[1], self.block_length))
        return self._run_block(list(ids[0]), cache, n_past,
                               self.cfg.max_length)

    def _block_mask(self, n_past: int, T: int, S: int):
        """Additive [1, T, S] mask: query block (t//bl + past//bl) sees key
        blocks <= itself; bidirectional within a block (update_mask,
        bailing.cpp:427)."""
        import jax.numpy as jnp

        bl = self.block_length
        qb = (n_past + jnp.arange(T)) // bl
        kb = jnp.arange(S) // bl
        allow = qb[:, None] >= kb[None, :]
        return jnp.where(allow, 0.0, -1e30)[None]

    def _run_block(self, seq, cache, n_past, max_len):
        S = cache.k[0].shape[1]
        me = self._block_mask(n_past, len(seq), S)
        return self._fwd(seq, cache, n_past, mask_extra=me)

    def generate(self, input_ids, gen_cfg, *, is_terminator=lambda t: False,
                 on_token=None, perf=None, cache=None, n_past=0,
                 completion_limit=-1, should_stop=lambda: False,
                 terminate_seq=None, **_kw):
        import time
        from dataclasses import replace as _rep

        import jax

        from ..ops.sampling import sample_token

        scfg = _rep(gen_cfg.sampler_config(), do_sample=True, sampling="top_p")
        if cache is None:
            # fresh conversation: drop any partial-block carryover from a
            # previous, unrelated generate call
            self._fraction_ids = []
        max_len, max_new, cache = self._gen_setup(gen_cfg, cache, n_past,
                                                  completion_limit)
        key = jax.random.key(gen_cfg.seed or 0)
        mask_id = self.mask_tok_id
        bl = self.block_length
        # transfer schedule: block_length tokens over `steps` rounds, the
        # remainder loaded onto the LAST rounds (bailing.cpp:563-566)
        sched = [bl // self.steps] * self.steps
        for i in range(bl % self.steps):
            sched[self.steps - 1 - i] += 1
        out: list[int] = []
        t0 = time.perf_counter()
        ids = self._fraction_ids + list(input_ids)
        self._fraction_ids = []
        # prefill whole blocks
        nfull = len(ids) // bl * bl
        if nfull:
            _, cache = self._run_block(ids[:nfull], cache, n_past, max_len)
            n_past += nfull
            if perf:
                perf.prompt_tokens += nfull
                perf.prompt_ms += (time.perf_counter() - t0) * 1000
        block = ids[nfull:] + [mask_id] * (bl - len(ids) + nfull)
        next_pos_to_add = len(ids) - nfull
        done = False
        while not done and not should_stop():
            if n_past + bl >= max_len:
                break
            for step in range(self.steps):
                if done or all(t != mask_id for t in block):
                    break
                logits, cache = self._run_block(block, cache, n_past, max_len)
                lg = np.asarray(logits)[0]
                transferred = 0
                candidates = []            # (raw logit of token, pos, token)
                for i, t in enumerate(block):
                    if t != mask_id:
                        continue
                    key, sub = jax.random.split(key)
                    tok, conf = sample_token(lg[i], scfg, sub, None)
                    tok_id, prob = int(tok), float(conf)
                    if prob <= self.threshold:
                        candidates.append((float(lg[i][tok_id]), i, tok_id))
                        continue
                    block[i] = tok_id
                    transferred += 1
                n_to_transfer = min(sched[step] - transferred,
                                    sum(t == mask_id for t in block))
                if n_to_transfer > 0:
                    candidates.sort(reverse=True)
                    for _, i, tok_id in candidates[:n_to_transfer]:
                        block[i] = tok_id
                # emit contiguous settled prefix
                i = next_pos_to_add
                while i < bl and block[i] != mask_id and not done:
                    t = int(block[i])
                    i += 1
                    next_pos_to_add += 1
                    if is_terminator(t):
                        done = True
                        break
                    out.append(t)
                    if on_token:
                        on_token(t)
                    if len(out) >= max_new:
                        done = True
            if not done:
                for i in range(next_pos_to_add, bl):
                    next_pos_to_add += 1
                    t = int(block[i])
                    if is_terminator(t):
                        done = True
                        break
                    out.append(t)
                    if on_token:
                        on_token(t)
                    if len(out) >= max_new:
                        done = True
                        break
            if next_pos_to_add == bl:
                # block finalized: refresh the cache with the final ids
                _, cache = self._run_block(block, cache, n_past, max_len)
                n_past += bl
            if done:
                break
            next_pos_to_add = 0
            block = [mask_id] * bl
        if next_pos_to_add not in (0, bl):
            self._fraction_ids = [int(t) for t in block[:next_pos_to_add]]
        if perf:
            perf.gen_tokens += len(out)
        return out, cache, n_past
