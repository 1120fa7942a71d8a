"""Host-stepped window decode — the slow path for host-interactive
constraints.

Used only when decoding needs per-token host interaction that cannot live
inside the jitted loop: GBNF grammar constraints (an unbounded pushdown
automaton, whisper.cpp:4221-4265) and user ``logits_filter_callback`` hooks
(whisper.h:414-421).  Per-token structure mirrors the reference's own loop
(whisper.cpp:5288-5609) — one decoder-step jit call per token, logits
pulled to host, filters + grammar applied, greedy/categorical sample,
grammar state advanced.

Greedy, single decoder.  Everything else uses window.WindowDecoder.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models.config import WhisperConfig
from ..models.model import (CrossKV, decoder_dense, decoder_step,
                            param_compute_dtype, init_kv_cache)
from .filters import FilterContext, process_logits, timestamp_stats
from .grammar import Grammar
from .window import SEEK_DELTA_FULL, WindowResult


class HostWindowDecoder:
    """Token-at-a-time decode with host-side logit post-processing."""

    def __init__(self, config: WhisperConfig, fctx: FilterContext,
                 tokenizer):
        self.config = config
        self.fctx = fctx
        self.tokenizer = tokenizer
        self._prompt_jit = {}
        self._step_jit = None

    def _prompt_fn(self, P: int):
        fn = self._prompt_jit.get(P)
        if fn is None:
            config = self.config

            def prompt_pass(params, xkv, prompt, n_prompt):
                kv = init_kv_cache(
                    config, 1, dtype=param_compute_dtype(params))
                positions = jnp.arange(P, dtype=jnp.int32)[None]
                logits, kv = decoder_dense(params, config, prompt[None],
                                           positions, kv, xkv,
                                           n_valid=n_prompt)
                return logits[0, n_prompt - 1], kv

            fn = jax.jit(prompt_pass)
            self._prompt_jit[P] = fn
        return fn

    def _step_fn(self):
        if self._step_jit is None:
            config = self.config

            def step(params, xkv, kv, token, n_past):
                # contiguous incremental cache: slot == position, window
                # [0, n_past] (split=0 collapses the gap)
                logits, kv = decoder_step(
                    params, config, token.reshape(1), n_past.reshape(1),
                    kv, xkv, lo=jnp.zeros(1, jnp.int32), slot=n_past,
                    split=0)
                return logits[0], kv

            self._step_jit = jax.jit(step)
        return self._step_jit

    def decode(
        self,
        params,
        xkv: CrossKV,
        prompt_tokens: np.ndarray,
        *,
        temperature: float,
        seek: int,
        seek_end: int,
        suppress_blank: bool,
        no_timestamps: bool,
        single_segment: bool,
        max_tokens: int,
        grammar: Optional[Grammar] = None,
        grammar_penalty: float = 100.0,
        logits_filter_callback: Optional[Callable] = None,
        seed: int = 0,
    ) -> WindowResult:
        config = self.config
        fctx = self.fctx
        beg, eot = fctx.token_beg, fctx.token_eot
        n_max = config.n_text_ctx // 2 - 4
        V = config.n_vocab
        rng = np.random.default_rng(seed)

        P = len(prompt_tokens)
        pad = 8
        while pad < P:
            pad *= 2
        prompt_arr = np.zeros(pad, dtype=np.int32)
        prompt_arr[:P] = prompt_tokens

        raw_logits, kv = self._prompt_fn(pad)(
            params, _xkv1(xkv), jnp.asarray(prompt_arr), jnp.int32(P))

        tokens: List[int] = []
        tok_data = {k: [] for k in ("p", "plog", "pt", "ptsum", "tid")}
        has_ts = False
        failed = completed = False
        seek_delta = SEEK_DELTA_FULL
        result_len = 0
        sum_logprobs = 0.0

        step = self._step_fn()

        for i in range(n_max):
            # filters (in jnp on a (1, V) row), then host adjustments
            last = tokens[-1] if tokens else -1
            penult = tokens[-2] if len(tokens) >= 2 else -1
            logits_f, logprobs_f, probs_f = process_logits(
                jnp.asarray(raw_logits).reshape(1, V),
                fctx=fctx, temperature=jnp.float32(temperature),
                is_initial=jnp.asarray([not tokens]),
                last_token=jnp.asarray([last], dtype=jnp.int32),
                penult_token=jnp.asarray([penult], dtype=jnp.int32),
                n_tokens=jnp.asarray([len(tokens)], dtype=jnp.int32),
                has_ts=jnp.asarray([has_ts]),
                seek_delta=jnp.asarray([seek_delta], dtype=jnp.int32),
                suppress_blank=suppress_blank,
                no_timestamps=no_timestamps)
            logits = np.asarray(logits_f[0]).copy()
            logprobs = np.asarray(logprobs_f[0]).copy()
            probs = np.asarray(probs_f[0]).copy()

            if logits_filter_callback is not None:
                logits_filter_callback(tokens, logits)
                logprobs, probs = _renormalize(logits)

            # grammar penalty when no timestamp was forced
            # (whisper.cpp:4684-4707)
            if grammar is not None and probs[:beg].sum() > 0:
                rejected = grammar.reject_tokens(
                    self.tokenizer.id_to_token, eot)
                if rejected:
                    logits[rejected] -= grammar_penalty
                    logprobs, probs = _renormalize(logits)

            # timestamp stats + sample
            pt_a, ptsum_a, tid_a = timestamp_stats(
                jnp.asarray(probs).reshape(1, V), beg)
            pt, ptsum, tid = (float(pt_a[0]), float(ptsum_a[0]),
                              int(tid_a[0]))
            if temperature < 1e-6:
                tok_id = int(np.argmax(probs))
            else:
                p = probs / probs.sum()
                tok_id = int(rng.choice(V, p=p))
            if tok_id >= beg:
                tid, pt = tok_id, float(probs[tok_id])

            tokens.append(tok_id)
            tok_data["p"].append(float(probs[tok_id]))
            tok_data["plog"].append(float(logprobs[tok_id]))
            tok_data["pt"].append(pt)
            tok_data["ptsum"].append(ptsum)
            tok_data["tid"].append(tid)
            sum_logprobs += float(logprobs[tok_id])

            if grammar is not None:
                grammar.accept_token(self.tokenizer.id_to_token[tok_id])

            # state machine (whisper.cpp:5421-5507)
            if tok_id > beg:
                sd_new = 2 * (tok_id - beg)
                if has_ts and seek_delta > sd_new and result_len < i:
                    failed = True
                    break
                seek_delta = sd_new
                result_len = i + 1
                has_ts = True

            if (tok_id == eot or (max_tokens > 0 and i >= max_tokens)
                    or (has_ts and seek + seek_delta + 100 >= seek_end)):
                if result_len == 0:
                    if seek + seek_delta + 100 >= seek_end:
                        result_len = i + 1
                    else:
                        failed = True
                        break
                if single_segment:
                    result_len = i + 1
                    seek_delta = SEEK_DELTA_FULL
                completed = True
                break

            if i == n_max - 1 and (result_len == 0
                                   or seek_delta < SEEK_DELTA_FULL // 2):
                failed = True
                break

            raw_logits, kv = step(
                params, _xkv1(xkv), kv,
                jnp.int32(tok_id), jnp.int32(P + i))

        n = len(tokens)
        pad_to = max(n, 1)

        def arr(vals, dtype):
            out = np.zeros((1, pad_to), dtype=dtype)
            out[0, :n] = vals
            return out

        return WindowResult(
            tokens=arr(tokens, np.int32),
            tok_p=arr(tok_data["p"], np.float32),
            tok_plog=arr(tok_data["plog"], np.float32),
            tok_pt=arr(tok_data["pt"], np.float32),
            tok_ptsum=arr(tok_data["ptsum"], np.float32),
            tok_tid=arr(tok_data["tid"], np.int32),
            completed=np.asarray([completed]),
            failed=np.asarray([failed]),
            has_ts=np.asarray([has_ts]),
            seek_delta=np.asarray([seek_delta], dtype=np.int32),
            result_len=np.asarray([result_len], dtype=np.int32),
            sum_logprobs_all=np.asarray([sum_logprobs], dtype=np.float32),
            n_steps=n)


def _xkv1(xkv: CrossKV) -> CrossKV:
    return CrossKV(k=xkv.k[:, :1], v=xkv.v[:, :1], t_valid=xkv.t_valid)


def _renormalize(logits: np.ndarray):
    """log_softmax + probs over possibly -inf logits."""
    finite = np.isfinite(logits)
    mx = logits[finite].max() if finite.any() else 0.0
    ex = np.where(finite, np.exp(logits - mx), 0.0)
    lse = np.log(ex.sum()) + mx
    logprobs = np.where(finite, logits - lse, -np.inf)
    probs = np.where(finite, np.exp(logprobs), 0.0)
    return logprobs, probs
