"""Vectorized logit-filter stack — the in-jit equivalent of
``whisper_process_logits`` (/root/reference/thirdparty/whisper.cpp/
whisper.cpp:4489-4775).

Every rule of the reference is reproduced, but as masked vector ops over the
(beams, vocab) logit matrix so the whole stack runs on-device inside the
decode loop — the reference runs this per decoder on the host between every
step, which is exactly the host-round-trip bottleneck we remove.

Rule inventory (reference line cites):
 1. temperature scaling                      whisper.cpp:4516-4520
 2. suppress blank at start                  :4530-4537
 3. suppress <|notimestamps|>; no_timestamps :4539-4546
 4. suppress sot/nosp (+solm unless tdrz)    :4548-4555
 5. suppress task/lang/prev tokens           :4557-4568
 6. optional non-speech suppression          :4574-4593
 7. timestamp pairing rules                  :4595-4614
 8. max_initial_ts cap                       :4616-4625
 9. monotonic timestamps per decoder         :4627-4635
10. log_softmax                              :4637-4655
11. "sum of ts probs beats max text" rule    :4657-4709
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

_NEG_INF = np.float32(-np.inf)  # np: keep import free of backend init (multi-host needs jax.distributed.initialize first)


class FilterContext(NamedTuple):
    """Static (trace-time constant) data for the filter stack."""

    static_suppress: jax.Array   # (V,) bool — rules 3(first half),4,5 (+6)
    token_eot: int
    token_beg: int
    space_id: int                # id of " " (rule 2)
    max_initial_tid: int         # rule 8: round(max_initial_ts/precision)
    n_vocab: int


def build_filter_context(
    config,
    tokenizer,
    *,
    suppress_non_speech: bool = False,
    tdrz_enable: bool = False,
    max_initial_ts: float = 1.0,
    audio_ctx: Optional[int] = None,
    extra_suppress: Sequence[int] = (),
) -> FilterContext:
    """Precompute the static suppression mask on the host (once per model /
    params combination)."""
    V = config.n_vocab
    mask = np.zeros(V, dtype=bool)
    mask[config.token_not] = True          # rule 3 (always)
    mask[config.token_sot] = True          # rule 4
    mask[config.token_nosp] = True
    if not tdrz_enable:
        mask[config.token_solm] = True
    mask[config.token_translate] = True    # rule 5
    mask[config.token_transcribe] = True
    mask[config.token_prev] = True
    if config.is_multilingual:
        from .language import LANGUAGES
        for i in range(min(len(LANGUAGES), config.num_languages)):
            mask[config.token_lang(i)] = True
    if suppress_non_speech and tokenizer is not None:
        for tid in tokenizer.non_speech_token_ids():  # rule 6
            mask[tid] = True
    for tid in extra_suppress:
        mask[tid] = True

    # rule 8: precision = CHUNK_SIZE / n_audio_ctx seconds per ts token
    # (whisper.cpp:4618-4624).  NOTE upstream uses the model's full
    # n_audio_ctx here even when audio_ctx is reduced.
    precision = 30.0 / config.n_audio_ctx
    max_initial_tid = int(round(max_initial_ts / precision)) \
        if max_initial_ts > 0 else (V - config.token_beg)

    space_id = -1
    if tokenizer is not None and tokenizer.space_token_id is not None:
        space_id = tokenizer.space_token_id

    return FilterContext(
        static_suppress=jnp.asarray(mask),
        token_eot=config.token_eot,
        token_beg=config.token_beg,
        space_id=space_id,
        max_initial_tid=max_initial_tid,
        n_vocab=V,
    )


def _masked_log_softmax(logits: jax.Array) -> jax.Array:
    """log_softmax treating -inf as excluded (whisper.cpp:4637-4655)."""
    mx = jnp.max(logits, axis=-1, keepdims=True)
    shifted = logits - mx
    sumexp = jnp.sum(jnp.where(jnp.isfinite(logits), jnp.exp(shifted), 0.0),
                     axis=-1, keepdims=True)
    return jnp.where(jnp.isfinite(logits),
                     shifted - jnp.log(sumexp), _NEG_INF)


def process_logits(
    logits: jax.Array,        # (B, V) float32 — raw model output
    *,
    fctx: FilterContext,
    temperature: jax.Array,   # scalar f32 (0 => no scaling)
    is_initial: jax.Array,    # (B,) bool — no sampled tokens yet
    last_token: jax.Array,    # (B,) int32 — last sampled token (or -1)
    penult_token: jax.Array,  # (B,) int32 — second-to-last (or -1)
    n_tokens: jax.Array,      # (B,) int32 — sampled so far
    has_ts: jax.Array,        # (B,) bool
    seek_delta: jax.Array,    # (B,) int32
    suppress_blank: bool = True,
    no_timestamps: bool = False,
):
    """Returns (logits, logprobs, probs), all (B, V) float32.

    ``probs`` is exp(logprob) with exact 0 for suppressed entries
    (whisper.cpp:4712-4721).
    """
    B, V = logits.shape
    beg = fctx.token_beg
    eot = fctx.token_eot
    ids = jnp.arange(V)[None, :]  # (1, V)

    logits = logits.astype(jnp.float32)
    # rule 1: temperature scaling
    logits = jnp.where(temperature > 0, logits / jnp.maximum(temperature, 1e-8),
                       logits)

    # static suppressions (rules 3a, 4, 5, 6)
    logits = jnp.where(fctx.static_suppress[None, :], _NEG_INF, logits)

    # rule 2: suppress blank at start: eot and " "
    if suppress_blank:
        blank = (ids == eot) | (ids == fctx.space_id)
        logits = jnp.where(is_initial[:, None] & blank, _NEG_INF, logits)

    # rule 3b: no_timestamps suppresses every ts token
    if no_timestamps:
        logits = jnp.where(ids >= beg, _NEG_INF, logits)

    # rule 7: timestamps come in pairs (except before EOT)
    last_was_ts = (n_tokens > 0) & (last_token >= beg)
    penult_was_ts = (n_tokens < 2) | (penult_token >= beg)
    both = (last_was_ts & penult_was_ts)[:, None]
    only_last = (last_was_ts & ~penult_was_ts)[:, None]
    logits = jnp.where(both & (ids >= beg), _NEG_INF, logits)
    logits = jnp.where(only_last & (ids < eot), _NEG_INF, logits)

    # rule 8: initial timestamp cap
    cap = (ids > beg + fctx.max_initial_tid)
    logits = jnp.where(is_initial[:, None] & cap, _NEG_INF, logits)

    # rule 9: monotonic timestamps
    tid0 = (seek_delta // 2)[:, None]
    mono = (ids >= beg) & (ids < beg + tid0)
    logits = jnp.where(has_ts[:, None] & mono, _NEG_INF, logits)

    # rule 10: masked log_softmax
    logprobs = _masked_log_softmax(logits)

    # rule 11: if sum of ts probability exceeds the best text token, force a
    # timestamp sample
    ts_mask = ids >= beg
    ts_lp = logprobs[:, beg:]
    ts_max = jnp.max(ts_lp, axis=-1, keepdims=True)
    ts_sum = jnp.sum(jnp.where(jnp.isfinite(ts_lp),
                               jnp.exp(ts_lp - ts_max), 0.0),
                     axis=-1, keepdims=True)
    ts_logprob = jnp.where(ts_sum > 0, jnp.log(ts_sum) + ts_max, _NEG_INF)
    max_text = jnp.max(logprobs[:, :beg], axis=-1, keepdims=True)
    force_ts = (ts_logprob > max_text)  # (B, 1)
    kill_text = force_ts & (ids < beg)
    logits = jnp.where(kill_text, _NEG_INF, logits)
    logprobs = jnp.where(kill_text, _NEG_INF, logprobs)

    probs = jnp.where(jnp.isfinite(logprobs), jnp.exp(logprobs), 0.0)
    return logits, logprobs, probs


def timestamp_stats(probs: jax.Array, beg: int):
    """(pt, ptsum, tid) per beam: max/sum of timestamp-token probabilities
    (whisper_sample_token's ts bookkeeping, whisper.cpp:4792-4810)."""
    ts = probs[:, beg:]
    sum_ts = jnp.sum(ts, axis=-1)
    max_ts = jnp.max(ts, axis=-1)
    tid = beg + jnp.argmax(ts, axis=-1)
    pt = max_ts / (sum_ts + 1e-10)
    return pt, sum_ts, tid.astype(jnp.int32)
