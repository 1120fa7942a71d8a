"""In-jit autoregressive decode of one 30 s window.

The reference's hottest loop (whisper.cpp:5288-5609) round-trips to the host
every token: sample on CPU threads, mutate the KV cache via seq_cp/seq_rm,
rebuild a ggml graph, copy logits back (whisper.cpp:2566-2572).  Here the
ENTIRE per-window loop — decoder step, logit-filter stack, sampling, beam
merge, per-decoder state machine — runs inside a single ``lax.while_loop``
under one jit.  The host sees only the final token matrix.

Semantics mirrored step-for-step:
- decoder slot state machine (completed/failed/has_ts/seek_delta/result_len,
  whisper.cpp:5421-5507);
- timestamp-token window advance + "don't go back in time" failure
  (whisper.cpp:5441-5455);
- EOT / max_tokens / end-of-audio completion incl. the result_len==0 rescue
  (whisper.cpp:5467-5490);
- repetition-loop failure at the last step (whisper.cpp:5500-5506);
- the weightless-stub test fast-path (whisper.cpp:5492-5497);
- beam candidate generation + global score sort + equal-score dedupe + KV
  reorder (whisper.cpp:5360-5419) — zero-copy in split-cache mode: the
  merge permutes a (B, NL) row map read by the attention kernel instead of
  moving cache bytes (the functional twin of the reference's seq_cp cell
  re-tagging); wide configs fall back to a bounded batch-axis gather.

One deliberate divergence: beam candidates are deterministic top-k over
logprobs (textbook beam search, as in OpenAI's reference decoder) rather
than the reference's k draws from a seeded discrete_distribution
(whisper.cpp:4894-4906) — deterministic expansion dominates it for WER and
removes RNG state from the hot loop.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..models.config import WhisperConfig
from ..models.model import (CrossKV, KVCache, QuantCrossKV,
                            param_compute_dtype, decoder_dense,
                            decoder_step, init_kv_cache,
                            round_cache_len)
from ..ops.attention import use_pallas
from ..ops.kv_reorder import reorder_kv_live
from ..ops.filter_sample import fused_filter_sample
from .filters import FilterContext, process_logits, timestamp_stats

SEEK_DELTA_FULL = 3000  # 100 * WHISPER_CHUNK_SIZE (whisper.cpp:5222)


def _xkv_map(xkv, fn):
    """Apply fn to every BATCHED array of a CrossKV/QuantCrossKV (the
    scalar t_valid field rides through untouched)."""
    return type(xkv)(*(fn(a) if getattr(a, "ndim", 0) > 1 else a
                       for a in xkv))


def _xkv_slice_one(xkv):
    return _xkv_map(xkv, lambda a: a[:, :1])


def _xkv_broadcast(xkv, B: int):
    if xkv[0].shape[1] == 1 and B > 1:
        return _xkv_map(xkv, lambda a: jnp.broadcast_to(
            a, (a.shape[0], B) + a.shape[2:]))
    return xkv


class LoopState(NamedTuple):
    i: jax.Array                 # scalar i32 — step counter
    kv: KVCache
    rowmap: Optional[jax.Array]  # (B, NL) i32 — split-cache beam mode
                                 # only (None otherwise): beam b's live
                                 # slot t lives at group row rowmap[b,t]
                                 # (the zero-copy merge indirection,
                                 # ops/split_attention.py)
    tokens: jax.Array            # (B, N_MAX) i32
    tok_p: jax.Array             # (B, N_MAX) f32
    tok_plog: jax.Array          # (B, N_MAX) f32
    tok_pt: jax.Array            # (B, N_MAX) f32
    tok_ptsum: jax.Array         # (B, N_MAX) f32
    tok_tid: jax.Array           # (B, N_MAX) i32
    probs: jax.Array             # (B, V) f32 — for the next sample
    logprobs: jax.Array          # (B, V) f32
    completed: jax.Array         # (B,) bool
    failed: jax.Array            # (B,) bool
    has_ts: jax.Array            # (B,) bool
    seek_delta: jax.Array        # (B,) i32
    result_len: jax.Array        # (B,) i32
    sum_logprobs_all: jax.Array  # (B,) f32
    rng: jax.Array               # PRNG key


class WindowResult(NamedTuple):
    """Host-side numpy view of one window decode."""
    tokens: np.ndarray
    tok_p: np.ndarray
    tok_plog: np.ndarray
    tok_pt: np.ndarray
    tok_ptsum: np.ndarray
    tok_tid: np.ndarray
    completed: np.ndarray
    failed: np.ndarray
    has_ts: np.ndarray
    seek_delta: np.ndarray
    result_len: np.ndarray
    sum_logprobs_all: np.ndarray
    n_steps: int


@dataclasses.dataclass(frozen=True)
class WindowStatics:
    """Hashable static configuration of one compiled window decoder."""
    config: WhisperConfig
    batch: int
    n_max: int
    prompt_pad: int
    strategy: str           # "greedy" | "beam"
    beam_size: int
    greedy_argmax: bool     # temperature == 0 in greedy mode
    suppress_blank: bool
    no_timestamps: bool
    single_segment: bool
    max_tokens: int
    test_mode: bool         # weightless stub model fast-path
    # per_stream: the batch axis is CONCURRENT STREAMS (each row its own
    # prompt / seek window) instead of beams of one stream — the TPU-native
    # throughput mode the reference cannot express (its parallelism is one
    # host thread per chunk, whisper.cpp:5817-5930).  Greedy only.
    per_stream: bool = False
    # fused: the filter+sample (greedy) or filter+top-K-expansion (beam)
    # stage runs as ONE ops/filter_sample.py Pallas program over carried
    # RAW logits, instead of ~35 VPU kernels + two carried (B, V)
    # distributions per step.  TPU-only; CPU keeps the jnp stack.
    fused: bool = False
    # kv_group: consecutive groups of kv_group batch rows (the decoders /
    # beams of one stream) share a single cross-KV row — the batched clip
    # loop's beam/best_of mode passes xkv with B // kv_group rows
    kv_group: int = 1


def use_split_cache(statics: WindowStatics) -> bool:
    """Beam decode stores prompt KV once per group and live KV per beam
    (ops/split_attention.py) when the packed-lane kernel fits; wider
    configs keep the single-cache path."""
    return (statics.strategy == "beam"
            and statics.beam_size * statics.config.n_text_head <= 128)


def _sample_greedy(st: LoopState, statics: WindowStatics, fctx: FilterContext,
                   argmax_flag=None):
    """Greedy / temperature sampling (whisper_sample_token,
    whisper.cpp:4777-4834).

    ``argmax_flag``: optional traced (B,) bool — when given, the mode is
    decided at runtime (the in-jit temperature ladder flips argmax at t=0
    to categorical at t>0 without a recompile)."""
    B = statics.batch
    if argmax_flag is None and statics.greedy_argmax:
        ids = jnp.argmax(st.probs, axis=-1).astype(jnp.int32)
        rng = st.rng
    else:
        rng, sub = jax.random.split(st.rng)
        keys = jax.random.split(sub, B)
        ids = jax.vmap(
            lambda k, lp: jax.random.categorical(k, lp))(keys, st.logprobs
                                                         ).astype(jnp.int32)
        if argmax_flag is not None:
            ids = jnp.where(argmax_flag,
                            jnp.argmax(st.probs, axis=-1).astype(jnp.int32),
                            ids)
    rows = jnp.arange(B)
    p = st.probs[rows, ids]
    plog = st.logprobs[rows, ids]
    pt, ptsum, tid = timestamp_stats(st.probs, fctx.token_beg)
    is_ts = ids >= fctx.token_beg
    tid = jnp.where(is_ts, ids, tid)
    pt = jnp.where(is_ts, p, pt)
    src = rows  # no reorder in greedy mode
    new_sum = st.sum_logprobs_all + jnp.where(st.completed | st.failed, 0.0,
                                              plog)
    return src, ids, p, plog, pt, ptsum, tid, new_sum, st, rng


def _sample_beam(st: LoopState, statics: WindowStatics, fctx: FilterContext):
    """Beam candidate generation from the carried (B, V) filtered
    distributions (the jnp filter-stack path; the fused Pallas path
    builds candidates in-kernel — run_decode_loop.sample_beam_fused)."""
    K = statics.beam_size
    rows = jnp.arange(statics.batch)
    cand_plog, cand_ids = lax.top_k(st.logprobs, K)        # (B, K)
    cand_p = st.probs[rows[:, None], cand_ids]
    pt0, ptsum0, tid0 = timestamp_stats(st.probs, fctx.token_beg)
    return _merge_beam(st, statics, fctx, cand_plog, cand_ids, cand_p,
                       pt0, ptsum0, tid0)


def _merge_beam(st: LoopState, statics: WindowStatics, fctx: FilterContext,
                cand_plog, cand_ids, cand_p, pt0, ptsum0, tid0):
    """Beam merge (whisper.cpp:5327-5419), GROUPED: the batch
    is G independent beam groups of K rows each (G = batch // beam_size;
    the single-stream host path is the G=1 special case, the batched clip
    loop runs G = n_streams groups in one program — the reference's
    analogue is one whisper_state per thread, each with its own beam
    pool, whisper.cpp:5817-5930).  ``cand_*`` are the per-row top-K
    expansion candidates; ``pt0/ptsum0/tid0`` the pre-merge per-row
    timestamp stats (gathered through ``src`` below)."""
    B, K = statics.batch, statics.beam_size
    G = B // K
    rows = jnp.arange(B)
    live = ~(st.completed | st.failed)

    cand_scores = st.sum_logprobs_all[:, None] + cand_plog  # (B, K)
    cand_scores = jnp.where(live[:, None], cand_scores, -jnp.inf)

    flat_scores = cand_scores.reshape(G, K * K)             # per group
    order = jnp.argsort(-flat_scores, axis=1)               # stable desc
    sorted_scores = jnp.take_along_axis(flat_scores, order, axis=1)

    # equal-score dedupe (whisper.cpp:5393).  The reference guards it with
    # i > 0 because its beam expansion SAMPLES candidates (equal draws
    # across the identical step-0 beams are legitimate); with this
    # implementation's deterministic top-k expansion the guard would make
    # every beam take the same argmax token at step 0 (degenerating the
    # search to greedy for one step), so the dedupe is active from step 0 —
    # all beams share state at step 0, dedupe collapses the K identical
    # candidate sets to the top-K DISTINCT tokens, exactly the textbook
    # (and HF-validated, tests/test_decode_parity.py) first expansion.
    n = K * K
    starts = jnp.concatenate(
        [jnp.ones((G, 1), bool),
         sorted_scores[:, 1:] != sorted_scores[:, :-1]], axis=1)
    group_rank = jnp.cumsum(starts, axis=1) - 1             # (G, K*K)
    n_groups = jnp.maximum(jnp.sum(starts, axis=1), 1)      # (G,)
    # first sorted position of each distinct-score run, per group
    first_pos = jnp.full((G, n), n - 1, dtype=jnp.int32)
    first_pos = first_pos.at[jnp.arange(G)[:, None], group_rank].min(
        jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (G, n)))

    # j-th live slot of each group takes run (slot_rank % n_runs)
    live_g = live.reshape(G, K)
    slot_rank = jnp.cumsum(live_g.astype(jnp.int32), axis=1) - 1
    target = jnp.where(live_g, slot_rank % n_groups[:, None], 0)
    chosen_sorted = jnp.take_along_axis(first_pos, target, axis=1)
    chosen_flat = jnp.take_along_axis(order, chosen_sorted, axis=1)

    src_beam = ((chosen_flat // K)
                + jnp.arange(G)[:, None] * K).reshape(B).astype(jnp.int32)
    ids_new = jnp.take_along_axis(
        cand_ids.reshape(G, n), chosen_flat, axis=1).reshape(B)
    plog_new = jnp.take_along_axis(
        cand_plog.reshape(G, n), chosen_flat, axis=1).reshape(B)
    score_new = jnp.take_along_axis(
        flat_scores, chosen_flat, axis=1).reshape(B)

    # dead slots keep themselves
    src = jnp.where(live, src_beam, rows)
    ids = jnp.where(live, ids_new.astype(jnp.int32), 0)
    plog = jnp.where(live, plog_new, 0.0)

    # gather candidate-carried state from source beams (whisper.cpp:5332,
    # 5397-5400): sequence, seek_delta, has_ts, result_len, token data.
    #
    # The KV history is NOT moved at all in split-cache mode: the merge
    # permutes the (B, NL) ROW MAP instead (rowmap' = rowmap[src], then
    # slot i -> own row for the incoming write) and the split-attention
    # kernel reads each beam's live slots through the map — the exact
    # functional twin of the reference's zero-copy kv_cache_seq_cp cell
    # re-tagging (whisper.cpp:5402-5418), at ~80 KB of i32 shuffling
    # per step instead of the ~0.5 ms bounded cache copy it replaced
    # (the copy itself had replaced a ~1.4 ms full-cache take; see
    # ops/kv_reorder.py, now only the wide-config fallback).
    if st.rowmap is not None:
        K_ = statics.beam_size
        own = (jnp.arange(B, dtype=jnp.int32) % K_)
        new_rowmap = lax.dynamic_update_slice(
            st.rowmap[src], own[:, None], (jnp.int32(0), st.i))
        st = st._replace(rowmap=new_rowmap)
    else:
        hi_live = statics.prompt_pad + st.i
        new_k, new_v = reorder_kv_live(st.kv.k, st.kv.v, src, hi_live)
        st = st._replace(kv=KVCache(k=new_k, v=new_v))
    # The (B, V) probs/logprobs are NOT gathered: next_probs overwrites
    # them unconditionally later this iteration, and the only uses of
    # the source beam's distribution are the chosen-token probability
    # and the (B,)-sized timestamp stats — gathered below as scalars
    # instead of moving 2 x 8.3 MB per step.
    st = st._replace(
        tokens=st.tokens[src],
        tok_p=st.tok_p[src], tok_plog=st.tok_plog[src],
        tok_pt=st.tok_pt[src], tok_ptsum=st.tok_ptsum[src],
        tok_tid=st.tok_tid[src],
        has_ts=st.has_ts[src], seek_delta=st.seek_delta[src],
        result_len=st.result_len[src],
    )

    # chosen candidate's probability from its SOURCE row's distribution:
    # cand_p[(src row, cand k)] == probs[src, ids] (probs = exp(logprobs))
    p = jnp.take_along_axis(cand_p.reshape(G, n), chosen_flat,
                            axis=1).reshape(B)
    pt, ptsum, tid = pt0[src], ptsum0[src], tid0[src]
    is_ts = ids >= fctx.token_beg
    tid = jnp.where(is_ts, ids, tid)
    pt = jnp.where(is_ts, p, pt)
    new_sum = jnp.where(live, score_new, st.sum_logprobs_all)
    return src, ids, p, plog, pt, ptsum, tid, new_sum, st, st.rng


def prompt_pass_per_stream(params, config: WhisperConfig, prompt: jax.Array,
                           n_prompt: jax.Array, xkv_b,
                           n_max: Optional[int] = None):
    """Per-stream prompt decode: each row its own prompt (B, P) with its
    own length (B,).  The cache is sized P + n_max — the padded prompt
    capacity P becomes the decode loop's ``split`` slot base.
    Returns (last_logits (B, V), kv)."""
    B, P = prompt.shape
    dtype = param_compute_dtype(params)
    kv0 = init_kv_cache(config, B,
                        cache_len=P + (n_max if n_max is not None
                                       else config.n_text_ctx // 2 - 4),
                        dtype=dtype)
    positions = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (B, P))
    plogits, kv = decoder_dense(
        params, config, prompt, positions, kv0, xkv_b, n_valid=n_prompt,
        logit_rows=jnp.broadcast_to(n_prompt - 1, (B,)))
    return plogits[:, 0], kv                                    # (B, V)


def prompt_pass_grouped(params, config: WhisperConfig, prompt: jax.Array,
                        n_prompt: jax.Array, xkv_g, n_dec: int,
                        n_max: Optional[int] = None):
    """Grouped prompt pass for the batched beam/best_of clip loop: G
    streams decode their prompts ONCE, then logits and self-KV broadcast
    to each stream's n_dec decoder rows (the functional equivalent of
    kv_cache_seq_cp 0->j per stream, whisper.cpp:5277).

    prompt: (G, P); n_prompt: (G,); xkv_g: cross-KV with G rows.
    Returns (last_logits (G*n_dec, V), kv with G*n_dec rows)."""
    last_g, kv_g = prompt_pass_per_stream(params, config, prompt,
                                          n_prompt, xkv_g, n_max=n_max)
    last = jnp.repeat(last_g, n_dec, axis=0)
    kv = KVCache(k=jnp.repeat(kv_g.k, n_dec, axis=1),
                 v=jnp.repeat(kv_g.v, n_dec, axis=1))
    return last, kv


def prompt_pass_shared(params, config: WhisperConfig, prompt: jax.Array,
                       n_prompt: jax.Array, xkv_b, B: int,
                       n_max: Optional[int] = None):
    """Shared prompt pass (whisper.cpp:5258-5285): decode with B=1,
    broadcast the KV cache to all decoders (the functional equivalent of
    kv_cache_seq_cp 0->j, whisper.cpp:5277)."""
    P = prompt.shape[-1]
    V = config.n_vocab
    dtype = param_compute_dtype(params)
    kv1 = init_kv_cache(config, 1,
                        cache_len=P + (n_max if n_max is not None
                                       else config.n_text_ctx // 2 - 4),
                        dtype=dtype)
    positions = jnp.arange(P, dtype=jnp.int32)[None]
    xkv1 = _xkv_slice_one(xkv_b)
    plogits, kv1 = decoder_dense(
        params, config, prompt[None], positions, kv1, xkv1,
        n_valid=jnp.reshape(n_prompt, (1,)),
        logit_rows=jnp.reshape(n_prompt - 1, (1,)))
    last_logits = jnp.broadcast_to(plogits[:, 0], (B, V))       # (B, V)
    kv = KVCache(
        k=jnp.broadcast_to(kv1.k, (kv1.k.shape[0], B) + kv1.k.shape[2:]),
        v=jnp.broadcast_to(kv1.v, (kv1.v.shape[0], B) + kv1.v.shape[2:]))
    return last_logits, kv


def run_decode_loop(params, config: WhisperConfig, fctx: FilterContext,
                    statics: WindowStatics, xkv_b, kv: KVCache,
                    last_logits: jax.Array, n_prompt: jax.Array,
                    temperature: jax.Array, seek: jax.Array,
                    seek_end: jax.Array, rng: jax.Array,
                    suppress_mask: jax.Array,
                    argmax_flag=None) -> LoopState:
    """The in-jit autoregressive window loop given a finished prompt pass.

    Shared by WindowDecoder (one jit per window) and decode/clip.py's
    device-resident whole-clip loop (windows + temperature ladder nested
    around this).  ``fctx`` must already carry the live suppress mask;
    ``argmax_flag`` optionally makes the argmax/sample decision a runtime
    (B,) flag instead of a static (the in-jit ladder needs that).
    """
    B = statics.batch
    N_MAX = statics.n_max
    eot = fctx.token_eot
    beg = fctx.token_beg
    tfctx = fctx

    def proc(logits, st_like, *, is_initial, n_tokens, last, penult,
             fctx):
        return process_logits(
            logits, fctx=fctx,
            temperature=st_like["temp"],
            is_initial=is_initial,
            last_token=last, penult_token=penult,
            n_tokens=n_tokens,
            has_ts=st_like["has_ts"], seek_delta=st_like["seek_delta"],
            suppress_blank=statics.suppress_blank,
            no_timestamps=statics.no_timestamps)

    if True:  # keep the original body's indentation depth
            # normalize loop-carried scalars to per-row vectors
            n_prompt = jnp.broadcast_to(jnp.asarray(n_prompt), (B,))
            seek = jnp.broadcast_to(jnp.asarray(seek), (B,))
            seek_end = jnp.broadcast_to(jnp.asarray(seek_end), (B,))

            def sample_fused(st: LoopState):
                """Fused Pallas filter+sample over the raw logits carried
                in st.probs (greedy/temperature modes)."""
                i = st.i
                rows = jnp.arange(B)
                last = jnp.where(i > 0, st.tokens[rows, jnp.maximum(i - 1, 0)],
                                 -1)
                penult = jnp.where(i > 1,
                                   st.tokens[rows, jnp.maximum(i - 2, 0)], -1)
                seeds = (jnp.int32(1000003) * i
                         + jnp.arange(B, dtype=jnp.int32) * 7919)
                out = fused_filter_sample(
                    st.probs, suppress_mask,
                    is_initial=jnp.full((B,), i == 0),
                    last_token=last, penult_token=penult,
                    n_tokens=jnp.full((B,), i, jnp.int32),
                    has_ts=st.has_ts, seek_delta=st.seek_delta,
                    temperature=temperature, seeds=seeds,
                    eot=fctx.token_eot, beg=fctx.token_beg,
                    space_id=fctx.space_id,
                    max_initial_tid=fctx.max_initial_tid,
                    suppress_blank=statics.suppress_blank,
                    no_timestamps=statics.no_timestamps,
                    argmax_sample=(statics.greedy_argmax
                                   if argmax_flag is None else None),
                    argmax_flag=argmax_flag)
                new_sum = st.sum_logprobs_all + jnp.where(
                    st.completed | st.failed, 0.0, out.plog)
                return (rows, out.token, out.p, out.plog, out.pt, out.ptsum,
                        out.tid, new_sum, st, st.rng)

            def sample_beam_fused(st: LoopState):
                """Fused beam pre-merge: the whole filter stack +
                log-softmax + top-K expansion + ts stats as ONE Pallas
                program over the carried RAW logits (replaces ~35 VPU
                kernels, a (B, V) top_k, and the 2x(B, V) carried
                distributions per step)."""
                from ..ops.filter_sample import fused_filter_topk
                i = st.i
                rows = jnp.arange(B)
                last = jnp.where(i > 0,
                                 st.tokens[rows, jnp.maximum(i - 1, 0)], -1)
                penult = jnp.where(i > 1,
                                   st.tokens[rows, jnp.maximum(i - 2, 0)],
                                   -1)
                out = fused_filter_topk(
                    st.probs, suppress_mask, K=statics.beam_size,
                    is_initial=jnp.full((B,), i == 0),
                    last_token=last, penult_token=penult,
                    n_tokens=jnp.full((B,), i, jnp.int32),
                    has_ts=st.has_ts, seek_delta=st.seek_delta,
                    temperature=temperature,
                    eot=fctx.token_eot, beg=fctx.token_beg,
                    space_id=fctx.space_id,
                    max_initial_tid=fctx.max_initial_tid,
                    suppress_blank=statics.suppress_blank,
                    no_timestamps=statics.no_timestamps)
                return _merge_beam(st, statics, fctx, out.plog, out.ids,
                                   out.p, out.pt, out.ptsum, out.tid)

            zero_b = jnp.zeros((B,), jnp.int32)
            if statics.fused:
                # raw logits carried; filtering happens inside the fused
                # sample kernel at the top of each iteration
                probs0 = last_logits.astype(jnp.float32)
                logprobs0 = jnp.zeros((B, 1), jnp.float32)
            else:
                st_like = {"temp": temperature,
                           "has_ts": jnp.zeros((B,), bool),
                           "seek_delta": jnp.full((B,), SEEK_DELTA_FULL,
                                                  jnp.int32)}
                _, logprobs0, probs0 = proc(
                    last_logits, st_like,
                    is_initial=jnp.ones((B,), bool),
                    n_tokens=zero_b, last=zero_b - 1, penult=zero_b - 1,
                    fctx=tfctx)

            if use_split_cache(statics):
                # split the prompt-pass cache: prompt slots stored ONCE
                # per beam group (rows are identical within a group, so
                # every K-th row suffices), live slots per beam in a
                # fresh compact cache written at slot i
                kb = statics.beam_size
                cp = round_cache_len(statics.prompt_pad)
                kv_prompt = KVCache(k=kv.k[:, ::kb, :cp],
                                    v=kv.v[:, ::kb, :cp])
                nl = round_cache_len(statics.n_max)
                lshape = (kv.k.shape[0], B, nl, kv.k.shape[3])
                kv = KVCache(k=jnp.zeros(lshape, kv.k.dtype),
                             v=jnp.zeros(lshape, kv.v.dtype))
                # zero-copy merge row map: every beam starts owning its
                # own live row for every slot
                rowmap0 = jnp.tile(
                    (jnp.arange(B, dtype=jnp.int32) % kb)[:, None],
                    (1, nl))
            else:
                kv_prompt = None
                rowmap0 = None

            st = LoopState(
                i=jnp.int32(0),
                kv=kv,
                rowmap=rowmap0,
                tokens=jnp.zeros((B, N_MAX), jnp.int32),
                tok_p=jnp.zeros((B, N_MAX), jnp.float32),
                tok_plog=jnp.zeros((B, N_MAX), jnp.float32),
                tok_pt=jnp.zeros((B, N_MAX), jnp.float32),
                tok_ptsum=jnp.zeros((B, N_MAX), jnp.float32),
                tok_tid=jnp.zeros((B, N_MAX), jnp.int32),
                probs=probs0, logprobs=logprobs0,
                completed=jnp.zeros((B,), bool),
                failed=jnp.zeros((B,), bool),
                has_ts=jnp.zeros((B,), bool),
                seek_delta=jnp.full((B,), SEEK_DELTA_FULL, jnp.int32),
                result_len=jnp.zeros((B,), jnp.int32),
                sum_logprobs_all=jnp.zeros((B,), jnp.float32),
                rng=rng)

            def cond(st: LoopState):
                return (st.i < N_MAX) & ~jnp.all(st.completed | st.failed)

            def body(st: LoopState) -> LoopState:
                i = st.i
                rows = jnp.arange(B)
                was_done = st.completed | st.failed

                if statics.strategy == "beam":
                    if statics.fused:
                        (src, ids, p, plog, pt, ptsum, tid, new_sum, st,
                         rng) = sample_beam_fused(st)
                    else:
                        (src, ids, p, plog, pt, ptsum, tid, new_sum, st,
                         rng) = _sample_beam(st, statics, fctx)
                elif statics.fused:
                    (src, ids, p, plog, pt, ptsum, tid, new_sum, st,
                     rng) = sample_fused(st)
                else:
                    (src, ids, p, plog, pt, ptsum, tid, new_sum, st,
                     rng) = _sample_greedy(st, statics, fctx, argmax_flag)

                live = ~was_done
                # append token i (masked for dead slots)
                def put(buf, val):
                    return jnp.where(live[:, None],
                                     buf.at[:, i].set(val), buf)
                tokens = put(st.tokens, ids)
                tok_p = put(st.tok_p, p)
                tok_plog = put(st.tok_plog, plog)
                tok_pt = put(st.tok_pt, pt)
                tok_ptsum = put(st.tok_ptsum, ptsum)
                tok_tid = put(st.tok_tid, tid)
                sum_lp = jnp.where(live, new_sum, st.sum_logprobs_all)

                # ---- decoder state machine (whisper.cpp:5421-5507)
                has_ts, failed, completed = st.has_ts, st.failed, st.completed
                seek_delta, result_len = st.seek_delta, st.result_len

                is_ts_tok = ids > beg
                sd_new = 2 * (ids - beg)
                back_in_time = (has_ts & (seek_delta > sd_new)
                                & (result_len < i))
                fail_ts = live & is_ts_tok & back_in_time
                take_ts = live & is_ts_tok & ~back_in_time
                seek_delta = jnp.where(take_ts, sd_new, seek_delta)
                result_len = jnp.where(take_ts, i + 1, result_len)
                has_ts = jnp.where(take_ts, True, has_ts)
                failed = failed | fail_ts

                alive = live & ~fail_ts
                end_of_text = ids == eot
                max_tok = (statics.max_tokens > 0) & (i >= statics.max_tokens)
                end_of_audio = has_ts & (seek + seek_delta + 100 >= seek_end)
                wants_end = alive & (end_of_text | max_tok | end_of_audio)

                zero_res = result_len == 0
                rescue = seek + seek_delta + 100 >= seek_end
                fail_zero = wants_end & zero_res & ~rescue
                result_len = jnp.where(wants_end & zero_res & rescue,
                                       i + 1, result_len)
                failed = failed | fail_zero
                complete_now = wants_end & ~(zero_res & ~rescue)
                if statics.single_segment:
                    result_len = jnp.where(complete_now, i + 1, result_len)
                    seek_delta = jnp.where(complete_now, SEEK_DELTA_FULL,
                                           seek_delta)
                completed = completed | complete_now

                if statics.test_mode:
                    # stub checkpoint: complete immediately
                    # (whisper.cpp:5492-5497)
                    still = alive & ~complete_now & ~fail_zero
                    seek_delta = jnp.where(still, SEEK_DELTA_FULL, seek_delta)
                    completed = completed | still

                # repetition-loop failure on the final step
                # (whisper.cpp:5500-5506)
                rep = ((i == N_MAX - 1)
                       & ((result_len == 0)
                          | (seek_delta < SEEK_DELTA_FULL // 2)))
                failed = failed | (alive & ~complete_now & rep)

                st = st._replace(
                    tokens=tokens, tok_p=tok_p, tok_plog=tok_plog,
                    tok_pt=tok_pt, tok_ptsum=tok_ptsum, tok_tid=tok_tid,
                    sum_logprobs_all=sum_lp, has_ts=has_ts, failed=failed,
                    completed=completed, seek_delta=seek_delta,
                    result_len=result_len, rng=rng)

                # ---- next-step logits for still-live decoders
                # (whisper.cpp:5530-5608)
                def next_probs(st: LoopState) -> LoopState:
                    # cache slot is the batch-uniform prompt_pad + i
                    # (just i in the split live cache); the true
                    # position n_prompt + i drives pos_embed
                    slot_i = (i if kv_prompt is not None
                              else statics.prompt_pad + i)
                    logits, kv = decoder_step(
                        params, config, tokens[:, i],
                        (n_prompt + i).astype(jnp.int32), st.kv, xkv_b,
                        lo=n_prompt, slot=slot_i,
                        split=statics.prompt_pad,
                        kv_group=statics.kv_group,
                        kv_prompt=kv_prompt, rowmap=st.rowmap)
                    if statics.fused:
                        return st._replace(
                            kv=kv, probs=logits.astype(jnp.float32))
                    penult = jnp.where(i >= 1, tokens[rows, jnp.maximum(
                        i - 1, 0)], -1)
                    st_like = {"temp": temperature, "has_ts": st.has_ts,
                               "seek_delta": st.seek_delta}
                    _, logprobs, probs = proc(
                        logits, st_like,
                        is_initial=jnp.zeros((B,), bool),
                        n_tokens=jnp.full((B,), i + 1, jnp.int32),
                        last=tokens[:, i], penult=penult, fctx=tfctx)
                    return st._replace(kv=kv, probs=probs, logprobs=logprobs)

                # UNCONDITIONAL next-step decode: wrapping this in
                # lax.cond(all_done, identity, next_probs) to skip the
                # final wasted step triggers XLA's conditional-splitting
                # inside nested loops — the layer scan gets DUPLICATED and
                # every token step ran the decoder twice (measured 86% of
                # device time).  One extra decoder call per window is
                # noise; a 2x per-step cost is not.
                st = next_probs(st)
                return st._replace(i=i + 1)

            return lax.while_loop(cond, body, st)


class WindowDecoder:
    """Compiles and caches jitted window-decode executables per static key."""

    def __init__(self, config: WhisperConfig, fctx: FilterContext):
        self.config = config
        self.fctx = fctx
        self._cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------------ build
    def _build(self, statics: WindowStatics):
        config, fctx = self.config, self.fctx
        B = statics.batch

        def window_fn(params, xkv_b: CrossKV, prompt: jax.Array,
                      n_prompt: jax.Array, temperature: jax.Array,
                      seek: jax.Array, seek_end: jax.Array,
                      rng: jax.Array, suppress_mask: jax.Array) -> LoopState:
            # the static suppression mask rides in as an argument — a (V,)
            # trace-time constant makes remote compiles pathologically slow
            tfctx = fctx._replace(static_suppress=suppress_mask)
            if statics.per_stream:
                last_logits, kv = prompt_pass_per_stream(
                    params, config, prompt, n_prompt, xkv_b,
                    n_max=statics.n_max)
            else:
                last_logits, kv = prompt_pass_shared(
                    params, config, prompt, n_prompt, xkv_b, B,
                    n_max=statics.n_max)
            return run_decode_loop(
                params, config, tfctx, statics, xkv_b, kv, last_logits,
                n_prompt, temperature, seek, seek_end, rng, suppress_mask)

        return jax.jit(window_fn)

    # ------------------------------------------------------------------- call
    def decode(
        self,
        params,
        xkv: CrossKV,               # batch axis == n_decoders (broadcast ok)
        prompt_tokens: np.ndarray,  # (P,) int32
        *,
        n_decoders: int,
        temperature: float,
        strategy: str,
        beam_size: int,
        seek: int,
        seek_end: int,
        suppress_blank: bool,
        no_timestamps: bool,
        single_segment: bool,
        max_tokens: int,
        test_mode: bool,
        seed: int = 0,
    ) -> WindowResult:
        config = self.config
        n_max = config.n_text_ctx // 2 - 4  # whisper.cpp:5288
        P = int(len(prompt_tokens))
        # bucket prompt length to limit recompiles
        pad = 8
        while pad < P:
            pad *= 2
        pad = min(pad, config.n_text_ctx // 2 + 8)

        statics = WindowStatics(
            config=config, batch=n_decoders, n_max=n_max, prompt_pad=pad,
            strategy=strategy, beam_size=beam_size,
            greedy_argmax=(strategy == "greedy" and temperature < 1e-6),
            suppress_blank=suppress_blank, no_timestamps=no_timestamps,
            single_segment=single_segment, max_tokens=max_tokens,
            test_mode=test_mode,
            fused=use_pallas())

        fn = self._cache.get(statics)
        if fn is None:
            fn = self._build(statics)
            self._cache[statics] = fn

        prompt_arr = np.zeros(pad, dtype=np.int32)
        prompt_arr[:P] = prompt_tokens

        # broadcast cross-KV to the decoder batch
        xkv = _xkv_broadcast(xkv, n_decoders)

        st = fn(params, xkv, jnp.asarray(prompt_arr), jnp.int32(P),
                jnp.float32(temperature), jnp.int32(seek),
                jnp.int32(seek_end), jax.random.PRNGKey(seed),
                self.fctx.static_suppress)

        return self._to_result(st)

    def decode_streams(
        self,
        params,
        xkv: CrossKV,               # (L, B, ...) — one row per stream
        prompts,                    # list of B int arrays (ragged)
        seeks,                      # (B,) int
        seek_ends,                  # (B,) int
        *,
        temperature: float = 0.0,
        suppress_blank: bool,
        no_timestamps: bool,
        single_segment: bool,
        max_tokens: int,
        test_mode: bool,
        seed: int = 0,
    ) -> WindowResult:
        """Per-stream batched greedy decode: the batch axis is concurrent
        utterance streams, each with its own prompt and seek window."""
        config = self.config
        B = len(prompts)
        n_max = config.n_text_ctx // 2 - 4
        max_p = max(1, max(len(p) for p in prompts))
        pad = 8
        while pad < max_p:
            pad *= 2
        pad = min(pad, config.n_text_ctx // 2 + 8)

        statics = WindowStatics(
            config=config, batch=B, n_max=n_max, prompt_pad=pad,
            strategy="greedy", beam_size=1,
            greedy_argmax=(temperature < 1e-6),
            suppress_blank=suppress_blank, no_timestamps=no_timestamps,
            single_segment=single_segment, max_tokens=max_tokens,
            test_mode=test_mode, per_stream=True,
            fused=use_pallas())

        fn = self._cache.get(statics)
        if fn is None:
            fn = self._build(statics)
            self._cache[statics] = fn

        prompt_arr = np.zeros((B, pad), dtype=np.int32)
        n_prompt = np.empty(B, dtype=np.int32)
        for i, p in enumerate(prompts):
            n = min(len(p), pad)
            prompt_arr[i, :n] = np.asarray(p[:n], dtype=np.int32)
            n_prompt[i] = max(n, 1)

        st = fn(params, xkv, jnp.asarray(prompt_arr), jnp.asarray(n_prompt),
                jnp.float32(temperature),
                jnp.asarray(np.asarray(seeks, dtype=np.int32)),
                jnp.asarray(np.asarray(seek_ends, dtype=np.int32)),
                jax.random.PRNGKey(seed), self.fctx.static_suppress)
        return self._to_result(st)

    def _to_result(self, st: LoopState) -> WindowResult:
        # ONE batched device->host transfer for the whole result set — a
        # dozen separate np.asarray() pulls each pay a full RPC round trip
        # on tunneled runtimes.
        (i, tokens, tok_p, tok_plog, tok_pt, tok_ptsum, tok_tid, completed,
         failed, has_ts, seek_delta, result_len, sum_lp) = jax.device_get(
            (st.i, st.tokens, st.tok_p, st.tok_plog, st.tok_pt,
             st.tok_ptsum, st.tok_tid, st.completed, st.failed, st.has_ts,
             st.seek_delta, st.result_len, st.sum_logprobs_all))
        return WindowResult(
            tokens=tokens, tok_p=tok_p, tok_plog=tok_plog, tok_pt=tok_pt,
            tok_ptsum=tok_ptsum, tok_tid=tok_tid, completed=completed,
            failed=failed, has_ts=has_ts, seek_delta=seek_delta,
            result_len=result_len, sum_logprobs_all=sum_lp,
            n_steps=int(i))
