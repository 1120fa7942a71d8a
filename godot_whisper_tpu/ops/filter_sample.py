"""Fused logit-filter + sampler Pallas kernel.

The reference runs its logit filters per decoder on the HOST between every
token (whisper_process_logits, whisper.cpp:4489-4775) — the main latency
sin of its decode loop.  Our jnp filter stack (decode/filters.py) already
runs on-device, but as ~35 separate VPU kernels over the (B, 51864) logit
row per step.  This kernel fuses the WHOLE stage — suppression rules,
masked log-softmax, the timestamp-vs-text rule, greedy/Gumbel sampling and
timestamp statistics — into ONE Pallas program processing every beam row
at once, logits resident in VMEM the entire time.

Semantics identical to decode/filters.process_logits +
window._sample_greedy; ``fused_filter_topk`` is the beam-expansion
variant (filter + top-K candidates + ts stats, whisper.cpp:4836-4909's
deterministic analogue).  The CPU paths keep the jnp implementation
(cross-checked by tests/test_filter_sample.py).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_NEG = -1e30  # plain python float: jnp scalars become captured consts
_ROW_BLOCK = 8  # beam rows per program: (8, ~52k) f32 block ~= 1.7 MB VMEM


class SampleOut(NamedTuple):
    token: jax.Array   # (B,) i32
    p: jax.Array       # (B,) f32
    plog: jax.Array    # (B,) f32
    pt: jax.Array      # (B,) f32
    ptsum: jax.Array   # (B,) f32
    tid: jax.Array     # (B,) i32


def _filter_lp(state_ref, temp_ref, logits_ref, suppress_ref,
               *, B: int, V: int, Vpad: int, eot: int, beg: int,
               space_id: int, max_initial_tid: int, suppress_blank: bool,
               no_timestamps: bool):
    """Shared filter stage: suppression rules + masked log-softmax +
    the timestamp-vs-text rule, on a (B, Vpad) block resident in VMEM.
    Returns (lp, probs, ids, ts_mask, col).  ``col`` reads per-row
    scalar state: [is_initial, last, penult, n_tokens, has_ts,
    seek_delta, argmax_flag]."""
    def col(j):
        return jnp.stack([state_ref[b, j] for b in range(B)]
                         ).reshape(B, 1)

    is_initial = col(0) != 0
    last = col(1)
    penult = col(2)
    n_tokens = col(3)
    has_ts = col(4) != 0
    seek_delta = col(5)
    temp = temp_ref[0, 0]

    l = logits_ref[...].astype(jnp.float32)          # (B, Vpad)
    l = jnp.where(temp > 0, l / jnp.maximum(temp, 1e-8), l)
    ids = lax.broadcasted_iota(jnp.int32, (B, Vpad), 1)

    sup = suppress_ref[...] != 0                     # (1, Vpad) — shared row
    sup = sup | (ids >= V)
    if suppress_blank:
        sup = sup | (is_initial & ((ids == eot) | (ids == space_id)))
    if no_timestamps:
        sup = sup | (ids >= beg)

    last_was_ts = (n_tokens > 0) & (last >= beg)
    penult_was_ts = (n_tokens < 2) | (penult >= beg)
    sup = sup | (last_was_ts & penult_was_ts & (ids >= beg))
    sup = sup | (last_was_ts & (~penult_was_ts) & (ids < eot))
    sup = sup | (is_initial & (ids > beg + max_initial_tid))
    sup = sup | (has_ts & (ids >= beg) & (ids < beg + seek_delta // 2))

    l = jnp.where(sup, _NEG, l)

    # masked log-softmax (per row)
    m = jnp.max(l, axis=1, keepdims=True)
    se = jnp.sum(jnp.where(sup, 0.0, jnp.exp(l - m)), axis=1,
                 keepdims=True)
    lse = jnp.log(se) + m
    lp = jnp.where(sup, _NEG, l - lse)

    # timestamp-sum-vs-best-text rule
    ts = ids >= beg
    ts_m = jnp.max(jnp.where(ts, lp, _NEG), axis=1, keepdims=True)
    ts_se = jnp.sum(jnp.where(ts & (~sup), jnp.exp(lp - ts_m), 0.0),
                    axis=1, keepdims=True)
    ts_lp = jnp.where(ts_se > 0, jnp.log(ts_se) + ts_m, _NEG)
    text_m = jnp.max(jnp.where(ts, _NEG, lp), axis=1, keepdims=True)
    force_ts = ts_lp > text_m
    lp = jnp.where(force_ts & (~ts), _NEG, lp)

    probs = jnp.where(lp > _NEG * 0.5, jnp.exp(lp), 0.0)
    return lp, probs, ids, ts, col


def _kernel(state_ref, temp_ref, seed_ref, logits_ref, suppress_ref,
            tok_ref, p_ref, plog_ref, pt_ref, ptsum_ref, tid_ref,
            *, B: int, V: int, Vpad: int, eot: int, beg: int,
            space_id: int, max_initial_tid: int, suppress_blank: bool,
            no_timestamps: bool, argmax_sample):
    """One program handles a block of B beam rows (the grid tiles the full
    batch into row blocks so VMEM stays bounded at any stream count).

    ``argmax_sample``: True/False specializes the kernel statically; None
    reads the mode from state col 6 at runtime — the in-jit temperature
    ladder flips argmax (t=0) to Gumbel sampling (t>0) mid-loop."""
    lp, probs, ids, ts, col = _filter_lp(
        state_ref, temp_ref, logits_ref, suppress_ref, B=B, V=V,
        Vpad=Vpad, eot=eot, beg=beg, space_id=space_id,
        max_initial_tid=max_initial_tid, suppress_blank=suppress_blank,
        no_timestamps=no_timestamps)

    if argmax_sample is True:
        choice_scores = probs
    else:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        bits = pltpu.prng_random_bits((B, Vpad))
        # mosaic lacks uint32->f32 casts: go through int32 with the top
        # bits masked off (24-bit uniform is plenty for Gumbel sampling)
        bits24 = pltpu.bitcast(bits, jnp.int32) & 0xFFFFFF
        u = bits24.astype(jnp.float32) * (1.0 / (1 << 24))
        gumbel = -jnp.log(-jnp.log(jnp.maximum(u, 1e-12)))
        choice_scores = jnp.where(lp > _NEG * 0.5, lp + gumbel, _NEG)
        if argmax_sample is None:  # runtime mode from state col 6
            choice_scores = jnp.where(col(6) != 0, probs, choice_scores)

    tok = jnp.argmax(choice_scores, axis=1).astype(jnp.int32)  # (B,)

    sel = ids == tok[:, None]
    p_sel = jnp.sum(jnp.where(sel, probs, 0.0), axis=1)
    lp_sel = jnp.max(jnp.where(sel, lp, _NEG), axis=1)

    # timestamp stats (whisper.cpp:4792-4810)
    sum_ts = jnp.sum(jnp.where(ts, probs, 0.0), axis=1)
    max_ts = jnp.max(jnp.where(ts, probs, 0.0), axis=1)
    tid = jnp.argmax(jnp.where(ts, probs, -1.0), axis=1).astype(jnp.int32)
    pt = max_ts / (sum_ts + 1e-10)

    is_ts_tok = tok >= beg
    tid = jnp.where(is_ts_tok, tok, tid)
    pt = jnp.where(is_ts_tok, p_sel, pt)

    for b in range(B):
        tok_ref[b, 0] = tok[b]
        p_ref[b, 0] = p_sel[b]
        plog_ref[b, 0] = lp_sel[b]
        pt_ref[b, 0] = pt[b]
        ptsum_ref[b, 0] = sum_ts[b]
        tid_ref[b, 0] = tid[b]


class TopKOut(NamedTuple):
    plog: jax.Array    # (B, K) f32 — top-K filtered logprobs, descending
    ids: jax.Array     # (B, K) i32
    p: jax.Array       # (B, K) f32 — exp(plog) (the probs at those ids)
    pt: jax.Array      # (B,) f32 — pre-merge timestamp stats
    ptsum: jax.Array   # (B,) f32
    tid: jax.Array     # (B,) i32


def _topk_kernel(state_ref, temp_ref, logits_ref, suppress_ref,
                 pk_ref, ik_ref, pp_ref, pt_ref, ptsum_ref, tid_ref,
                 *, B: int, V: int, Vpad: int, K: int, eot: int, beg: int,
                 space_id: int, max_initial_tid: int, suppress_blank: bool,
                 no_timestamps: bool):
    """Beam-expansion variant: the same fused filter stage, then the
    per-row top-K logprobs (K sequential argmax+mask passes — ties
    resolve to the LOWEST index, matching lax.top_k) and the timestamp
    stats, in ONE program.  Replaces ~35 VPU kernels + a (B, V) top_k +
    two (B, V) carried distributions per beam step."""
    lp, probs, ids, ts, _ = _filter_lp(
        state_ref, temp_ref, logits_ref, suppress_ref, B=B, V=V,
        Vpad=Vpad, eot=eot, beg=beg, space_id=space_id,
        max_initial_tid=max_initial_tid, suppress_blank=suppress_blank,
        no_timestamps=no_timestamps)

    # timestamp stats (whisper.cpp:4792-4810)
    sum_ts = jnp.sum(jnp.where(ts, probs, 0.0), axis=1)
    max_ts = jnp.max(jnp.where(ts, probs, 0.0), axis=1)
    tid = jnp.argmax(jnp.where(ts, probs, -1.0), axis=1).astype(jnp.int32)
    pt = max_ts / (sum_ts + 1e-10)
    for b in range(B):
        pt_ref[b, 0] = pt[b]
        ptsum_ref[b, 0] = sum_ts[b]
        tid_ref[b, 0] = tid[b]

    work = lp
    for k in range(K):
        best = jnp.max(work, axis=1)                     # (B,)
        bid = jnp.argmax(work, axis=1).astype(jnp.int32)
        pb = jnp.max(jnp.where(ids == bid[:, None], probs, 0.0), axis=1)
        for b in range(B):
            pk_ref[b, k] = best[b]
            ik_ref[b, k] = bid[b]
            pp_ref[b, k] = pb[b]
        work = jnp.where(ids == bid[:, None], _NEG, work)


def fused_filter_topk(
    logits: jax.Array,         # (B, V) f32 — RAW logits
    suppress_mask: jax.Array,  # (V,) bool
    *,
    K: int,
    is_initial: jax.Array, last_token: jax.Array, penult_token: jax.Array,
    n_tokens: jax.Array, has_ts: jax.Array, seek_delta: jax.Array,
    temperature: jax.Array,
    eot: int, beg: int, space_id: int, max_initial_tid: int,
    suppress_blank: bool, no_timestamps: bool,
) -> TopKOut:
    """One fused kernel call: the filter stack + masked log-softmax +
    per-row top-K expansion candidates + timestamp stats — the beam
    loop's whole pre-merge stage (whisper.cpp:4489-4775 + the top-k of
    :4836-4909's candidate generation, deterministic expansion)."""
    B, V = logits.shape
    Vpad = -(-V // 512) * 512
    BB = min(B, _ROW_BLOCK)
    Bpad = -(-B // BB) * BB

    logits_p = jnp.pad(logits, ((0, Bpad - B), (0, Vpad - V)),
                       constant_values=-1e30)
    sup_p = jnp.pad(suppress_mask.astype(jnp.int32), (0, Vpad - V),
                    constant_values=1)[None]

    state = jnp.stack([
        is_initial.astype(jnp.int32),
        last_token.astype(jnp.int32),
        penult_token.astype(jnp.int32),
        n_tokens.astype(jnp.int32),
        has_ts.astype(jnp.int32),
        seek_delta.astype(jnp.int32),
        jnp.zeros((B,), jnp.int32),
    ], axis=1)
    state = jnp.pad(state, ((0, Bpad - B), (0, 0)))
    temps = jnp.float32(temperature).reshape(1, 1)

    kernel = functools.partial(
        _topk_kernel, B=BB, V=V, Vpad=Vpad, K=K, eot=eot, beg=beg,
        space_id=space_id, max_initial_tid=max_initial_tid,
        suppress_blank=suppress_blank, no_timestamps=no_timestamps)

    outs = pl.pallas_call(
        kernel,
        grid=(Bpad // BB,),
        in_specs=[
            pl.BlockSpec((BB, 7), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BB, Vpad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BB, K), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BB, K), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BB, K), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BB, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BB, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BB, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bpad, K), jnp.float32),
            jax.ShapeDtypeStruct((Bpad, K), jnp.int32),
            jax.ShapeDtypeStruct((Bpad, K), jnp.float32),
            jax.ShapeDtypeStruct((Bpad, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bpad, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bpad, 1), jnp.int32),
        ),
        interpret=os.environ.get("GWT_PALLAS_INTERPRET") == "1",
    )(state, temps, logits_p, sup_p)

    pk, ik, pp, pt, ptsum, tid = outs
    return TopKOut(plog=pk[:B], ids=ik[:B], p=pp[:B],
                   pt=pt[:B, 0], ptsum=ptsum[:B, 0], tid=tid[:B, 0])


def fused_filter_sample(
    logits: jax.Array,         # (B, V) f32
    suppress_mask: jax.Array,  # (V,) bool — static suppressions
    *,
    is_initial: jax.Array, last_token: jax.Array, penult_token: jax.Array,
    n_tokens: jax.Array, has_ts: jax.Array, seek_delta: jax.Array,
    temperature: jax.Array, seeds: jax.Array,
    eot: int, beg: int, space_id: int, max_initial_tid: int,
    suppress_blank: bool, no_timestamps: bool, argmax_sample,
    argmax_flag: jax.Array | None = None,
) -> SampleOut:
    """One fused kernel call: filters + log-softmax + rules + sample.

    The batch axis is tiled into row blocks of ``_ROW_BLOCK`` so each
    program's VMEM footprint stays ~2 MB regardless of the stream count
    (a single (B, V) block OOMs VMEM at B >= 16 with V ~ 52k)."""
    B, V = logits.shape
    Vpad = -(-V // 512) * 512
    BB = min(B, _ROW_BLOCK)
    Bpad = -(-B // BB) * BB

    logits_p = jnp.pad(logits, ((0, Bpad - B), (0, Vpad - V)),
                       constant_values=-1e30)
    sup_p = jnp.pad(suppress_mask.astype(jnp.int32), (0, Vpad - V),
                    constant_values=1)[None]          # (1, Vpad) shared row

    if argmax_flag is None:
        argmax_flag = jnp.zeros((B,), jnp.int32)
    state = jnp.stack([
        is_initial.astype(jnp.int32),
        last_token.astype(jnp.int32),
        penult_token.astype(jnp.int32),
        n_tokens.astype(jnp.int32),
        has_ts.astype(jnp.int32),
        seek_delta.astype(jnp.int32),
        jnp.broadcast_to(jnp.asarray(argmax_flag, jnp.int32)
                         .reshape(-1), (B,)),
    ], axis=1)  # (B, 7)
    state = jnp.pad(state, ((0, Bpad - B), (0, 0)))
    temps = jnp.float32(temperature).reshape(1, 1)
    seeds2 = seeds.reshape(-1)[:1].reshape(1, 1).astype(jnp.int32)

    kernel = functools.partial(
        _kernel, B=BB, V=V, Vpad=Vpad, eot=eot, beg=beg, space_id=space_id,
        max_initial_tid=max_initial_tid, suppress_blank=suppress_blank,
        no_timestamps=no_timestamps, argmax_sample=argmax_sample)

    outs = pl.pallas_call(
        kernel,
        grid=(Bpad // BB,),
        in_specs=[
            pl.BlockSpec((BB, 7), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),    # state
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),    # temp
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),    # seed
            pl.BlockSpec((BB, Vpad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),    # logits
            pl.BlockSpec((1, Vpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),    # suppress (shared)
        ],
        out_specs=tuple(
            pl.BlockSpec((BB, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM) for _ in range(6)),
        out_shape=(
            jax.ShapeDtypeStruct((Bpad, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bpad, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bpad, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bpad, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bpad, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bpad, 1), jnp.int32),
        ),
        interpret=os.environ.get("GWT_PALLAS_INTERPRET") == "1",
    )(state, temps, seeds2, logits_p, sup_p)

    tok, p, plog, pt, ptsum, tid = outs
    return SampleOut(token=tok[:B, 0], p=p[:B, 0], plog=plog[:B, 0],
                     pt=pt[:B, 0], ptsum=ptsum[:B, 0], tid=tid[:B, 0])
