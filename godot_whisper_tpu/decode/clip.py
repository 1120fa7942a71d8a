"""Device-resident whole-clip decode: the seek loop, temperature ladder and
token loop as ONE jitted program.

The reference drives its 30 s seek loop from the host, paying a round trip
per window for encode, per step for sampling, and per window for result
copies (whisper.cpp:5150-5804, logits copy at :2566-2572).  Round 1 of this
framework moved the per-token loop on-device (window.py) but kept the seek
loop and temperature ladder on the host — measured on a tunneled TPU
runtime, every host sync costs a ~25 ms round trip, so a 120 s clip paid
~10 round trips and the chip idled between them.

Here the ENTIRE transcription of a batch of clips runs inside one jit:

    while any stream can progress:            # seek loop (whisper.cpp:5150)
        encode current windows (all streams, batched)
        while not all settled:                # ladder (whisper.cpp:5184)
            build prompts from device-resident prompt_past
            prompt pass + token while-loop    # window.py run_decode_loop
            entropy/logprob gates on device   # whisper.cpp:5611-5671
        record window outputs, update prompt_past, advance seeks

The host dispatches once, then drains token buffers with a single
device_get.  Per-stream window cadence is independent: each stream advances
by its own seek_delta and settles at its own ladder temperature, in lockstep
waves (finished/waiting streams ride along masked — bounded waste, traded
for static shapes).

State is a donated pytree, so the loop is RESUMABLE: the host can feed mel
incrementally (``n_filled``/``final``) and call ``run`` again — the same
mechanism serves one-shot clips, many-stream batches, and streaming.

Decode modes (whisper.cpp:5035-5067): every stream runs ``n_dec``
decoder rows — BEAM search (deterministic top-k expansion, grouped
per-stream merge) on the t = 0 rung when strategy is beam, ``best_of``
independent samplers on t > 0 rungs — and the per-group sequence ranking
(length-penalized score, entropy gate) selects each stream's best
decoder on device (whisper.cpp:5611-5645).  The n_dec rows of a stream
share ONE cross-KV row through the grouped decode-attention kernel (no
materialized repeat; the reference shares it via its unified KV cache).

Reference map: seek loop whisper.cpp:5150-5804; ladder :5023-5032,
:5611-5671; prompt build :5237-5260; prompt_past update :5684-5692; stale
context drop :5176-5180.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..models.config import WhisperConfig
from ..models.model import cross_kv, encoder_forward, quantize_cross_kv
from ..ops.attention import use_pallas
from .filters import FilterContext
from .window import (WindowResult, WindowStatics, prompt_pass_grouped,
                     prompt_pass_per_stream, run_decode_loop)

SEEK_DELTA_FULL = 3000


@dataclasses.dataclass(frozen=True)
class ClipStatics:
    """Hashable static configuration of one compiled clip decoder."""
    config: WhisperConfig
    batch: int
    f_cap: int                 # mel frame capacity of the state buffer
    w_total: int               # buffered window slots per stream
    audio_ctx: int             # 0 => full n_audio_ctx
    temps: Tuple[float, ...]   # the temperature ladder
    use_past: bool             # prompt_past conditioning enabled at all
    n_init: int                # task-prefix token count
    n_max_text_ctx: int
    length_penalty: float
    entropy_thold: float
    logprob_thold: float
    suppress_blank: bool
    no_timestamps: bool
    single_segment: bool
    max_tokens: int
    test_mode: bool
    fused: bool
    seed: int
    n_dec: int = 1             # decoder rows per stream (beam/best_of)
    strategy: str = "greedy"   # "greedy" | "beam" (beam on the t=0 rung)
    cross_int8: bool = False   # int8-quantize the cross-KV per window


class ClipState(NamedTuple):
    """Device-resident, donated between ``run`` calls."""
    mel: jax.Array         # (B, n_mels, F_cap) f32
    n_len: jax.Array       # (B,) i32 — total valid frames of each clip
    n_filled: jax.Array    # (B,) i32 — frames filled so far (streaming)
    final: jax.Array       # (B,) bool — no more audio coming
    seek: jax.Array        # (B,) i32
    seek_start: jax.Array  # (B,) i32
    seek_end: jax.Array    # (B,) i32
    done: jax.Array        # (B,) bool
    past_buf: jax.Array    # (B, PAST_CAP) i32 — rolling prompt_past tail
    past_cnt: jax.Array    # (B,) i32
    w: jax.Array           # (B,) i32 — window slots used
    out_tokens: jax.Array  # (B, W, N_MAX) i32
    out_p: jax.Array       # (B, W, N_MAX) f32
    out_plog: jax.Array    # (B, W, N_MAX) f32
    out_pt: jax.Array      # (B, W, N_MAX) f32
    out_ptsum: jax.Array   # (B, W, N_MAX) f32
    out_tid: jax.Array     # (B, W, N_MAX) i32
    out_rl: jax.Array      # (B, W) i32
    out_seek: jax.Array    # (B, W) i32
    out_delta: jax.Array   # (B, W) i32
    out_emitted: jax.Array  # (B, W) bool
    out_temp: jax.Array    # (B, W) f32 — settled ladder temperature
    out_steps: jax.Array   # (B, W) i32 — decode steps spent (all attempts)


class ClipOutputs(NamedTuple):
    """Host-side numpy drain of a ClipState (one device_get)."""
    tokens: np.ndarray     # (B, W, N_MAX) int32
    p: np.ndarray
    plog: np.ndarray
    pt: np.ndarray
    ptsum: np.ndarray
    tid: np.ndarray
    rl: np.ndarray
    seek: np.ndarray
    delta: np.ndarray
    emitted: np.ndarray
    temp: np.ndarray
    steps: np.ndarray      # (B, W) decode steps spent (all ladder attempts)
    w: np.ndarray          # (B,) windows used
    cur_seek: np.ndarray   # (B,)
    done: np.ndarray       # (B,)
    past_buf: np.ndarray   # (B, PAST_CAP)
    past_cnt: np.ndarray   # (B,)

    def window_result(self, b: int, k: int) -> WindowResult:
        """View window k of stream b as a 1-row WindowResult for the host
        segment emitter (loop.py _emit_segments)."""
        return WindowResult(
            tokens=self.tokens[b, k][None], tok_p=self.p[b, k][None],
            tok_plog=self.plog[b, k][None], tok_pt=self.pt[b, k][None],
            tok_ptsum=self.ptsum[b, k][None], tok_tid=self.tid[b, k][None],
            completed=np.asarray([True]), failed=np.asarray([False]),
            has_ts=np.asarray([True]),
            seek_delta=self.delta[b, k][None],
            result_len=self.rl[b, k][None],
            sum_logprobs_all=np.zeros(1, np.float32),
            n_steps=int(self.rl[b, k]))


def _entropy_last32(tokens: jax.Array, rl: jax.Array,
                    n_max: int) -> jax.Array:
    """Token-histogram entropy of the final 32 tokens, per row — the
    device equivalent of whisper_sequence_score (whisper.cpp:4936-4957).
    Only meaningful where rl > 32 (the only case the gate reads it)."""
    idx = jnp.clip(rl[:, None] - 32 + jnp.arange(32)[None, :], 0, n_max - 1)
    vals = jnp.take_along_axis(tokens, idx, axis=1)          # (B, 32)
    eq = vals[:, :, None] == vals[:, None, :]                # (B, 32, 32)
    cj = jnp.sum(eq, axis=2).astype(jnp.float32)
    return -jnp.mean(jnp.log(cj / 32.0), axis=1)


class ClipDecoder:
    """Compiles and drives the device-resident clip loop."""

    PAST_SLACK = 9  # prev token + init prefix headroom in the prompt pad

    def __init__(self, config: WhisperConfig, fctx: FilterContext,
                 statics: ClipStatics, init_tokens: List[int]):
        self.config = config
        self.fctx = fctx
        self.statics = statics
        assert len(init_tokens) == statics.n_init
        self._init_tokens = jnp.asarray(
            np.asarray(init_tokens, dtype=np.int32))
        self.past_cap = config.n_text_ctx // 2
        self.n_max = config.n_text_ctx // 2 - 4
        if statics.use_past:
            p = min(self.past_cap, max(statics.n_max_text_ctx, 0)) \
                + statics.n_init + 1
        else:
            p = statics.n_init
        self.prompt_pad = -(-max(p, 8) // 8) * 8
        temps = statics.temps
        self._temps_arr = jnp.asarray(np.asarray(temps, np.float32))
        # prompt_past rides only into t < 0.5 attempts (whisper.cpp:5239)
        self._use_past_arr = jnp.asarray(
            np.asarray([t < 0.5 for t in temps]))
        self._loop = jax.jit(self._build(), donate_argnums=(1,))
        self._reset = jax.jit(self._reset_impl, donate_argnums=(0,))

    # ------------------------------------------------------------------ state
    def init_state(self, mel: jax.Array, n_lens, seeks, seek_ends,
                   past_init: Optional[List[List[int]]] = None,
                   n_filled=None, final=None, batch: Optional[int] = None,
                   to_device: bool = True) -> ClipState:
        """Build a fresh state around a mel buffer (B, n_mels, F_cap).

        ``batch``/``to_device=False`` build a HOST state over a local row
        block — the multi-host path (parallel/dist.py) assembles these into
        one dp-sharded global state."""
        st = self.statics
        B, W, N = (batch if batch is not None else st.batch,
                   st.w_total, self.n_max)
        assert mel.shape[0] == B, (mel.shape, B)
        i32 = functools.partial(np.asarray, dtype=np.int32)
        past_buf = np.zeros((B, self.past_cap), np.int32)
        past_cnt = np.zeros(B, np.int32)
        for b, toks in enumerate(past_init or []):
            tail = list(toks)[-self.past_cap:]
            past_buf[b, :len(tail)] = tail
            past_cnt[b] = len(tail)
        n_lens = i32(n_lens)
        wrap = jnp.asarray if to_device else np.asarray
        zeros = jnp.zeros if to_device else np.zeros
        return ClipState(
            mel=mel, n_len=wrap(n_lens),
            n_filled=wrap(i32(n_filled) if n_filled is not None
                          else n_lens),
            final=wrap(np.asarray(final) if final is not None
                       else np.ones(B, bool)),
            seek=wrap(i32(seeks)), seek_start=wrap(i32(seeks)),
            seek_end=wrap(i32(seek_ends)),
            done=zeros(B, bool),
            past_buf=wrap(past_buf), past_cnt=wrap(past_cnt),
            w=zeros(B, np.int32),
            out_tokens=zeros((B, W, N), np.int32),
            out_p=zeros((B, W, N), np.float32),
            out_plog=zeros((B, W, N), np.float32),
            out_pt=zeros((B, W, N), np.float32),
            out_ptsum=zeros((B, W, N), np.float32),
            out_tid=zeros((B, W, N), np.int32),
            out_rl=zeros((B, W), np.int32),
            out_seek=zeros((B, W), np.int32),
            out_delta=zeros((B, W), np.int32),
            out_emitted=zeros((B, W), bool),
            out_temp=zeros((B, W), np.float32),
            out_steps=zeros((B, W), np.int32),
        )

    @staticmethod
    def _reset_impl(state: ClipState) -> ClipState:
        """Clear the window counters after a drain (buffers get
        overwritten; only rows < w are ever read)."""
        return state._replace(w=jnp.zeros_like(state.w),
                              out_emitted=jnp.zeros_like(state.out_emitted))

    # ------------------------------------------------------------------- run
    def run(self, params, state: ClipState) -> ClipState:
        """One resume call: decodes windows until every stream is done,
        waiting on unfilled mel, or out of window slots."""
        return self._loop(params, state, self.fctx.static_suppress,
                          self._init_tokens, self._temps_arr,
                          self._use_past_arr)

    def reset_windows(self, state: ClipState) -> ClipState:
        return self._reset(state)

    def drain(self, state: ClipState) -> ClipOutputs:
        """ONE batched device->host pull of every output buffer.

        Three probability buffers (p/pt/ptsum) cross the wire as f16 —
        they are per-token display metadata and f16 carries their full
        useful precision at half the transfer.  ``plog`` stays exact f32:
        it is the one buffer with scoring semantics (Segment.avg_logprob,
        downstream quality gates) and consumers may sum/average it."""
        packed = self._pack_drain(
            state.out_p, state.out_plog, state.out_pt, state.out_ptsum)
        vals = jax.device_get((
            state.out_tokens, *packed,
            state.out_tid, state.out_rl, state.out_seek,
            state.out_delta, state.out_emitted, state.out_temp,
            state.out_steps, state.w,
            state.seek, state.done, state.past_buf, state.past_cnt))
        vals = list(vals)
        for i in range(1, 5):
            vals[i] = vals[i].astype(np.float32)
        return ClipOutputs(*vals)

    @staticmethod
    @jax.jit
    def _pack_drain(p, plog, pt, ptsum):
        import jax.numpy as _jnp
        return (p.astype(_jnp.float16), plog.astype(_jnp.float32),
                pt.astype(_jnp.float16), ptsum.astype(_jnp.float16))

    # ------------------------------------------------------------------ build
    def _build(self):
        statics = self.statics
        config = self.config
        fctx = self.fctx
        B = statics.batch
        ND = statics.n_dec
        BR = B * ND                     # decoder rows (streams x decoders)
        n_ctx = statics.audio_ctx or config.n_audio_ctx
        n_mels = config.n_mels
        N_MAX = self.n_max
        PAST_CAP = self.past_cap
        P = self.prompt_pad
        n_temps = len(statics.temps)
        n_init = statics.n_init
        take_cap = min(statics.n_max_text_ctx, PAST_CAP)
        rows = jnp.arange(B)

        def wst(strategy: str, argmax: bool, fused: bool) -> WindowStatics:
            return WindowStatics(
                config=config, batch=BR, n_max=N_MAX, prompt_pad=P,
                strategy=strategy, beam_size=ND,
                greedy_argmax=argmax,
                suppress_blank=statics.suppress_blank,
                no_timestamps=statics.no_timestamps,
                single_segment=statics.single_segment,
                max_tokens=statics.max_tokens,
                test_mode=statics.test_mode, per_stream=True,
                fused=fused, kv_group=ND)

        # rung 0: beam search (deterministic) or greedy/argmax; rungs
        # t > 0: n_dec independent samplers (whisper.cpp:5035-5067)
        beam0 = (statics.strategy == "beam" and ND > 1
                 and statics.temps[0] < 1e-6)
        wst0 = wst("beam" if beam0 else "greedy",
                   argmax=statics.temps[0] < 1e-6,
                   fused=statics.fused)
        wstS = wst("greedy", argmax=False, fused=statics.fused)

        def active_mask(st: ClipState) -> jax.Array:
            can_see = (st.n_filled >= st.seek + 2 * n_ctx) | st.final
            return (~st.done & (st.seek + 100 < st.seek_end) & can_see
                    & (st.w < statics.w_total))

        def build_prompt(past_buf, past_cnt, use_past_t, init_tokens):
            """Device prompt build (whisper.cpp:5237-5260):
            [prev] + past tail + task prefix, per stream."""
            if statics.use_past:
                use_past = use_past_t & (past_cnt > 0)          # (B,)
            else:
                use_past = jnp.zeros((B,), bool)
            n_take = jnp.minimum(past_cnt, take_cap)
            n_take = jnp.where(use_past, n_take, 0)
            off = jnp.where(use_past, 1 + n_take, 0)            # (B,)
            i = jnp.arange(P)[None, :]                          # (1, P)
            # past positions: prompt[i] = past_buf[cnt - take + i - 1]
            g = jnp.clip(past_cnt[:, None] - n_take[:, None] + i - 1,
                         0, PAST_CAP - 1)
            tok_past = past_buf[rows[:, None], g]
            tok_init = init_tokens[jnp.clip(i - off[:, None], 0, n_init - 1)]
            prompt = jnp.where(
                (i == 0) & use_past[:, None], config.token_prev,
                jnp.where(i < off[:, None], tok_past,
                          jnp.where(i < (off + n_init)[:, None],
                                    tok_init, 0))).astype(jnp.int32)
            return prompt, (off + n_init).astype(jnp.int32), n_take, use_past

        def outer_body(params, st: ClipState, suppress_mask, init_tokens,
                       temps_arr, use_past_arr) -> ClipState:
            active = active_mask(st)
            tfctx = fctx._replace(static_suppress=suppress_mask)

            # ---- batched encode of every stream's current window
            def one(mel_row, seek, n_len):
                win = lax.dynamic_slice(mel_row, (0, seek),
                                        (n_mels, 2 * n_ctx))
                idx = seek + jnp.arange(2 * n_ctx)
                return jnp.where((idx < n_len)[None, :], win, 0.0).T

            wins = jax.vmap(one)(st.mel, st.seek, st.n_len)
            enc = encoder_forward(params, config, wins,
                                  audio_ctx=statics.audio_ctx or None)
            xkv = cross_kv(params, config, enc)
            if statics.cross_int8:
                xkv = quantize_cross_kv(xkv, config.n_text_head)

            # stale context near the end of audio (whisper.cpp:5176-5180)
            past_cnt = jnp.where(
                active & (st.seek > st.seek_start)
                & (st.seek + 500 >= st.seek_end), 0, st.past_cnt)

            def rep(x):
                return jnp.repeat(x, ND, axis=0) if ND > 1 else x

            seek_r = rep(st.seek)
            seek_end_r = rep(st.seek_end)

            # ---- temperature ladder over unsettled streams
            def ladder_cond(c):
                return (c["t_idx"] < n_temps) & ~jnp.all(c["settled"])

            def make_ladder_body(w):
                def ladder_body(c):
                    t_idx = c["t_idx"]
                    temp = temps_arr[t_idx]
                    prompt, n_prompt, n_take, used_past = build_prompt(
                        st.past_buf, past_cnt, use_past_arr[t_idx],
                        init_tokens)
                    if ND > 1:
                        last_logits, kv = prompt_pass_grouped(
                            params, config, prompt, n_prompt, xkv, ND,
                            n_max=N_MAX)
                    else:
                        last_logits, kv = prompt_pass_per_stream(
                            params, config, prompt, n_prompt, xkv,
                            n_max=N_MAX)
                    # same per-attempt seeding as the host ladder
                    # (loop.py: seed + attempt index)
                    rng = jax.random.PRNGKey(statics.seed + t_idx)
                    ls = run_decode_loop(
                        params, config, tfctx, w, xkv, kv,
                        last_logits, rep(n_prompt), temp, seek_r,
                        seek_end_r, rng, suppress_mask)

                    # ---- per-group sequence ranking + gates
                    # (whisper.cpp:5611-5671): among each stream's ND
                    # decoders pick the best length-penalized score,
                    # entropy gate per decoder, logprob gate on the best
                    rl_r = ls.result_len                       # (BR,)
                    tmask = jnp.arange(N_MAX)[None, :] < rl_r[:, None]
                    total_r = jnp.sum(ls.tok_plog * tmask, axis=1)
                    if statics.length_penalty > 0:
                        pen_r = (((5.0 + rl_r) / 6.0)
                                 ** statics.length_penalty)
                    else:
                        pen_r = jnp.maximum(rl_r, 1).astype(jnp.float32)
                    entropy_r = _entropy_last32(ls.tokens, rl_r, N_MAX)
                    fail_h = ((rl_r > 32)
                              & (entropy_r < statics.entropy_thold))
                    valid_r = ~ls.failed & ~fail_h & (rl_r > 0)
                    score_r = jnp.where(valid_r, total_r / pen_r, -jnp.inf)

                    score_g = score_r.reshape(B, ND)
                    best_j = jnp.argmax(score_g, axis=1)       # (B,)
                    bidx = rows * ND + best_j
                    valid = jnp.any(valid_r.reshape(B, ND), axis=1)
                    avg = (total_r[bidx]
                           / jnp.maximum(rl_r[bidx], 1))
                    is_last = t_idx == n_temps - 1
                    success = valid & (is_last
                                       | (avg >= statics.logprob_thold))

                    upd = ~c["settled"] & valid

                    def take2(new, old):
                        return jnp.where(upd[:, None], new[bidx], old)

                    return {
                        "t_idx": t_idx + 1,
                        "settled": c["settled"] | (~c["settled"] & success),
                        "has_best": c["has_best"] | upd,
                        "bt_tokens": take2(ls.tokens, c["bt_tokens"]),
                        "bt_p": take2(ls.tok_p, c["bt_p"]),
                        "bt_plog": take2(ls.tok_plog, c["bt_plog"]),
                        "bt_pt": take2(ls.tok_pt, c["bt_pt"]),
                        "bt_ptsum": take2(ls.tok_ptsum, c["bt_ptsum"]),
                        "bt_tid": take2(ls.tok_tid, c["bt_tid"]),
                        "bt_rl": jnp.where(upd, rl_r[bidx], c["bt_rl"]),
                        "bt_delta": jnp.where(upd, ls.seek_delta[bidx],
                                              c["bt_delta"]),
                        "bt_take": jnp.where(upd,
                                             jnp.where(used_past, n_take,
                                                       0),
                                             c["bt_take"]),
                        "bt_temp": jnp.where(upd, temp, c["bt_temp"]),
                        "steps": c["steps"] + ls.i,
                    }
                return ladder_body

            zN = jnp.zeros((B, N_MAX))
            carry0 = {
                "t_idx": jnp.int32(0),
                "settled": ~active,     # inactive streams ride along settled
                "has_best": jnp.zeros(B, bool),
                "bt_tokens": zN.astype(jnp.int32),
                "bt_p": zN, "bt_plog": zN, "bt_pt": zN, "bt_ptsum": zN,
                "bt_tid": zN.astype(jnp.int32),
                "bt_rl": jnp.zeros(B, jnp.int32),
                "bt_delta": jnp.full((B,), SEEK_DELTA_FULL, jnp.int32),
                "bt_take": jnp.zeros(B, jnp.int32),
                "bt_temp": jnp.zeros(B, jnp.float32),
                "steps": jnp.int32(0),
            }
            # rung 0 runs OUTSIDE the rung while-loop: its decode mode
            # (beam/argmax) differs statically from the sampling rungs,
            # and a 1-trip lax.while_loop makes XLA restructure the
            # nested token loop (fission + duplicated layer scans,
            # measured 2x decoder cost per token)
            c = make_ladder_body(wst0)(carry0)
            if n_temps > 1:
                c = lax.while_loop(ladder_cond, make_ladder_body(wstS), c)

            emitted = c["has_best"] & active
            delta = jnp.where(c["has_best"], c["bt_delta"], SEEK_DELTA_FULL)

            # ---- record window outputs at slot (b, w_b)
            wslot = st.w

            def put2(buf, val):
                cur = buf[rows, wslot]
                return buf.at[rows, wslot].set(
                    jnp.where(active[:, None], val, cur))

            def put1(buf, val):
                cur = buf[rows, wslot]
                return buf.at[rows, wslot].set(jnp.where(active, val, cur))

            out_tokens = put2(st.out_tokens, c["bt_tokens"])
            out_p = put2(st.out_p, c["bt_p"])
            out_plog = put2(st.out_plog, c["bt_plog"])
            out_pt = put2(st.out_pt, c["bt_pt"])
            out_ptsum = put2(st.out_ptsum, c["bt_ptsum"])
            out_tid = put2(st.out_tid, c["bt_tid"])
            out_rl = put1(st.out_rl, jnp.where(emitted, c["bt_rl"], 0))
            out_seek = put1(st.out_seek, st.seek)
            out_delta = put1(st.out_delta, delta)
            out_emitted = put1(st.out_emitted, emitted)
            out_temp = put1(st.out_temp, c["bt_temp"])
            out_steps = put1(st.out_steps,
                             jnp.broadcast_to(c["steps"], (B,)))

            # ---- prompt_past <- kept prompt tail + new tokens
            # (whisper.cpp:5684-5692 via loop.py _emit_segments)
            kept = jnp.where(emitted, c["bt_take"], 0)
            rl_eff = jnp.where(emitted, c["bt_rl"], 0)
            total_len = kept + rl_eff
            keep = jnp.minimum(total_len, PAST_CAP)
            j = (total_len - keep)[:, None] + jnp.arange(PAST_CAP)[None, :]
            from_past = j < kept[:, None]
            pidx = jnp.clip(past_cnt[:, None] - kept[:, None] + j,
                            0, PAST_CAP - 1)
            tidx = jnp.clip(j - kept[:, None], 0, N_MAX - 1)
            newbuf = jnp.where(from_past,
                               st.past_buf[rows[:, None], pidx],
                               c["bt_tokens"][rows[:, None], tidx])
            newbuf = jnp.where(jnp.arange(PAST_CAP)[None, :] < keep[:, None],
                               newbuf, 0)
            upd_past = active & emitted
            past_buf = jnp.where(upd_past[:, None], newbuf, st.past_buf)
            past_cnt = jnp.where(upd_past, keep, past_cnt)

            seek = jnp.where(active, st.seek + delta, st.seek)
            done = st.done | (active & (seek + 100 >= st.seek_end))
            w = jnp.where(active, st.w + 1, st.w)

            return st._replace(
                seek=seek, done=done, w=w, past_buf=past_buf,
                past_cnt=past_cnt, out_tokens=out_tokens, out_p=out_p,
                out_plog=out_plog, out_pt=out_pt, out_ptsum=out_ptsum,
                out_tid=out_tid, out_rl=out_rl, out_seek=out_seek,
                out_delta=out_delta, out_emitted=out_emitted,
                out_temp=out_temp, out_steps=out_steps)

        def clip_loop(params, st: ClipState, suppress_mask, init_tokens,
                      temps_arr, use_past_arr) -> ClipState:
            return lax.while_loop(
                lambda s: jnp.any(active_mask(s)),
                lambda s: outer_body(params, s, suppress_mask, init_tokens,
                                     temps_arr, use_past_arr),
                st)

        return clip_loop
