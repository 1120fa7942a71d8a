"""Batched multi-stream transcription — the TPU-native throughput mode.

The reference's only data parallelism is one host thread + state per audio
chunk (whisper_full_parallel, whisper.cpp:5817-5930).  On TPU the chip is
shared, so parallel streams must share compiled executables and batch their
windows: this module drives N independent utterance streams in lockstep —
one batched encoder call and one batched in-jit window decode per
iteration, each stream with its own prompt context and seek position
(window.py's ``per_stream`` mode).

Under a ("dp","tp") mesh the stream axis shards over dp: place the stacked
mel windows with ``parallel.sharding.batch_sharding`` and XLA splits both
encode and decode across chips.

Round-1 scope: greedy decode at the base temperature.  Streams whose
window fails the quality gates fall back to the full per-stream ladder via
a standard pipeline pass for that window only.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..audio.mel import frame_counts
from ..decode.loop import Segment, WhisperPipeline
from ..decode.params import TranscribeParams
from ..decode.sequence import score_sequence
from ..models.config import WhisperConfig
from ..models.model import CrossKV, cross_kv, encoder_forward


@dataclasses.dataclass
class _Stream:
    index: int
    n_len: int            # valid mel frames
    n_len_org: int
    seek: int
    seek_end: int
    prompt_past: List[int]
    segments: List[Segment]
    done: bool = False
    mel_host: Optional[np.ndarray] = None  # materialized for fallback only


class BatchTranscriber:
    """Transcribe many clips concurrently on one chip (or a dp-sharded
    mesh)."""

    def __init__(self, ctx):
        self.ctx = ctx
        self._encode_jit = {}

    def _batched_encode(self, params, mel_all: jax.Array, seeks, n_lens,
                        audio_ctx: int):
        """Device-side per-stream window slice + batched encode."""
        key = (audio_ctx, mel_all.shape)
        fn = self._encode_jit.get(key)
        if fn is None:
            config = self.ctx.config
            n_ctx = audio_ctx or config.n_audio_ctx

            def fn_impl(params, mel_all, seeks, n_lens):
                def one(mel_row, seek, n_len):
                    win = jax.lax.dynamic_slice(
                        mel_row, (0, seek), (config.n_mels, 2 * n_ctx))
                    idx = seek + jnp.arange(2 * n_ctx)
                    return jnp.where((idx < n_len)[None, :], win, 0.0).T

                wins = jax.vmap(one)(mel_all, seeks, n_lens)
                enc = encoder_forward(params, self.ctx.config, wins,
                                      audio_ctx=audio_ctx or None)
                return cross_kv(params, self.ctx.config, enc)

            fn = jax.jit(fn_impl)
            self._encode_jit[key] = fn
        return fn(params, mel_all,
                  jnp.asarray(np.asarray(seeks, dtype=np.int32)),
                  jnp.asarray(np.asarray(n_lens, dtype=np.int32)))

    def transcribe(self, clips: List[np.ndarray],
                   tparams: Optional[TranscribeParams] = None
                   ) -> List[List[Segment]]:
        ctx = self.ctx
        pipe: WhisperPipeline = ctx.pipeline
        config: WhisperConfig = ctx.config
        tparams = tparams or TranscribeParams()
        if tparams.token_timestamps:
            raise NotImplementedError(
                "token_timestamps in batch mode lands with the batched "
                "energy pass; use per-stream full() meanwhile")

        # task prefix (shared across streams)
        prompt_init = [config.token_sot]
        language = tparams.language or "en"
        if config.is_multilingual:
            from ..decode.language import lang_id
            prompt_init.append(config.token_lang(lang_id(language)))
            prompt_init.append(config.token_translate if tparams.translate
                               else config.token_transcribe)
        no_timestamps = tparams.no_timestamps or config.is_distil
        if no_timestamps:
            prompt_init.append(config.token_not)

        # batched device-resident mel for ALL clips in one call
        mel_all, n_lens = pipe.mel.device_batch(clips)

        streams: List[_Stream] = []
        for i, clip in enumerate(clips):
            _, n_len_org = frame_counts(len(clip))
            seek_start = tparams.offset_ms // 10
            seek_end = (n_len_org if tparams.duration_ms == 0
                        else seek_start + tparams.duration_ms // 10)
            st = _Stream(index=i, n_len=n_lens[i], n_len_org=n_len_org,
                         seek=seek_start, seek_end=seek_end,
                         prompt_past=[], segments=[])
            if seek_end < seek_start + 100:
                st.done = True
            if tparams.initial_prompt:
                st.prompt_past.extend(
                    pipe.tokenizer.encode(tparams.initial_prompt))
            streams.append(st)

        wd = pipe._window_decoder(tparams)
        n_ctx = tparams.audio_ctx or config.n_audio_ctx
        B = len(streams)

        while True:
            active = [i for i, s in enumerate(streams)
                      if not s.done and s.seek + 100 < s.seek_end]
            if not active:
                break

            # batched encode of every stream's current window (inactive
            # streams re-encode their last window — wasted lanes keep the
            # shape static; they are masked at emission)
            xkv = self._batched_encode(
                pipe.params, mel_all, [s.seek for s in streams],
                [s.n_len for s in streams], tparams.audio_ctx)

            prompts = []
            for s in streams:
                prompt: List[int] = []
                if s.prompt_past and tparams.n_max_text_ctx > 0:
                    n_take = min(tparams.n_max_text_ctx,
                                 config.n_text_ctx // 2, len(s.prompt_past))
                    prompt = [config.token_prev] + s.prompt_past[-n_take:]
                prompts.append(prompt + prompt_init)

            res = wd.decode_streams(
                pipe.params, xkv, prompts,
                seeks=[s.seek for s in streams],
                seek_ends=[s.seek_end for s in streams],
                temperature=tparams.temperature,
                suppress_blank=tparams.suppress_blank,
                no_timestamps=no_timestamps,
                single_segment=tparams.single_segment,
                max_tokens=tparams.max_tokens,
                test_mode=(pipe.n_loaded == 0),
                seed=tparams.seed)

            for i in active:
                s = streams[i]
                rl = int(res.result_len[i])
                ok = not bool(res.failed[i])
                if ok and rl > 32:
                    sc = score_sequence(res.tokens[i, :rl].tolist(),
                                        res.tok_plog[i, :rl],
                                        tparams.length_penalty)
                    ok = sc.entropy >= tparams.entropy_thold

                if not ok and tparams.temperature_inc > 0:
                    # quality-gate fallback: run this stream's window
                    # through the full per-stream ladder
                    if s.mel_host is None:
                        s.mel_host = np.asarray(
                            mel_all[s.index])[:, :s.n_len]
                    self._fallback_window(s, prompts[i], prompt_init,
                                          tparams, no_timestamps)
                    continue

                # reuse the pipeline's segment emitter on this stream's row
                pipe.segments = s.segments
                pipe._samples = None
                seek_delta, prompt_past = pipe._emit_segments(
                    res, i, prompts[i], prompt_init, s.seek, tparams,
                    no_timestamps)
                s.prompt_past = prompt_past
                s.seek += seek_delta
                if s.seek + 100 >= s.seek_end:
                    s.done = True

        return [s.segments for s in streams]

    def _fallback_window(self, s: _Stream, prompt: List[int],
                         prompt_init: List[int],
                         tparams: TranscribeParams,
                         no_timestamps: bool) -> None:
        """Per-stream temperature-ladder fallback for one window."""
        pipe = self.ctx.pipeline
        saved_segments = pipe.segments
        saved_mel = pipe._mel_data
        saved_n_len = pipe._n_len_org
        saved_past = pipe._prompt_past
        try:
            pipe.segments = s.segments
            pipe.set_mel(s.mel_host, s.n_len_org)
            pipe._prompt_past = list(s.prompt_past)
            p = dataclasses.replace(
                tparams, offset_ms=s.seek * 10,
                duration_ms=max((min(s.seek + 3000, s.seek_end) - s.seek)
                               * 10, 0),
                no_context=False)
            before = len(s.segments)
            pipe.full(p, None)
            s.prompt_past = pipe._prompt_past
            # advance past this window
            if len(s.segments) > before and s.segments[-1].t1 > s.seek:
                s.seek = max(s.seek + 100, s.segments[-1].t1)
            else:
                s.seek += 3000
            if s.seek + 100 >= s.seek_end:
                s.done = True
        finally:
            pipe.segments = saved_segments
            pipe._mel_data = saved_mel
            pipe._n_len_org = saved_n_len
            pipe._prompt_past = saved_past
