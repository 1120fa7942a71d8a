"""Batched multi-stream transcription — the TPU-native throughput mode.

The reference's only data parallelism is one host thread + state per audio
chunk (whisper_full_parallel, whisper.cpp:5817-5930).  On TPU the chip is
shared, so parallel streams share compiled executables and batch their
work: this module drives N independent utterance streams through the
device-resident whole-clip loop (decode/clip.py) — mel for every clip goes
up in one transfer, ONE dispatch decodes every stream's seek loop +
temperature ladder + tokens, and one device_get drains the token buffers.
Each stream advances at its own window cadence with its own prompt context.

Under a ("dp","tp") mesh the stream axis shards over dp: place the stacked
mel with ``parallel.sharding.batch_sharding`` and XLA splits both encode
and decode across chips.

Semantics: the full in-jit temperature ladder with entropy/logprob gates
and per-stream decoder pools — beam search at t=0, best_of samplers at
t>0, ranked on device (decode/clip.py; the reference's default beam-5
quality config runs batched here, whisper.cpp:5035-5067).  Token-level
timestamps run as the standard host post-pass per stream
(whisper.cpp:6315-6599).  Grammar / logit-callback decoding falls back
to sequential per-stream ``full()``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

import jax

from ..audio.mel import frame_counts
from ..decode.clip import ClipDecoder, ClipStatics
from ..decode.filters import build_filter_context
from ..decode.loop import Segment, WhisperPipeline
from ..decode.params import SamplingStrategy, TranscribeParams
from ..models.config import WhisperConfig
from ..ops.attention import use_pallas


class BatchTranscriber:
    """Transcribe many clips concurrently on one chip (or a dp-sharded
    mesh)."""

    def __init__(self, ctx):
        self.ctx = ctx
        self._decoders = {}

    # --------------------------------------------------------------- helpers
    def _eligible(self, tparams: TranscribeParams) -> bool:
        counts = [tparams.n_decoders_at(t)
                  for t in tparams.temperatures()]
        uniform = all(c in (1, max(counts)) for c in counts)
        return (uniform
                and tparams.grammar_rules is None
                and tparams.logits_filter_callback is None
                and tparams.encoder_begin_callback is None
                and tparams.progress_callback is None
                and tparams.abort_callback is None
                and not tparams.detect_language)

    def _clip_decoder(self, tparams: TranscribeParams, B: int, f_cap: int,
                      prompt_init: List[int], no_timestamps: bool
                      ) -> ClipDecoder:
        pipe: WhisperPipeline = self.ctx.pipeline
        config: WhisperConfig = self.ctx.config
        statics = ClipStatics(
            config=config, batch=B, f_cap=f_cap,
            w_total=min(64, 4 * (-(-f_cap // 3000)) + 4),
            audio_ctx=tparams.audio_ctx,
            temps=tuple(tparams.temperatures()),
            use_past=tparams.n_max_text_ctx > 0,
            n_init=len(prompt_init),
            n_max_text_ctx=tparams.n_max_text_ctx,
            length_penalty=tparams.length_penalty,
            entropy_thold=tparams.entropy_thold,
            logprob_thold=tparams.logprob_thold,
            suppress_blank=tparams.suppress_blank,
            no_timestamps=no_timestamps,
            single_segment=tparams.single_segment,
            max_tokens=tparams.max_tokens,
            test_mode=(pipe.n_loaded == 0),
            fused=use_pallas(),
            seed=tparams.seed,
            n_dec=max(tparams.n_decoders_at(t)
                      for t in tparams.temperatures()),
            strategy=("beam" if tparams.strategy
                      == SamplingStrategy.BEAM_SEARCH else "greedy"),
            cross_int8=tparams.cross_kv_int8)
        fkey = (tparams.suppress_non_speech_tokens, tparams.tdrz_enable,
                round(tparams.max_initial_ts, 6))
        key = (statics, fkey, tuple(prompt_init))
        cd = self._decoders.get(key)
        if cd is None:
            fctx = build_filter_context(
                config, pipe.tokenizer,
                suppress_non_speech=tparams.suppress_non_speech_tokens,
                tdrz_enable=tparams.tdrz_enable,
                max_initial_ts=tparams.max_initial_ts)
            cd = ClipDecoder(config, fctx, statics, prompt_init)
            self._decoders[key] = cd
        return cd

    def _prompt_init(self, tparams: TranscribeParams):
        """Task prefix shared by every stream (whisper.cpp:5104-5129)."""
        config = self.ctx.config
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
        return prompt_init, no_timestamps

    # ------------------------------------------------------------ transcribe
    def _prepare(self, clips: List[np.ndarray],
                 tparams: TranscribeParams, host_mels=None):
        """Async half: mel + state build + FIRST decode dispatch.

        Nothing here blocks on the device — the mel transfers and the
        clip-loop dispatch just queue, so a caller can prepare batch k+1
        while batch k still decodes (``transcribe_many``)."""
        pipe: WhisperPipeline = self.ctx.pipeline
        prompt_init, no_timestamps = self._prompt_init(tparams)
        mel_all, n_lens = pipe.mel.device_batch(clips,
                                                host_mels=host_mels)

        seeks, seek_ends, past_init = [], [], []
        init_prompt_tokens: List[int] = []
        if tparams.initial_prompt:
            init_prompt_tokens = pipe.tokenizer.encode(
                tparams.initial_prompt)
        elif tparams.prompt_tokens:
            init_prompt_tokens = list(tparams.prompt_tokens)
        for clip in clips:
            _, n_len_org = frame_counts(len(clip))
            s0 = tparams.offset_ms // 10
            seeks.append(s0)
            seek_ends.append(n_len_org if tparams.duration_ms == 0
                             else s0 + tparams.duration_ms // 10)
            past_init.append(list(init_prompt_tokens))

        cd = self._clip_decoder(tparams, len(clips), mel_all.shape[2],
                                prompt_init, no_timestamps)
        state = cd.init_state(mel_all, n_lens, seeks, seek_ends,
                              past_init=past_init)
        state = cd.run(pipe.params, state)
        return {"cd": cd, "state": state, "clips": clips,
                "seek_ends": seek_ends, "prompt_init": prompt_init,
                "no_timestamps": no_timestamps, "tparams": tparams}

    def _finish(self, job) -> List[List[Segment]]:
        """Blocking half: drain/emit (+ further decode rounds if any)."""
        pipe: WhisperPipeline = self.ctx.pipeline
        cd, state = job["cd"], job["state"]
        clips, tparams = job["clips"], job["tparams"]
        prompt_init, no_timestamps = (job["prompt_init"],
                                      job["no_timestamps"])
        segments: List[List[Segment]] = [[] for _ in clips]
        ts_states = [{"t_beg": 0, "t_last": 0, "tid_last": 0}
                     for _ in clips]
        while True:
            outs = cd.drain(state)
            self._emit(outs, clips, segments, prompt_init, tparams,
                       no_timestamps, ts_states)
            if bool(np.all(outs.done | (outs.cur_seek + 100
                                        >= np.asarray(job["seek_ends"])))):
                break
            if int(outs.w.max()) == 0:
                break  # no progress possible (safety)
            state = cd.reset_windows(state)
            state = cd.run(pipe.params, state)
        return segments

    def transcribe(self, clips: List[np.ndarray],
                   tparams: Optional[TranscribeParams] = None
                   ) -> List[List[Segment]]:
        ctx = self.ctx
        pipe: WhisperPipeline = ctx.pipeline
        tparams = tparams or TranscribeParams()

        if not self._eligible(tparams):
            # exact-semantics fallback: sequential per-stream pipeline
            out = []
            for clip in clips:
                pipe.segments = []
                pipe._prompt_past = []
                out.append(list(pipe.full(tparams, clip)))
            return out

        return self._finish(self._prepare(clips, tparams))

    def transcribe_many(self, batches,
                        tparams: Optional[TranscribeParams] = None):
        """Bulk transcription: yields per-batch segment lists.

        On locally-attached accelerators, batch k+1's host mel +
        transfers overlap batch k's on-chip decode — the serving-loop
        overlap the reference gets from its capture thread
        (capture_stream_to_text.gd:69-120), here across utterance
        batches.  On slow-link (relay-tunneled) runtimes the batches run
        strictly serialized instead: measured on the relay, a host->
        device put DURING program execution costs ~2.3x its idle time
        (contention), so "overlap" there loses outright."""
        tparams = tparams or TranscribeParams()
        from ..audio.mel import MelFrontend
        overlap = self._eligible(tparams) and not MelFrontend._host_mel()
        if not overlap:
            # slow-link serialized path: the only safe concurrency is the
            # next batch's HOST mel FFT (pure CPU, a worker thread; numpy
            # drops the GIL) riding under the current batch's decode —
            # transfers stay strictly between decodes
            import concurrent.futures as cf
            pipe: WhisperPipeline = self.ctx.pipeline
            eligible = self._eligible(tparams)
            with cf.ThreadPoolExecutor(max_workers=1) as pool:
                it = iter(batches)
                cur = next(it, None)
                fut = (pool.submit(pipe.mel.precompute_host_mels, cur)
                       if cur is not None and eligible else None)
                while cur is not None:
                    mels = fut.result() if fut is not None else None
                    nxt = next(it, None)
                    fut = (pool.submit(pipe.mel.precompute_host_mels, nxt)
                           if nxt is not None and eligible else None)
                    if eligible:
                        yield self._finish(
                            self._prepare(cur, tparams, host_mels=mels))
                    else:
                        yield self.transcribe(cur, tparams)
                    cur = nxt
            return
        pending = None
        for clips in batches:
            job = self._prepare(clips, tparams)
            if pending is not None:
                yield self._finish(pending)
            pending = job
        if pending is not None:
            yield self._finish(pending)

    # -------------------------------------------------------------- emission
    def _emit(self, outs, clips, segments, prompt_init, tparams,
              no_timestamps, ts_states) -> None:
        """Host segment emission per (stream, window) — reuses the
        pipeline's parity-tested emitter; token-level timestamps run as the
        standard per-stream energy post-pass (whisper.cpp:6315-6599), with
        per-stream anchor state persisting across drain rounds."""
        pipe: WhisperPipeline = self.ctx.pipeline
        saved = (pipe.segments, pipe._samples, pipe._energy, pipe._ts_state)
        try:
            for b in range(len(clips)):
                pipe.segments = segments[b]
                if tparams.token_timestamps:
                    from ..decode.timestamps import signal_energy
                    pipe._samples = np.asarray(clips[b], dtype=np.float32)
                    pipe._energy = signal_energy(pipe._samples, 32)
                    pipe._ts_state = ts_states[b]
                else:
                    pipe._samples = None
                    pipe._energy = None
                for k in range(int(outs.w[b])):
                    if not bool(outs.emitted[b, k]):
                        continue
                    res = outs.window_result(b, k)
                    pipe._emit_segments(res, 0, [], prompt_init,
                                        int(outs.seek[b, k]), tparams,
                                        no_timestamps)
        finally:
            (pipe.segments, pipe._samples, pipe._energy,
             pipe._ts_state) = saved
