"""The transcription orchestrator — equivalent of ``whisper_full_with_state``
(/root/reference/thirdparty/whisper.cpp/whisper.cpp:4960-5807).

Host-side control flow only: the 30 s seek loop, the temperature fallback
ladder, sequence ranking with entropy/logprob gates, prompt_past context
conditioning and segment emission.  All per-token compute lives in
``window.WindowDecoder`` (one jit call per (window, temperature) attempt).

Timestamps are in the reference's centisecond units (t0/t1 are 10 ms ticks,
token_beg + n <-> n * 20 ms).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..audio.mel import MelFrontend, frame_counts
from ..audio.tokenizer import Tokenizer
from ..models.config import WhisperConfig, MAX_DECODERS
from ..models.model import (CrossKV, cross_kv, param_compute_dtype,
                            decoder_dense, encoder_forward,
                            init_kv_cache, quantize_cross_kv)
from ..runtime.metrics import Timings
from ..runtime.trace import tracer
from .filters import build_filter_context
from .language import detect_language_from_logits, lang_id, lang_str
from .params import SamplingStrategy, TranscribeParams
from .sequence import score_sequence
from .window import WindowDecoder, WindowResult


@dataclasses.dataclass
class TokenData:
    """Mirror of whisper_token_data (whisper.h:78-98)."""
    id: int
    tid: int
    p: float
    plog: float
    pt: float
    ptsum: float
    t0: int = -1
    t1: int = -1
    vlen: float = 0.0


@dataclasses.dataclass
class Segment:
    """Mirror of whisper_segment (whisper.cpp:396-405)."""
    t0: int
    t1: int
    text: str
    tokens: List[TokenData]
    speaker_turn_next: bool = False


class WhisperPipeline:
    """One loaded model + decode state (context + state in reference terms)."""

    def __init__(self, config: WhisperConfig, params, tokenizer: Tokenizer,
                 mel_filters: np.ndarray, *, n_loaded: int = -1):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.mel = MelFrontend(mel_filters)
        # n_loaded == 0 => weightless stub => test fast-path
        self.n_loaded = n_loaded
        self.lang_id_detected: Optional[int] = None
        self.timings = Timings()
        self._encode_cache = {}
        self._window_decoders = {}
        self._mel_data: Optional[np.ndarray] = None
        self._mel_device = None
        self._mel_n_len = 0
        self._n_len_org = 0
        self._prompt_past: List[int] = []
        self._samples: Optional[np.ndarray] = None
        self._energy: Optional[np.ndarray] = None
        self._ts_state = {"t_beg": 0, "t_last": 0, "tid_last": 0}
        self.segments: List[Segment] = []

    # ----------------------------------------------------------------- encode
    def _encode_fn(self, audio_ctx: int):
        fn = self._encode_cache.get(audio_ctx)
        if fn is None:
            config = self.config

            def encode(params, mel_window):
                enc = encoder_forward(params, config, mel_window,
                                      audio_ctx=audio_ctx)
                return enc, cross_kv(params, config, enc)

            fn = jax.jit(encode)
            self._encode_cache[audio_ctx] = fn
        return fn

    def _encode_sliced_fn(self, audio_ctx: int, bucket_frames: int,
                          quant_kv: bool = False):
        """Device-side window slice + encode: the mel stays resident on
        the TPU instead of round-tripping each 30 s window through the host
        (the reference's copy at whisper.cpp:1692-1706)."""
        key = ("sliced", audio_ctx, bucket_frames, quant_kv)
        fn = self._encode_cache.get(key)
        if fn is None:
            config = self.config
            n_ctx = audio_ctx or config.n_audio_ctx

            def encode(params, mel_full, seek, n_len):
                window = jax.lax.dynamic_slice(
                    mel_full, (0, seek), (config.n_mels, 2 * n_ctx))
                idx = seek + jnp.arange(2 * n_ctx)
                # zero outside the valid mel region (whisper.cpp:1695
                # memsets the graph input)
                window = jnp.where((idx < n_len)[None, :], window, 0.0)
                enc = encoder_forward(params, config, window.T[None],
                                      audio_ctx=audio_ctx)
                xkv = cross_kv(params, config, enc)
                if quant_kv:
                    xkv = quantize_cross_kv(xkv, config.n_text_head)
                return enc, xkv

            fn = jax.jit(encode)
            self._encode_cache[key] = fn
        return fn

    def encode_window(self, seek: int, audio_ctx: int = 0,
                      quant_kv: bool = False):
        """Encode mel[seek : seek+2*n_ctx] -> (enc_out, CrossKV).

        Mirrors whisper_encode_internal's window slice
        (whisper.cpp:1697-1706) + conv/encoder/cross graphs.
        """
        n_ctx = audio_ctx or self.config.n_audio_ctx
        t0 = time.perf_counter()
        tspan = tracer.span("encode_window", seek=seek, audio_ctx=n_ctx)
        tspan.__enter__()
        if self._mel_device is not None:
            fn = self._encode_sliced_fn(audio_ctx,
                                        self._mel_device.shape[1],
                                        quant_kv)
            enc, xkv = fn(self.params, self._mel_device, jnp.int32(seek),
                          jnp.int32(self._mel_n_len))
        else:
            mel = self._mel_data
            window = np.zeros((2 * n_ctx, self.config.n_mels),
                              dtype=np.float32)
            i0 = min(seek, mel.shape[1])
            i1 = min(seek + 2 * n_ctx, mel.shape[1])
            window[:i1 - i0] = mel[:, i0:i1].T
            enc, xkv = self._encode_fn(n_ctx)(self.params, window[None])
        # Deliberately NOT synced: the encode pipelines into the decode
        # dispatch. A sync here costs a full relay round-trip per window
        # (~25 ms on tunneled runtimes); t_encode_us records enqueue time
        # and the device time lands in t_decode_us.
        tspan.__exit__(None, None, None)
        self.timings.t_encode_us += int((time.perf_counter() - t0) * 1e6)
        self.timings.n_encode += 1
        return enc, xkv

    # -------------------------------------------------------------- language
    def detect_language(self, seek: int = 0,
                        audio_ctx: int = 0) -> tuple[int, np.ndarray]:
        """Encode + single [sot] decode + softmax over language tokens
        (whisper_lang_auto_detect_with_state, whisper.cpp:3569-3642)."""
        _, xkv = self.encode_window(seek, audio_ctx)
        config = self.config
        kv = init_kv_cache(config, 1,
                           dtype=param_compute_dtype(self.params))
        tokens = jnp.asarray([[config.token_sot]], dtype=jnp.int32)
        positions = jnp.zeros((1, 1), dtype=jnp.int32)
        logits, _ = decoder_dense(self.params, config, tokens, positions,
                                  kv, xkv, n_valid=1)
        return detect_language_from_logits(np.asarray(logits[0, 0]),
                                           config)

    # ------------------------------------------------------------------ mel
    def set_audio(self, samples: np.ndarray) -> None:
        t0 = time.perf_counter()
        tspan = tracer.span("mel", n_samples=len(samples))
        tspan.__enter__()
        self._samples = np.asarray(samples, dtype=np.float32)
        self._mel_device, self._mel_n_len = self.mel.device(samples)
        # Not synced: the mel transfer + compute overlap the first encode
        # dispatch (t_mel_us is enqueue time; see encode_window note).
        self._mel_data = None  # host copy materialized lazily
        _, self._n_len_org = frame_counts(len(samples))
        tspan.__exit__(None, None, None)
        self.timings.t_mel_us += int((time.perf_counter() - t0) * 1e6)

    def mel_host(self) -> Optional[np.ndarray]:
        """Host view of the current mel (n_mels, n_len)."""
        if self._mel_data is None and self._mel_device is not None:
            self._mel_data = np.asarray(
                self._mel_device)[:, :self._mel_n_len]
        return self._mel_data

    def set_mel(self, mel: np.ndarray, n_len_org: Optional[int] = None):
        """External mel injection (whisper_set_mel, whisper.h:262-270)."""
        self._mel_data = np.asarray(mel, dtype=np.float32)
        self._mel_device = None
        self._n_len_org = n_len_org or mel.shape[1]

    def set_mel_device(self, mel_dev, n_len: int, n_len_org: int,
                       samples: Optional[np.ndarray] = None) -> None:
        """Inject an already-device-resident NORMALIZED mel buffer
        (n_mels, F) — the incremental streaming path feeds new frames
        only and re-normalizes on device (runtime/streaming.py), then
        decodes via the standard device clip loop."""
        self._mel_device = mel_dev
        self._mel_n_len = int(n_len)
        self._n_len_org = int(n_len_org)
        self._mel_data = None
        self._samples = (np.asarray(samples, dtype=np.float32)
                         if samples is not None else None)
        self._energy = None

    # ------------------------------------------------------------------ full
    def full(self, tparams: TranscribeParams,
             samples: Optional[np.ndarray]) -> List[Segment]:
        config = self.config
        tok = self.tokenizer
        self.segments = []

        if samples is not None and len(samples) > 0:
            self.set_audio(samples)
        if self._mel_data is None and self._mel_device is None:
            raise ValueError("no audio or mel set")

        # language auto-detect (whisper.cpp:4985-5001)
        language = tparams.language
        if (config.is_multilingual
                and (language is None or language == "auto"
                     or tparams.detect_language)):
            lid, probs = self.detect_language(0, tparams.audio_ctx)
            self.lang_id_detected = lid
            language = lang_str(lid)
            if tparams.detect_language:
                return []
        elif not config.is_multilingual:
            language = "en"

        # token-timestamp state init (whisper.cpp:5003-5010)
        if tparams.token_timestamps:
            self._ts_state = {"t_beg": 0, "t_last": 0, "tid_last": 0}
            if self._samples is not None and len(self._samples) > 0:
                from .timestamps import signal_energy
                self._energy = signal_energy(self._samples, 32)

        seek_start = tparams.offset_ms // 10
        seek_end = (self._n_len_org if tparams.duration_ms == 0
                    else seek_start + tparams.duration_ms // 10)

        # < 1 s of input: nothing to do (whisper.cpp:5015-5021)
        if seek_end < seek_start + 100:
            return []

        temperatures = tparams.temperatures()

        n_decoders_max = tparams.n_decoders()
        if n_decoders_max > MAX_DECODERS:
            raise ValueError(
                f"too many decoders ({n_decoders_max} > {MAX_DECODERS})")

        # prompt_past: rolling text context persisting across full() calls
        # (state->prompt_past; cleared by no_context, whisper.cpp:5069-5073)
        if tparams.no_context:
            self._prompt_past = []
        prompt_past: List[int] = self._prompt_past
        # initial prompt tokens are prepended (whisper.cpp:5075-5094)
        new_tokens: List[int] = []
        if tparams.prompt_tokens:
            new_tokens = list(tparams.prompt_tokens)
        elif tparams.initial_prompt:
            new_tokens = tok.encode(tparams.initial_prompt)
        if new_tokens:
            prompt_past[:0] = new_tokens  # std::rotate to the front

        # task prefix (whisper.cpp:5104-5129)
        prompt_init = [config.token_sot]
        if config.is_multilingual:
            lid = lang_id(language or "en")
            self.lang_id_detected = lid
            prompt_init.append(config.token_lang(lid))
            prompt_init.append(config.token_translate if tparams.translate
                               else config.token_transcribe)
        no_timestamps = tparams.no_timestamps
        if config.is_distil and not no_timestamps:
            no_timestamps = True  # whisper.cpp:5118-5125
        if no_timestamps:
            prompt_init.append(config.token_not)

        strategy = ("beam" if tparams.strategy == SamplingStrategy.BEAM_SEARCH
                    else "greedy")

        # Device-resident whole-clip loop (decode/clip.py): one dispatch for
        # the entire seek loop + ladder + tokens, one drain — removes every
        # per-window host round trip.  Host path remains for beam search,
        # best_of>1 ladders, grammar/callback decoding and injected mels.
        if (self._mel_device is not None
                and self._device_loop_eligible(tparams, temperatures,
                                               strategy)):
            return self._full_device(tparams, temperatures, prompt_init,
                                     prompt_past, seek_start, seek_end,
                                     no_timestamps)

        wd = self._window_decoder(tparams)

        seek = seek_start
        while True:
            if tparams.progress_callback:
                progress = (100 * (seek - seek_start)) // max(
                    1, seek_end - seek_start)
                tparams.progress_callback(self, progress)

            if seek + 100 >= seek_end:
                break

            if (tparams.encoder_begin_callback
                    and not tparams.encoder_begin_callback(self)):
                break

            _, xkv = self.encode_window(seek, tparams.audio_ctx,
                                        tparams.cross_kv_int8)

            # drop stale context near the end (whisper.cpp:5176-5180)
            if seek > seek_start and seek + 500 >= seek_end:
                prompt_past = []

            best: Optional[dict] = None
            for it, t_cur in enumerate(temperatures):
                n_dec = tparams.n_decoders_at(t_cur)

                # build prompt (whisper.cpp:5237-5249)
                prompt: List[int] = []
                if (prompt_past and t_cur < 0.5
                        and tparams.n_max_text_ctx > 0):
                    n_take = min(tparams.n_max_text_ctx,
                                 config.n_text_ctx // 2, len(prompt_past))
                    prompt = [config.token_prev] + prompt_past[-n_take:]
                prompt += prompt_init

                t0 = time.perf_counter()
                dspan = tracer.span("decode_window", seek=seek,
                                    temperature=t_cur, n_decoders=n_dec)
                dspan.__enter__()
                host_mode = (tparams.grammar_rules is not None
                             or tparams.logits_filter_callback is not None)
                if host_mode:
                    # per-token host interaction (grammar / logit hook):
                    # slow path, single greedy decoder
                    # (grammar re-inited per attempt, whisper.cpp:5228-5232)
                    n_dec = 1
                    res = self._host_decoder(tparams).decode(
                        self.params, xkv, np.asarray(prompt, dtype=np.int32),
                        temperature=t_cur, seek=seek, seek_end=seek_end,
                        suppress_blank=tparams.suppress_blank,
                        no_timestamps=no_timestamps,
                        single_segment=tparams.single_segment,
                        max_tokens=tparams.max_tokens,
                        grammar=self._make_grammar(tparams),
                        grammar_penalty=tparams.grammar_penalty,
                        logits_filter_callback=tparams.logits_filter_callback,
                        seed=tparams.seed + it)
                else:
                    res = wd.decode(
                        self.params, xkv, np.asarray(prompt, dtype=np.int32),
                        n_decoders=n_dec, temperature=t_cur,
                        strategy=strategy,
                        beam_size=tparams.beam_size, seek=seek,
                        seek_end=seek_end,
                        suppress_blank=tparams.suppress_blank,
                        no_timestamps=no_timestamps,
                        single_segment=tparams.single_segment,
                        max_tokens=tparams.max_tokens,
                        test_mode=(self.n_loaded == 0),
                        seed=tparams.seed + it)
                dspan.__exit__(None, None, None)
                self.timings.t_decode_us += int(
                    (time.perf_counter() - t0) * 1e6)
                self.timings.n_decode += res.n_steps * n_dec

                # rank sequences (whisper.cpp:5611-5645)
                best_j, best_score = -1, -np.inf
                scores = []
                for j in range(n_dec):
                    if res.failed[j]:
                        scores.append(None)
                        continue
                    rl = int(res.result_len[j])
                    sc = score_sequence(res.tokens[j, :rl].tolist(),
                                        res.tok_plog[j, :rl],
                                        tparams.length_penalty)
                    # entropy gate (whisper.cpp:5628-5636)
                    if rl > 32 and sc.entropy < tparams.entropy_thold:
                        scores.append(None)
                        self.timings.n_fail_h += 1
                        continue
                    scores.append(sc)
                    if sc.score > best_score:
                        best_score, best_j = sc.score, j

                success = True
                if it != len(temperatures) - 1:
                    if best_j < 0 or (scores[best_j].avg_logprobs
                                      < tparams.logprob_thold):
                        success = False
                        self.timings.n_fail_p += 1

                if best_j >= 0:
                    best = {"res": res, "j": best_j, "score": scores[best_j]}
                if success and best is not None:
                    break

            if best is None:
                # every temperature failed — advance a full window
                seek += 3000
                continue

            seek_delta, prompt_past = self._emit_segments(
                best["res"], best["j"], prompt, prompt_init, seek, tparams,
                no_timestamps)
            self._prompt_past = prompt_past
            seek += seek_delta

            if tparams.abort_callback and tparams.abort_callback(self):
                break

        return self.segments

    # -------------------------------------------------- device-resident loop
    def _device_loop_eligible(self, tparams: TranscribeParams,
                              temperatures, strategy: str) -> bool:
        # beam/best_of run on device with a STATIC n_dec rows per stream.
        # Eligible iff every ladder rung's decoder count is either 1 (a
        # 1-count rung padded to n_dec identical argmax rows is
        # semantically identical) or exactly n_dec = max(counts) — mixed
        # widths (beam_size != best_of across rungs) keep the host path,
        # which runs each rung at the reference's exact width
        # (whisper.cpp:5187-5206).
        counts = [tparams.n_decoders_at(t) for t in temperatures]
        n_dec = max(counts)
        uniform = all(c in (1, n_dec) for c in counts)
        return (uniform
                and tparams.grammar_rules is None
                and tparams.logits_filter_callback is None
                and tparams.encoder_begin_callback is None
                and tparams.progress_callback is None
                and tparams.abort_callback is None)

    def _clip_decoder(self, tparams: TranscribeParams, temperatures,
                      prompt_init, no_timestamps: bool, f_cap: int):
        from ..ops.attention import use_pallas
        from .clip import ClipDecoder, ClipStatics
        statics = ClipStatics(
            config=self.config, batch=1, f_cap=f_cap,
            w_total=min(64, 4 * (-(-f_cap // 3000)) + 4),
            audio_ctx=tparams.audio_ctx, temps=tuple(temperatures),
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
            test_mode=(self.n_loaded == 0), fused=use_pallas(),
            seed=tparams.seed,
            # width = the max rung count actually scheduled: a
            # single-rung beam-K ladder runs K rows even when best_of
            # differs (whisper.cpp:5035-5067 picks per-rung counts)
            n_dec=max(tparams.n_decoders_at(t) for t in temperatures),
            strategy=("beam" if tparams.strategy
                      == SamplingStrategy.BEAM_SEARCH else "greedy"),
            cross_int8=tparams.cross_kv_int8)
        key = ("clip", statics, tparams.suppress_non_speech_tokens,
               tparams.tdrz_enable, round(tparams.max_initial_ts, 6),
               tuple(prompt_init))
        cd = self._window_decoders.get(key)
        if cd is None:
            fctx = build_filter_context(
                self.config, self.tokenizer,
                suppress_non_speech=tparams.suppress_non_speech_tokens,
                tdrz_enable=tparams.tdrz_enable,
                max_initial_ts=tparams.max_initial_ts)
            cd = ClipDecoder(self.config, fctx, statics, prompt_init)
            self._window_decoders[key] = cd
        return cd

    def _full_device(self, tparams: TranscribeParams, temperatures,
                     prompt_init, prompt_past, seek_start: int,
                     seek_end: int, no_timestamps: bool) -> List[Segment]:
        t0 = time.perf_counter()
        dspan = tracer.span("decode_clip_device", seek=seek_start,
                            seek_end=seek_end)
        dspan.__enter__()
        cd = self._clip_decoder(tparams, temperatures, prompt_init,
                                no_timestamps, self._mel_device.shape[1])
        state = cd.init_state(self._mel_device[None], [self._mel_n_len],
                              [seek_start], [seek_end],
                              past_init=[list(prompt_past)])
        outs = None
        while True:
            state = cd.run(self.params, state)
            outs = cd.drain(state)
            self.timings.n_encode += int(outs.w[0])  # one encode per window
            for k in range(int(outs.w[0])):
                self.timings.n_decode += int(outs.steps[0, k])
                if bool(outs.emitted[0, k]):
                    res = outs.window_result(0, k)
                    self._emit_segments(res, 0, [], prompt_init,
                                        int(outs.seek[0, k]), tparams,
                                        no_timestamps)
                else:
                    self.timings.n_fail_p += 1
            if bool(outs.done[0]) or int(outs.w[0]) == 0:
                break
            state = cd.reset_windows(state)
        self._prompt_past = [int(x) for x in
                             outs.past_buf[0][:int(outs.past_cnt[0])]]
        dspan.__exit__(None, None, None)
        self.timings.t_decode_us += int((time.perf_counter() - t0) * 1e6)
        return self.segments

    # ------------------------------------------------------------- internals
    def _make_grammar(self, tparams: TranscribeParams):
        """Fresh grammar state per decode attempt."""
        rules = tparams.grammar_rules
        if rules is None:
            return None
        from .grammar import Grammar, grammar_from_gbnf
        if isinstance(rules, str):
            return grammar_from_gbnf(rules)
        if isinstance(rules, Grammar):
            # re-init from the same rule set
            return Grammar(rules.rules, tparams.i_start_rule)
        return Grammar(list(rules), tparams.i_start_rule)

    def _host_decoder(self, tparams: TranscribeParams):
        key = ("host", tparams.suppress_non_speech_tokens,
               tparams.tdrz_enable, round(tparams.max_initial_ts, 6))
        hd = self._window_decoders.get(key)
        if hd is None:
            from .host_loop import HostWindowDecoder
            fctx = build_filter_context(
                self.config, self.tokenizer,
                suppress_non_speech=tparams.suppress_non_speech_tokens,
                tdrz_enable=tparams.tdrz_enable,
                max_initial_ts=tparams.max_initial_ts)
            hd = HostWindowDecoder(self.config, fctx, self.tokenizer)
            self._window_decoders[key] = hd
        return hd

    def _window_decoder(self, tparams: TranscribeParams) -> WindowDecoder:
        key = (tparams.suppress_non_speech_tokens, tparams.tdrz_enable,
               round(tparams.max_initial_ts, 6))
        wd = self._window_decoders.get(key)
        if wd is None:
            fctx = build_filter_context(
                self.config, self.tokenizer,
                suppress_non_speech=tparams.suppress_non_speech_tokens,
                tdrz_enable=tparams.tdrz_enable,
                max_initial_ts=tparams.max_initial_ts)
            wd = WindowDecoder(self.config, fctx)
            self._window_decoders[key] = wd
        return wd

    def _emit_segments(self, res: WindowResult, j: int, prompt: List[int],
                       prompt_init: List[int], seek: int,
                       tparams: TranscribeParams,
                       no_timestamps: bool) -> tuple[int, List[int]]:
        """Segment emission + prompt_past update (whisper.cpp:5673-5797).
        Returns (seek_delta, new prompt_past)."""
        config = self.config
        tok = self.tokenizer
        beg = config.token_beg
        eot = config.token_eot

        seek_delta = int(res.seek_delta[j])
        rl = int(res.result_len[j])

        tokens_cur = [
            TokenData(id=int(res.tokens[j, t]), tid=int(res.tok_tid[j, t]),
                      p=float(res.tok_p[j, t]), plog=float(res.tok_plog[j, t]),
                      pt=float(res.tok_pt[j, t]),
                      ptsum=float(res.tok_ptsum[j, t]))
            for t in range(rl)
        ]

        # prompt_past update (whisper.cpp:5684-5692)
        prompt_past: List[int] = []
        if prompt and prompt[0] == config.token_prev:
            prompt_past = prompt[1:len(prompt) - len(prompt_init)]
        prompt_past += [t.id for t in tokens_cur]

        if not tokens_cur or self.n_loaded == 0:
            return seek_delta, prompt_past

        i0 = 0
        t0 = seek + 2 * (tokens_cur[0].tid - beg)
        text = ""
        speaker_turn_next = False
        i = 0
        while i < len(tokens_cur):
            td = tokens_cur[i]
            if tparams.print_special or td.id < eot:
                text += tok.token_str(td.id)
            if tparams.tdrz_enable and td.id == config.token_solm:
                speaker_turn_next = True

            if td.id > beg and not tparams.single_segment:
                t1 = seek + 2 * (td.tid - beg)
                if text:
                    self._push_segment(t0, t1, text,
                                       tokens_cur[i0:i + 1],
                                       speaker_turn_next, tparams)
                text = ""
                while (i < len(tokens_cur) and tokens_cur[i].id > beg):
                    i += 1
                i -= 1
                t0 = t1
                i0 = i + 1
                speaker_turn_next = False
            i += 1

        if text:
            t1 = seek + seek_delta
            self._push_segment(t0, t1, text, tokens_cur[i0:],
                               speaker_turn_next, tparams)

        return seek_delta, prompt_past

    def _push_segment(self, t0: int, t1: int, text: str,
                      tokens: List[TokenData], speaker_turn: bool,
                      tparams: TranscribeParams) -> None:
        self.segments.append(Segment(t0=t0, t1=t1, text=text,
                                     tokens=list(tokens),
                                     speaker_turn_next=speaker_turn))
        n_new = 1
        if tparams.token_timestamps:
            from .timestamps import compute_token_level_timestamps
            compute_token_level_timestamps(
                self, len(self.segments) - 1,
                tparams.thold_pt, tparams.thold_ptsum)
            if tparams.max_len > 0:
                from .timestamps import wrap_segment
                n_new = wrap_segment(self, tparams.max_len,
                                     tparams.split_on_word)
        if tparams.new_segment_callback:
            tparams.new_segment_callback(self, n_new)
