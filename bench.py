"""Benchmark driver: end-to-end RTF + batched-stream throughput.

Run on the real TPU chip.  Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Primary metric: BENCH_MODEL (default tiny.en) single-stream greedy RTF
(audio-seconds per second).  Extra keys: batched throughput at 8/16/32
concurrent streams (steady-state over a pipelined multi-batch run —
mel/upload of batch k+1 overlaps decode of batch k), and large-v3
single/batch-8 figures (weights generated on-device; gate with
BENCH_LARGE=0).

Baseline: BASELINE.json's north-star of 50x realtime tiny.en per chip
(the reference publishes only ~0.3 s for a tiny.en one-shot on an
unspecified desktop, README.md:57 — no portable RTF figure exists, so
the north-star target is the denominator).

Also reported (VERDICT r3 asks #3/#6):
- ``device_decode_rtf``: audio-seconds per second of DEVICE decode time
  (the Timings.t_decode_us bucket — wall time around the device decode
  dispatches, excluding mel compute and host segment emission) so chip
  throughput and relay/link ceiling are separable;
- ``oneshot_11s_ms``: time-to-transcript for an 11 s jfk-length clip
  with the dynamic audio_ctx of the reference's streaming layer
  (capture_stream_to_text.gd:84) — the analogue of the reference's
  "~0.3 s one-shot tiny.en" headline (README.md:57);
- ``stream_tick_p50_ms``/``p95``: per-interval latency of 0.3 s
  streaming ticks over a 15 s utterance — what
  capture_stream_to_text.gd:107,117 prints against transcribe_interval.

Env knobs: BENCH_MODEL, BENCH_AUDIO_SECONDS, BENCH_QUANTIZE (int8/int4),
BENCH_LARGE=0, BENCH_BATCHES (comma list, default "8,16,32,64").
Mel crosses the wire f16 by default (the WER-parity-safe format); an
explicitly-labeled int8-wire entry isolates the opt-in lossier wire's
throughput headroom (GWT_MEL_WIRE=int8, audio/mel.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _make_audio(seconds: float, sr: int = 16000,
                seed: int = 0) -> np.ndarray:
    """Synthetic speech-like audio: AM-modulated harmonics + noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.5 * t)
    x = np.zeros_like(t)
    for h in (1, 2, 3):
        x += np.sin(2 * np.pi * f0 * h * t) / h
    envelope = 0.5 * (1 + np.sin(2 * np.pi * 2.3 * t))
    x = 0.2 * x * envelope + 0.01 * rng.standard_normal(len(t))
    return x.astype(np.float32)


def _load_ctx(model: str, quantize, on_device: bool = False):
    import godot_whisper_tpu as gwt
    stub = ("/root/reference/thirdparty/whisper.cpp/models/"
            f"for-tests-ggml-{model}.bin")
    if os.path.exists(stub) and not on_device:
        # real vocab + mel filters from the stub; weights random (no
        # network access for real checkpoints)
        from godot_whisper_tpu.models.loader_ggml import read_checkpoint
        from godot_whisper_tpu.models.params import init_params
        from godot_whisper_tpu.audio.tokenizer import Tokenizer
        from godot_whisper_tpu.decode.loop import WhisperPipeline
        raw = read_checkpoint(stub)
        params = init_params(raw.config, seed=0)
        if quantize:
            params = gwt.WhisperContext._quantize(params, quantize)
        tokenizer = Tokenizer(raw.config, raw.vocab_tokens)
        pipe = WhisperPipeline(raw.config, params, tokenizer,
                               raw.mel_filters, n_loaded=1)
        return gwt.WhisperContext(pipe)
    return gwt.WhisperContext.synthetic(model, seed=0, quantize=quantize,
                                        on_device=on_device)


def _single_rtf(ctx, tp, audio, n=3) -> float:
    ctx.full(tp, audio)  # warmup/compile
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        ctx.full(tp, audio)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return len(audio) / 16000 / best


def _batch_throughput(ctx, tp, nb: int, audio_seconds: float,
                      n_batches: int = 3, reps: int = 2) -> float:
    """Steady-state pipelined throughput: clock starts after the first
    batch lands (its mel upload cannot overlap anything).  Best of
    ``reps`` passes — the relay link's bandwidth swings run to run."""
    from godot_whisper_tpu.parallel.batch import BatchTranscriber
    bt = BatchTranscriber(ctx)
    clips = [_make_audio(audio_seconds, seed=i) for i in range(nb)]
    bt.transcribe(clips, tp)  # warmup/compile

    def one_pass():
        t_mark = [None]

        def batches():
            for _ in range(n_batches + 1):
                yield clips

        n_done = 0
        for _ in bt.transcribe_many(batches(), tp):
            if t_mark[0] is None:
                t_mark[0] = time.perf_counter()  # after first batch
            else:
                n_done += 1
        dt = time.perf_counter() - t_mark[0]
        return n_done * nb * audio_seconds / dt

    return max(one_pass() for _ in range(reps))


def _device_decode_throughput(ctx, tp, nb: int, audio_seconds: float,
                              reps: int = 3) -> float:
    """DEVICE-only clip-loop throughput: mel made resident first, the
    timed region is one full clip-loop dispatch fenced by a small
    device_get (block_until_ready does not round-trip on tunneled
    runtimes) — the wire-independent chip figure."""
    import jax

    from godot_whisper_tpu.audio.mel import frame_counts
    from godot_whisper_tpu.parallel.batch import BatchTranscriber

    bt = BatchTranscriber(ctx)
    pipe = ctx.pipeline
    clips = [_make_audio(audio_seconds, seed=i) for i in range(nb)]
    prompt_init, no_ts = bt._prompt_init(tp)
    mel_all, n_lens = pipe.mel.device_batch(clips)
    copy = jax.jit(lambda x: x + 0)
    mel_all = copy(mel_all)      # own buffer (run() donates state)
    seeks = [0] * nb
    seek_ends = [frame_counts(len(c))[1] for c in clips]
    cd = bt._clip_decoder(tp, nb, mel_all.shape[2], prompt_init, no_ts)
    best = None
    for rep in range(reps):
        mel2 = copy(mel_all)
        state = cd.init_state(mel2, n_lens, seeks, seek_ends,
                              past_init=[[] for _ in range(nb)])
        _ = jax.device_get(state.w)          # fence: state resident
        t0 = time.perf_counter()
        state2 = cd.run(pipe.params, state)
        _ = jax.device_get(state2.w)         # fence: decode complete
        dt = time.perf_counter() - t0
        if rep:                              # rep 0 compiles/warms
            best = dt if best is None else min(best, dt)
    return nb * audio_seconds / best


def _oneshot_latency_ms(ctx, gwt, n=5) -> float:
    """Time-to-transcript for an 11 s clip (jfk.wav length) with the
    reference streaming layer's dynamic audio_ctx
    (capture_stream_to_text.gd:84: total*1500/30 + 128)."""
    audio = _make_audio(11.0)
    audio_ctx = int(11.0 * 1500 / 30) + 128
    tp = gwt.TranscribeParams(best_of=1, temperature_inc=0.0,
                              audio_ctx=audio_ctx, single_segment=True,
                              print_progress=False)
    ctx.full(tp, audio)  # warmup/compile
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        ctx.full(tp, audio)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best * 1000.0


def _stream_tick_ms(ctx, gwt):
    """Per-interval latency of 0.3 s streaming ticks over a 15 s
    utterance (the number capture_stream_to_text.gd:107,117 prints)."""
    from godot_whisper_tpu.runtime.streaming import (StreamingConfig,
                                                     StreamingTranscriber)
    audio = _make_audio(15.0)
    cfg = StreamingConfig(transcribe_interval=0.3)
    st = StreamingTranscriber(ctx, cfg)
    ticks = []
    step = int(0.3 * 16000)
    for rep in range(2):          # rep 0 warms the compile caches
        st2 = st if rep == 0 else StreamingTranscriber(ctx, cfg)
        for i in range(0, len(audio), step):
            st2.push_audio(audio[i:i + step])
            t0 = time.perf_counter()
            st2.process_once()
            if rep == 1:
                ticks.append((time.perf_counter() - t0) * 1000.0)
    ticks.sort()
    return (ticks[len(ticks) // 2],
            ticks[min(int(len(ticks) * 0.95), len(ticks) - 1)])


def main() -> None:
    import godot_whisper_tpu as gwt
    from godot_whisper_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()

    model = os.environ.get("BENCH_MODEL", "tiny.en")
    audio_seconds = float(os.environ.get("BENCH_AUDIO_SECONDS", "120"))
    quantize = os.environ.get("BENCH_QUANTIZE") or None
    batch_sizes = [int(x) for x in os.environ.get(
        "BENCH_BATCHES", "8,16,32,64").split(",") if x]

    ctx = _load_ctx(model, quantize)
    tp = gwt.TranscribeParams(best_of=1, temperature_inc=0.0,
                              print_progress=False)
    audio = _make_audio(audio_seconds)

    def link_mbps():
        """Fresh link-speed sample (the tunneled relay's bandwidth
        swings run to run — a collapse mid-bench once tanked two
        sections ~8x; these fields make that visible in the artifact)."""
        import time as _t
        import jax
        import jax.numpy as jnp
        buf = np.zeros(1 << 20, np.float16)
        t0 = _t.perf_counter()
        d = jax.device_put(buf)
        _ = float(jnp.sum(d.astype(jnp.float32).ravel()[:2]))
        return round(buf.nbytes / max(_t.perf_counter() - t0, 1e-9)
                     / 1e6, 1)

    out = {
        "metric": f"{model} greedy e2e RTF (audio-seconds/s/chip)",
        "value": round(_single_rtf(ctx, tp, audio), 2),
        "unit": "audio_s/s",
    }
    out["vs_baseline"] = round(out["value"] / 50.0, 3)
    out["link_mbps_start"] = link_mbps()

    # DEVICE decode time of one run, separated from wall time (relay
    # upload + host mel excluded) — chip vs link attribution
    try:
        ctx.reset_timings()
        ctx.full(tp, audio)
        dev_us = ctx.timings.t_decode_us + ctx.timings.t_encode_us
        if dev_us > 0:
            out["device_decode_rtf"] = round(
                audio_seconds / (dev_us / 1e6), 2)
    except Exception as e:  # pragma: no cover
        out["device_decode_error"] = str(e)[:120]

    # one-shot + streaming latency (reference headline analogues)
    try:
        out["oneshot_11s_ms"] = round(_oneshot_latency_ms(ctx, gwt), 1)
        p50, p95 = _stream_tick_ms(ctx, gwt)
        out["stream_tick_p50_ms"] = round(p50, 1)
        out["stream_tick_p95_ms"] = round(p95, 1)
    except Exception as e:  # pragma: no cover
        out["latency_error"] = str(e)[:200]

    for nb in batch_sizes:
        try:
            thr = _batch_throughput(ctx, tp, nb, audio_seconds)
            out[f"batch{nb}_throughput_audio_s_per_s"] = round(thr, 1)
        except Exception as e:  # pragma: no cover
            out[f"batch{nb}_throughput_audio_s_per_s"] = f"error: {e}"

    # wire-format A/B: the batchN entries above ride the DEFAULT f16 mel
    # wire (WER-parity-safe); this explicitly-labeled entry measures the
    # opt-in int8 wire's headroom on bandwidth-bound links
    if os.environ.get("BENCH_MEL_WIRE_AB", "1") == "1":
        try:
            os.environ["GWT_MEL_WIRE"] = "int8"
            out["int8_wire_batch16_throughput_audio_s_per_s"] = round(
                _batch_throughput(ctx, tp, 16, audio_seconds), 1)
        except Exception as e:  # pragma: no cover
            out["int8_wire_error"] = str(e)[:200]
        finally:
            os.environ.pop("GWT_MEL_WIRE", None)

    # int8 decoder weights (in-VMEM-dequant matmuls, ops/qmatmul.py):
    # halves the dominant logits/weight HBM reads of the decode step
    if os.environ.get("BENCH_INT8", "1") == "1" and not quantize:
        try:
            qctx = _load_ctx(model, "int8")
            out["int8_single_rtf"] = round(
                _single_rtf(qctx, tp, audio, n=2), 2)
            out["int8_batch8_throughput_audio_s_per_s"] = round(
                _batch_throughput(qctx, tp, 8, audio_seconds,
                                  n_batches=2), 1)
        except Exception as e:  # pragma: no cover
            out["int8_error"] = str(e)[:200]

    # beam-5: the reference's DEFAULT quality config (whisper.cpp:4406),
    # running in the device clip loop (grouped beam per stream)
    if os.environ.get("BENCH_BEAM", "1") == "1":
        try:
            tpb = gwt.TranscribeParams(
                strategy=gwt.SamplingStrategy.BEAM_SEARCH, beam_size=5,
                best_of=5, temperature_inc=0.0, print_progress=False)
            out["beam5_single_rtf"] = round(
                _single_rtf(ctx, tpb, audio, n=2), 2)
            out["beam5_batch8_throughput_audio_s_per_s"] = round(
                _batch_throughput(ctx, tpb, 8, audio_seconds,
                                  n_batches=2), 1)
            out["beam5_batch16_throughput_audio_s_per_s"] = round(
                _batch_throughput(ctx, tpb, 16, audio_seconds,
                                  n_batches=2), 1)
            # DEVICE-only beam decode (mel pre-resident, wire excluded):
            # the e2e batch numbers above sit at the relay-wire ceiling
            # (~link_MB_s * 64 audio-s/s), so this is the figure that
            # tracks the chip-side beam work (r5: 1773/2022 at b8/b16)
            out["beam5_device_batch8_audio_s_per_s"] = round(
                _device_decode_throughput(ctx, tpb, 8, audio_seconds), 1)
            out["beam5_device_batch16_audio_s_per_s"] = round(
                _device_decode_throughput(ctx, tpb, 16,
                                          audio_seconds), 1)
        except Exception as e:  # pragma: no cover
            out["beam5_error"] = str(e)[:200]

    # whole-family coverage (reference extra/bench.py sweeps every model
    # size): small + medium single-stream RTF on on-device weights
    if os.environ.get("BENCH_FAMILY", "1") == "1":
        faudio = _make_audio(min(audio_seconds, 60.0))
        for fam in ("small", "medium"):
            try:
                fctx = _load_ctx(fam, quantize, on_device=True)
                out[f"{fam}_single_rtf"] = round(
                    _single_rtf(fctx, tp, faudio, n=2), 2)
                del fctx
            except Exception as e:  # pragma: no cover
                out[f"{fam}_error"] = str(e)[:120]

    if os.environ.get("BENCH_LARGE", "1") == "1" and model != "large-v3":
        try:
            laudio = _make_audio(min(audio_seconds, 60.0))
            lctx = _load_ctx("large-v3", quantize, on_device=True)
            out["large_v3_single_rtf"] = round(
                _single_rtf(lctx, tp, laudio, n=2), 2)
            out["large_v3_batch8_throughput_audio_s_per_s"] = round(
                _batch_throughput(lctx, tp, 8, min(audio_seconds, 60.0),
                                  n_batches=2), 1)
            # quantized decoder weights: large-v3 decode streams ~1.5 GB
            # of bf16 weights per token — int8 halves, int4 quarters
            del lctx
            lqctx = _load_ctx("large-v3", "int8", on_device=True)
            out["large_v3_int8_single_rtf"] = round(
                _single_rtf(lqctx, tp, laudio, n=2), 2)
            out["large_v3_int8_batch8_throughput_audio_s_per_s"] = round(
                _batch_throughput(lqctx, tp, 8, min(audio_seconds, 60.0),
                                  n_batches=2), 1)
            # int8 weights + int8 cross-KV: the cross-attention KV read
            # (~250 MB/step at B=1) is untouched by weight quantization
            tpx = gwt.TranscribeParams(best_of=1, temperature_inc=0.0,
                                       print_progress=False,
                                       cross_kv_int8=True)
            out["large_v3_int8x_single_rtf"] = round(
                _single_rtf(lqctx, tpx, laudio, n=2), 2)
            del lqctx
            l4ctx = _load_ctx("large-v3", "int4", on_device=True)
            out["large_v3_int4_single_rtf"] = round(
                _single_rtf(l4ctx, tp, laudio, n=2), 2)
            out["large_v3_int4_batch8_throughput_audio_s_per_s"] = round(
                _batch_throughput(l4ctx, tp, 8, min(audio_seconds, 60.0),
                                  n_batches=2), 1)
            # int4 weights + int8 cross-KV: at batch 8 the f16 cross-KV
            # read (~2 GB/step) dominates the step; the int8 cache is
            # the serving config for quantized large-v3 batch decode
            out["large_v3_int4x_batch8_throughput_audio_s_per_s"] = round(
                _batch_throughput(l4ctx, tpx, 8, min(audio_seconds, 60.0),
                                  n_batches=2), 1)
        except Exception as e:  # pragma: no cover
            out["large_v3_error"] = str(e)[:200]

    out["link_mbps_end"] = link_mbps()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
