"""Benchmark driver: tiny.en end-to-end RTF (audio-seconds per second).

Run on the real TPU chip.  Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: BASELINE.json's north-star of 50x realtime tiny.en per chip
(the reference publishes only ~0.3 s for a tiny.en one-shot on an
unspecified desktop, README.md:57 — no portable RTF figure exists, so the
north-star target is the denominator).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _make_audio(seconds: float, sr: int = 16000) -> np.ndarray:
    """Synthetic speech-like audio: AM-modulated harmonics + noise."""
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.5 * t)
    x = np.zeros_like(t)
    for h in (1, 2, 3):
        x += np.sin(2 * np.pi * f0 * h * t) / h
    envelope = 0.5 * (1 + np.sin(2 * np.pi * 2.3 * t))
    x = 0.2 * x * envelope + 0.01 * rng.standard_normal(len(t))
    return x.astype(np.float32)


def main() -> None:
    import godot_whisper_tpu as gwt
    from godot_whisper_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()

    model = os.environ.get("BENCH_MODEL", "tiny.en")
    audio_seconds = float(os.environ.get("BENCH_AUDIO_SECONDS", "120"))
    quantize = os.environ.get("BENCH_QUANTIZE") or None  # e.g. "int8"

    stub = ("/root/reference/thirdparty/whisper.cpp/models/"
            f"for-tests-ggml-{model}.bin")
    if os.path.exists(stub):
        # real vocab + mel filters from the stub; weights random (no
        # network access for real checkpoints)
        from godot_whisper_tpu.models.loader_ggml import read_checkpoint
        from godot_whisper_tpu.models.params import init_params
        from godot_whisper_tpu.audio.tokenizer import Tokenizer
        from godot_whisper_tpu.decode.loop import WhisperPipeline
        raw = read_checkpoint(stub)
        params = init_params(raw.config, seed=0)
        if quantize:  # "int8" / "int4" (BENCH_QUANTIZE)
            params = gwt.WhisperContext._quantize(params, quantize)
        tokenizer = Tokenizer(raw.config, raw.vocab_tokens)
        pipe = WhisperPipeline(raw.config, params, tokenizer,
                               raw.mel_filters, n_loaded=1)
        ctx = gwt.WhisperContext(pipe)
    else:
        ctx = gwt.WhisperContext.synthetic(model, seed=0,
                                           quantize=quantize)

    tp = gwt.TranscribeParams(best_of=1, temperature_inc=0.0,
                              print_progress=False)

    audio = _make_audio(audio_seconds)

    # warmup compiles every executable for this audio length
    ctx.full(tp, audio)

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        ctx.full(tp, audio)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    rtf = audio_seconds / best

    # concurrent-stream throughput (8 utterances batched on the chip)
    from godot_whisper_tpu.parallel.batch import BatchTranscriber
    bt = BatchTranscriber(ctx)
    clips = [_make_audio(audio_seconds) for _ in range(8)]
    bt.transcribe(clips, tp)
    t0 = time.perf_counter()
    bt.transcribe(clips, tp)
    batch_tp = 8 * audio_seconds / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": f"{model} greedy e2e RTF (audio-seconds/s/chip)",
        "value": round(rtf, 2),
        "unit": "audio_s/s",
        "vs_baseline": round(rtf / 50.0, 3),
        "batch8_throughput_audio_s_per_s": round(batch_tp, 1),
    }))


if __name__ == "__main__":
    main()
