"""API-surface tests: SpeechToText facade, logging, settings, outputs."""

import numpy as np
import pytest

import godot_whisper_tpu as gwt
from godot_whisper_tpu.cli import outputs
from godot_whisper_tpu.decode.loop import Segment, TokenData
from godot_whisper_tpu.runtime import logging as gwt_logging
from godot_whisper_tpu.runtime.settings import (all_settings, get_setting,
                                                reset_settings, set_setting)
from godot_whisper_tpu.runtime.speech_to_text import SpeechToText


@pytest.fixture(scope="module")
def nano_ctx():
    import jax.numpy as jnp
    from godot_whisper_tpu.audio.mel import mel_filterbank
    from godot_whisper_tpu.audio.tokenizer import Tokenizer, synthetic_vocab
    from godot_whisper_tpu.decode.loop import WhisperPipeline
    from godot_whisper_tpu.models.params import init_params

    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=1, n_text_layer=1, n_audio_state=64, n_audio_head=2,
        n_text_state=64, n_text_head=2, name="pico")
    params = init_params(cfg, seed=0, compute_dtype=jnp.float32)
    tokenizer = Tokenizer(cfg, synthetic_vocab(cfg))
    pipe = WhisperPipeline(cfg, params, tokenizer, mel_filterbank(80),
                           n_loaded=1)
    return gwt.WhisperContext(pipe)


def test_speech_to_text_facade(nano_ctx, rng):
    stt = SpeechToText(mix_rate=44100)
    stt.set_language("en")
    stt.set_language_model(nano_ctx)
    assert stt.get_language_model() is nano_ctx

    stereo = rng.standard_normal((44100, 2)).astype(np.float32) * 0.2
    mono16k = stt.resample(stereo)
    assert abs(len(mono16k) - 16000) <= 2

    assert stt.voice_activity_detection(mono16k) in (True, False)

    result = stt.transcribe(
        np.concatenate([mono16k, mono16k, mono16k]), "", 0)
    assert isinstance(result[0], str)
    for d in result[1:]:
        assert set(d) == {"text", "id", "p", "plog", "pt", "ptsum", "t0",
                          "t1", "tid", "vlen"}


def test_logging_callback():
    events = []
    gwt_logging.log_set(lambda lvl, text: events.append((lvl, text)))
    try:
        gwt_logging.log_info("hello %d", 42)
        gwt_logging.log_error("bad")
    finally:
        gwt_logging.log_set(None)
    assert events[0][0] == gwt_logging.LogLevel.INFO
    assert "hello 42" in events[0][1]
    assert events[1][0] == gwt_logging.LogLevel.ERROR


def test_system_info():
    s = gwt_logging.system_info()
    assert "jax" in s and "platform" in s


def test_settings_roundtrip(monkeypatch):
    reset_settings()
    assert get_setting("audio.input.transcribe.max_tokens") == 16
    set_setting("audio.input.transcribe.max_tokens", 32)
    assert get_setting("audio.input.transcribe.max_tokens") == 32
    monkeypatch.setenv("GWT_AUDIO_INPUT_TRANSCRIBE_MAX_TOKENS", "8")
    assert get_setting("audio.input.transcribe.max_tokens") == 8
    reset_settings()
    assert "audio.input.transcribe.vad_threshold" in all_settings()


def test_output_formats():
    segs = [
        Segment(t0=0, t1=150, text=" Hello world.", tokens=[
            TokenData(id=1, tid=50363, p=0.9, plog=-0.1, pt=0.5,
                      ptsum=0.9, t0=0, t1=150)]),
        Segment(t0=150, t1=420, text=" Second segment.", tokens=[]),
    ]
    txt = outputs.to_txt(segs)
    assert "Hello world." in txt
    srt = outputs.to_srt(segs)
    assert "00:00:01,500 --> 00:00:04,200" in srt
    vtt = outputs.to_vtt(segs)
    assert vtt.startswith("WEBVTT")
    assert "00:00:00.000 --> 00:00:01.500" in vtt
    csv = outputs.to_csv(segs)
    assert csv.splitlines()[0] == "start,end,text"
    assert '1500,4200,"Second segment."' in csv
    lrc = outputs.to_lrc(segs)
    assert "[00:01.50]" in lrc
    import json
    data = json.loads(outputs.to_json(segs, model_name="tiny.en",
                                      language="en", full=True))
    assert data["transcription"][0]["offsets"] == {"from": 0, "to": 1500}
    assert data["transcription"][0]["tokens"][0]["id"] == 1


def test_output_wts_karaoke():
    """Karaoke script writer (output_wts, examples/main/main.cpp:688-812):
    one ffmpeg command, background gray text per segment, lightgreen
    highlight + underline per token enabled over the token's times."""
    segs = [
        Segment(t0=0, t1=150, text=" Hi there", tokens=[
            TokenData(id=1, tid=50363, p=0.9, plog=-0.1, pt=0.5,
                      ptsum=0.9, t0=0, t1=80),
            TokenData(id=2, tid=50363, p=0.8, plog=-0.2, pt=0.5,
                      ptsum=0.9, t0=80, t1=150),
            # special token (>= eot) must be skipped
            TokenData(id=99, tid=50363, p=1.0, plog=0.0, pt=0.0,
                      ptsum=0.0, t0=150, t1=150),
        ]),
    ]
    vocab = {1: " Hi", 2: " y'all\""}
    wts = outputs.to_wts(segs, input_path="in.wav", duration_sec=1.5,
                         token_to_str=lambda i: vocab[i], eot=99,
                         font_path="/tmp/mono.ttf")
    assert wts.startswith("#!/bin/bash\n")
    assert "ffmpeg -i in.wav" in wts
    assert "duration=1.5:rate=25:color=black" in wts
    # background line: full escaped text, over the whole segment
    assert ("fontcolor=gray" in wts and
            "text='>  Hi y’all\\\"':enable='between(t,0,1.5)'" in wts)
    # token 1 highlighted with following token padded out, over [0, 0.8]
    assert ("text='>  Hi|\\ \\ \\ \\ \\ \\ \\ ':enable='between(t,0,0.8)'"
            in wts)
    # underline row sits 16px below
    assert "y=h/2+16" in wts
    # exactly one ffmpeg invocation, output mp4 named after the input
    assert wts.count("ffmpeg -i") == 1
    assert "-y in.wav.mp4" in wts
    # a special token never draws
    assert wts.count("between(t,1.5,1.5)'") == 0


def test_tracer_spans(tmp_path, nano_ctx, rng):
    from godot_whisper_tpu.runtime.trace import tracer
    import json as _json
    import numpy as _np

    tracer.clear()
    tracer.enable()
    try:
        audio = (0.2 * rng.standard_normal(2 * 16000)).astype(_np.float32)
        nano_ctx.full(gwt.TranscribeParams(best_of=1, temperature_inc=0.0),
                      audio)
        path = str(tmp_path / "trace.json")
        tracer.dump(path)
    finally:
        tracer.enabled = False
        tracer.clear()
    data = _json.load(open(path))
    names = {e["name"] for e in data["traceEvents"]}
    # greedy best_of=1 routes through the device-resident clip loop (one
    # span for the whole seek loop); other modes emit per-window spans
    assert "mel" in names
    assert ("decode_clip_device" in names
            or {"encode_window", "decode_window"} <= names)


def test_decode_incremental_matches_oneshot(nano_ctx, rng):
    """whisper_decode-style incremental calls reuse the cached KV:
    decode(a, 0) then decode(b, len(a)) == decode(a+b, 0)."""
    audio = (0.2 * rng.standard_normal(16000)).astype(np.float32)
    nano_ctx.pipeline.set_audio(audio)
    a = [nano_ctx.config.token_sot, 5, 9]
    b = [11, 3]
    one_shot = nano_ctx.decode(a + b, 0)
    nano_ctx.decode(a, 0)
    incremental = nano_ctx.decode(b, len(a))
    np.testing.assert_allclose(incremental, one_shot, atol=2e-4)
    # misaligned continuation is an error, not silent garbage
    with pytest.raises(ValueError):
        nano_ctx.decode([7], 99)
